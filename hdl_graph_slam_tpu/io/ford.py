"""Ford IJRR dataset reader.

Equivalent of src/hdl_graph_slam/ford2bag.py (GPS.log -> NavSatFix stream,
SCANS/Scan*.mat -> point clouds) — but feeding the pipeline directly instead
of writing a rosbag.

Ford .mat layout (ford2bag.py:59-68): struct ``SCAN`` with field
``XYZ`` (3, N) double in the vehicle frame and ``timestamp_laser``
microseconds; GPS.log rows: [utime, ?, ?, lat, lon, alt(?)...] per
ford2bag.py:19-45 (utime microseconds, lat/lon radians in the raw logs,
degrees in the csv export — auto-detected by magnitude).
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np


def read_scan_mat(path: str) -> Tuple[float, np.ndarray]:
    """-> (stamp_sec, xyz (N,3) float32)."""
    from scipy import io as sio

    mat = sio.loadmat(path, squeeze_me=True, struct_as_record=False)
    scan = mat["SCAN"]
    xyz = np.atleast_2d(np.asarray(scan.XYZ, dtype=np.float32))
    if xyz.shape[0] == 3 and xyz.shape[1] != 3:
        xyz = xyz.T
    stamp = float(np.asarray(scan.timestamp_laser).reshape(-1)[0]) * 1e-6
    return stamp, xyz


def read_gps_log(path: str) -> Iterator[Tuple[float, float, float, float]]:
    """GPS.log -> (stamp_sec, lat_deg, lon_deg, alt)."""
    data = np.loadtxt(path)
    for row in np.atleast_2d(data):
        stamp = row[0] * 1e-6
        lat, lon = row[3], row[4]
        if abs(lat) <= np.pi and abs(lon) <= np.pi:  # radians in raw logs
            lat, lon = np.degrees(lat), np.degrees(lon)
        alt = row[5] if row.shape[0] > 5 else float("nan")
        yield stamp, float(lat), float(lon), float(alt)


class FordDataset:
    """IJRR dataset-2 directory: SCANS/Scan####.mat + GPS.log."""

    def __init__(self, root: str):
        self.root = root
        scans_dir = os.path.join(root, "SCANS")
        self.scan_files = (
            sorted(os.path.join(scans_dir, f) for f in os.listdir(scans_dir) if f.endswith(".mat"))
            if os.path.isdir(scans_dir)
            else []
        )
        self.gps_log = os.path.join(root, "GPS.log")

    def frames(self) -> Iterator[Tuple[float, np.ndarray, None]]:
        for path in self.scan_files:
            stamp, xyz = read_scan_mat(path)
            yield stamp, xyz, None

    def gps(self) -> Iterator[Tuple[float, float, float, float]]:
        if os.path.exists(self.gps_log):
            yield from read_gps_log(self.gps_log)
