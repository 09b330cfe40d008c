"""CLI smoke test: synthesize a small bag of PointCloud2 frames, run the
full offline pipeline via hdl_graph_slam_tpu.run, check outputs."""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from tests.test_pipeline import make_world, scan_at, drive_square


def _record(header_fields, data=b""):
    header = b"".join(
        struct.pack("<I", len(k) + 1 + len(v)) + k + b"=" + v for k, v in header_fields.items()
    )
    return struct.pack("<I", len(header)) + header + struct.pack("<I", len(data)) + data


def write_bag(path, frames):
    """frames: [(stamp, xyz float32 (N,3))] as /velodyne_points."""
    conn_hdr = {b"op": b"\x07", b"conn": struct.pack("<I", 0), b"topic": b"/velodyne_points"}
    conn_payload = b"".join(
        struct.pack("<I", len(k) + 1 + len(v)) + k + b"=" + v
        for k, v in {b"type": b"sensor_msgs/PointCloud2", b"md5sum": b"x", b"message_definition": b""}.items()
    )
    chunks = [_record(conn_hdr, conn_payload)]
    for stamp, xyz in frames:
        secs = int(stamp)
        nsecs = int(round((stamp - secs) * 1e9))
        frame = b"velodyne"
        n = xyz.shape[0]
        msg = struct.pack("<III", 0, secs, nsecs)
        msg += struct.pack("<I", len(frame)) + frame
        msg += struct.pack("<II", 1, n)
        fields = [(b"x", 0, 7), (b"y", 4, 7), (b"z", 8, 7)]
        msg += struct.pack("<I", len(fields))
        for name, off, dt in fields:
            msg += struct.pack("<I", len(name)) + name + struct.pack("<IBI", off, dt, 1)
        msg += b"\x00"
        msg += struct.pack("<II", 12, 12 * n)
        raw = np.ascontiguousarray(xyz, dtype=np.float32).tobytes()
        msg += struct.pack("<I", len(raw)) + raw
        msg += b"\x01"
        msg_hdr = {b"op": b"\x02", b"conn": struct.pack("<I", 0), b"time": struct.pack("<II", secs, nsecs)}
        chunks.append(_record(msg_hdr, msg))
    chunk_payload = b"".join(chunks)
    chunk_hdr = {b"op": b"\x05", b"compression": b"none", b"size": struct.pack("<I", len(chunk_payload))}
    bag_hdr = {
        b"op": b"\x03",
        b"index_pos": struct.pack("<Q", 0),
        b"conn_count": struct.pack("<I", 1),
        b"chunk_count": struct.pack("<I", 1),
    }
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record(bag_hdr, b" " * 4096))
        f.write(_record(chunk_hdr, chunk_payload))


@pytest.mark.slow
def test_cli_bag_run(tmp_path):
    world = make_world()
    poses = drive_square(side=4.0, step=1.0)[:8]
    frames = [(float(i) * 0.5, scan_at(world, p, seed=i).astype(np.float32)) for i, p in enumerate(poses)]
    bag = str(tmp_path / "synthetic.bag")
    write_bag(bag, frames)

    traj = str(tmp_path / "traj.txt")
    mapf = str(tmp_path / "map.pcd")
    dump = str(tmp_path / "dump")
    gjson = str(tmp_path / "graph.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd(),
               JAX_COMPILATION_CACHE_DIR="/tmp/jax_compilation_cache")
    out = subprocess.run(
        [sys.executable, "-m", "hdl_graph_slam_tpu.run", "--bag", bag, "--preset", "base",
         "--out-traj", traj, "--out-map", mapf, "--dump", dump, "--out-graph-json", gjson,
         "--map-resolution", "0.5", "--cloud-capacity", "4096"],
        capture_output=True, text=True, timeout=600, env=env, cwd=os.getcwd(),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    assert stats["frames"] == 8
    assert stats["keyframes"] >= 2
    assert os.path.exists(traj) and os.path.getsize(traj) > 0
    assert os.path.exists(mapf)
    assert os.path.exists(os.path.join(dump, "graph.g2o"))
    assert os.path.exists(os.path.join(dump, "000000", "cloud.pcd"))
    graph = json.load(open(gjson))
    assert graph["num_edges"] >= 1
