"""Pose-graph storage: struct-of-arrays edge tables + host-side builder.

Replaces g2o's pointer graph (GraphSLAM facade, src/hdl_graph_slam/
graph_slam.cpp) with dense integer-indexed tables: one table per edge type,
each padded to a capacity bucket so the LM solver is a fixed-shape jitted
program. Vertex ids are dense sequential ints per kind (the reference also
uses dense ids — graph_slam.cpp:109 retrieves vertices by running id).

The host-side GraphBuilder mirrors the GraphSLAM add_*_node / add_*_edge API
(graph_slam.hpp:44-116) and freezes to a device GraphData for optimization.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .robust import KERNEL_IDS

# edge-type registry: (vertex kinds, measurement shape, residual dim)
EDGE_SPECS = {
    "se3_se3": (("pose", "pose"), (4, 4), 6),
    "se3_plane": (("pose", "plane"), (4,), 3),
    "se3_prior_xy": (("pose",), (2,), 2),
    "se3_prior_xyz": (("pose",), (3,), 3),
    "se3_prior_vec": (("pose",), (6,), 3),
    "se3_prior_quat": (("pose",), (4,), 3),
    "plane_prior_normal": (("plane",), (3,), 3),
    "plane_prior_distance": (("plane",), (), 1),
    "plane_identity": (("plane", "plane"), (4,), 4),
    "plane_parallel": (("plane", "plane"), (3,), 3),
    "plane_perpendicular": (("plane", "plane"), (3,), 1),
    "se3_point_xyz": (("pose", "point"), (3,), 3),
}

VERTEX_DOF = {"pose": 6, "plane": 3, "point": 3}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgeTable:
    vi: jax.Array  # (E,) int32 first-vertex index (within its kind)
    vj: jax.Array  # (E,) int32 second-vertex index (0 for unary edges)
    meas: jax.Array  # (E, *meas_shape)
    info: jax.Array  # (E, d, d) information matrix
    kernel_id: jax.Array  # (E,) int32 robust-kernel id
    kernel_delta: jax.Array  # (E,) kernel size
    mask: jax.Array  # (E,) bool


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphData:
    poses: jax.Array  # (Np, 4, 4)
    pose_fixed: jax.Array  # (Np,) bool
    pose_mask: jax.Array  # (Np,) bool  (allocated vertices)
    planes: jax.Array  # (Nl, 4)
    plane_fixed: jax.Array
    plane_mask: jax.Array
    points: jax.Array  # (Nm, 3)
    point_fixed: jax.Array
    point_mask: jax.Array
    edges: Dict[str, EdgeTable]  # keyed by EDGE_SPECS name

    @property
    def num_dof(self) -> int:
        return 6 * self.poses.shape[0] + 3 * self.planes.shape[0] + 3 * self.points.shape[0]


def _bucket(n: int, quantum: int = 64) -> int:
    if n == 0:
        return 0
    b = quantum
    while b < n:
        b *= 2
    return b


class GraphBuilder:
    """Host-side accretion of vertices and edges (numpy), frozen on demand.

    API parity with hdl_graph_slam::GraphSLAM (graph_slam.hpp:44-116).
    All ids are (kind, index) pairs returned as plain ints per kind.
    """

    def __init__(self):
        self.poses: List[np.ndarray] = []
        self.pose_fixed: List[bool] = []
        self.planes: List[np.ndarray] = []
        self.plane_fixed: List[bool] = []
        self.points: List[np.ndarray] = []
        self.point_fixed: List[bool] = []
        self.edge_rows: Dict[str, List[dict]] = {k: [] for k in EDGE_SPECS}

    # -- nodes (graph_slam.cpp:107-132) -------------------------------------

    def add_se3_node(self, pose: np.ndarray, fixed: bool = False) -> int:
        self.poses.append(np.asarray(pose, dtype=np.float64).reshape(4, 4))
        self.pose_fixed.append(fixed)
        return len(self.poses) - 1

    def add_plane_node(self, coeffs: np.ndarray, fixed: bool = False) -> int:
        c = np.asarray(coeffs, dtype=np.float64).reshape(4)
        n = np.linalg.norm(c[:3])
        self.planes.append(c / max(n, 1e-12))
        self.plane_fixed.append(fixed)
        return len(self.planes) - 1

    def add_point_xyz_node(self, xyz: np.ndarray, fixed: bool = False) -> int:
        self.points.append(np.asarray(xyz, dtype=np.float64).reshape(3))
        self.point_fixed.append(fixed)
        return len(self.points) - 1

    def set_pose_fixed(self, idx: int, fixed: bool = True):
        self.pose_fixed[idx] = fixed

    def set_plane_fixed(self, idx: int, fixed: bool = True):
        self.plane_fixed[idx] = fixed

    # -- edges (graph_slam.cpp:134-273) -------------------------------------

    def _add_edge(self, etype: str, vi: int, vj: int, meas, info, kernel="NONE", kernel_delta=1.0) -> int:
        kinds, mshape, rdim = EDGE_SPECS[etype]
        info = np.asarray(info, dtype=np.float64)
        if info.ndim == 0:
            info = np.eye(rdim) * float(info)
        self.edge_rows[etype].append(
            dict(
                vi=vi,
                vj=vj,
                meas=np.asarray(meas, dtype=np.float64).reshape(mshape),
                info=info.reshape(rdim, rdim),
                kernel_id=KERNEL_IDS[kernel],
                kernel_delta=float(kernel_delta),
            )
        )
        return len(self.edge_rows[etype]) - 1

    def add_se3_edge(self, vi, vj, relative_pose, info, **kw) -> int:
        return self._add_edge("se3_se3", vi, vj, relative_pose, info, **kw)

    def add_se3_plane_edge(self, pose_id, plane_id, plane_coeffs, info, **kw) -> int:
        return self._add_edge("se3_plane", pose_id, plane_id, plane_coeffs, info, **kw)

    def add_se3_prior_xy_edge(self, pose_id, xy, info, **kw) -> int:
        return self._add_edge("se3_prior_xy", pose_id, 0, xy, info, **kw)

    def add_se3_prior_xyz_edge(self, pose_id, xyz, info, **kw) -> int:
        return self._add_edge("se3_prior_xyz", pose_id, 0, xyz, info, **kw)

    def add_se3_prior_vec_edge(self, pose_id, direction, measurement, info, **kw) -> int:
        d = np.asarray(direction, dtype=np.float64)
        m = np.asarray(measurement, dtype=np.float64)
        # g2o setMeasurement normalizes both halves (edge_se3_priorvec.hpp:56-59)
        meas6 = np.concatenate([d / np.linalg.norm(d), m / np.linalg.norm(m)])
        return self._add_edge("se3_prior_vec", pose_id, 0, meas6, info, **kw)

    def add_se3_prior_quat_edge(self, pose_id, quat_wxyz, info, **kw) -> int:
        q = np.asarray(quat_wxyz, dtype=np.float64).reshape(4)
        if q[0] < 0:
            q = -q  # g2o setMeasurement sign normalization
        return self._add_edge("se3_prior_quat", pose_id, 0, q, info, **kw)

    def add_plane_normal_prior_edge(self, plane_id, normal, info, **kw) -> int:
        return self._add_edge("plane_prior_normal", plane_id, 0, normal, info, **kw)

    def add_plane_distance_prior_edge(self, plane_id, distance, info, **kw) -> int:
        return self._add_edge("plane_prior_distance", plane_id, 0, distance, info, **kw)

    def add_plane_identity_edge(self, p1, p2, meas, info, **kw) -> int:
        return self._add_edge("plane_identity", p1, p2, meas, info, **kw)

    def add_plane_parallel_edge(self, p1, p2, meas, info, **kw) -> int:
        return self._add_edge("plane_parallel", p1, p2, meas, info, **kw)

    def add_plane_perpendicular_edge(self, p1, p2, info, **kw) -> int:
        return self._add_edge("plane_perpendicular", p1, p2, np.zeros(3), info, **kw)

    def add_se3_point_xyz_edge(self, pose_id, point_id, xyz, info, **kw) -> int:
        return self._add_edge("se3_point_xyz", pose_id, point_id, xyz, info, **kw)

    # -- stats ----------------------------------------------------------------

    @property
    def num_vertices(self) -> int:
        return len(self.poses) + len(self.planes) + len(self.points)

    @property
    def num_edges(self) -> int:
        return sum(len(v) for v in self.edge_rows.values())

    # -- freeze / thaw --------------------------------------------------------

    def freeze(self, dtype=jnp.float64) -> GraphData:
        """Pad everything to capacity buckets and move to device arrays."""

        def stack_or_empty(rows, shape):
            if rows:
                return np.stack(rows)
            return np.zeros((0,) + shape)

        npose = _bucket(len(self.poses), 16)
        nplane = _bucket(len(self.planes), 4)
        npoint = _bucket(len(self.points), 4)

        poses = np.tile(np.eye(4), (npose, 1, 1))
        poses[: len(self.poses)] = stack_or_empty(self.poses, (4, 4))[: len(self.poses)]
        planes = np.tile(np.array([0.0, 0.0, 1.0, 0.0]), (nplane, 1))
        if self.planes:
            planes[: len(self.planes)] = np.stack(self.planes)
        points = np.zeros((npoint, 3))
        if self.points:
            points[: len(self.points)] = np.stack(self.points)

        def mask_pad(flags, n):
            m = np.zeros(n, dtype=bool)
            m[: len(flags)] = True
            f = np.zeros(n, dtype=bool)
            f[: len(flags)] = np.asarray(flags, dtype=bool)
            return m, f

        pose_mask, pose_fixed = mask_pad(self.pose_fixed, npose)
        plane_mask, plane_fixed = mask_pad(self.plane_fixed, nplane)
        point_mask, point_fixed = mask_pad(self.point_fixed, npoint)

        edges = {}
        for etype, rows in self.edge_rows.items():
            kinds, mshape, rdim = EDGE_SPECS[etype]
            cap = _bucket(len(rows), 64)
            vi = np.zeros(cap, dtype=np.int32)
            vj = np.zeros(cap, dtype=np.int32)
            meas = np.zeros((cap,) + mshape)
            if etype == "se3_se3":
                meas[:] = np.eye(4)
            info = np.zeros((cap, rdim, rdim))
            kid = np.zeros(cap, dtype=np.int32)
            kdelta = np.ones(cap)
            emask = np.zeros(cap, dtype=bool)
            for i, r in enumerate(rows):
                vi[i] = r["vi"]
                vj[i] = r["vj"]
                meas[i] = r["meas"]
                info[i] = r["info"]
                kid[i] = r["kernel_id"]
                kdelta[i] = r["kernel_delta"]
                emask[i] = True
            edges[etype] = EdgeTable(
                vi=jnp.asarray(vi),
                vj=jnp.asarray(vj),
                meas=jnp.asarray(meas, dtype),
                info=jnp.asarray(info, dtype),
                kernel_id=jnp.asarray(kid),
                kernel_delta=jnp.asarray(kdelta, dtype),
                mask=jnp.asarray(emask),
            )

        return GraphData(
            poses=jnp.asarray(poses, dtype),
            pose_fixed=jnp.asarray(pose_fixed),
            pose_mask=jnp.asarray(pose_mask),
            planes=jnp.asarray(planes, dtype),
            plane_fixed=jnp.asarray(plane_fixed),
            plane_mask=jnp.asarray(plane_mask),
            points=jnp.asarray(points, dtype),
            point_fixed=jnp.asarray(point_fixed),
            point_mask=jnp.asarray(point_mask),
            edges=edges,
        )

    def update_estimates(self, data: GraphData) -> None:
        """Write optimized vertex estimates back into the builder."""
        poses = np.asarray(data.poses)
        for i in range(len(self.poses)):
            self.poses[i] = poses[i]
        planes = np.asarray(data.planes)
        for i in range(len(self.planes)):
            self.planes[i] = planes[i]
        points = np.asarray(data.points)
        for i in range(len(self.points)):
            self.points[i] = points[i]
