"""Edge information-matrix calculation.

Equivalent of InformationMatrixCalculator
(src/hdl_graph_slam/information_matrix_calculator.cpp:25-80): constant
diagonal, or fitness-adaptive via the saturating-exponential weight
    w(x) = min + (max - min) * (1 - e^{-a x}) / (1 - e^{-a x_max})
applied separately to translation and rotation variances. The fitness score
is the mean squared 1-NN distance of cloud2 transformed into cloud1's frame
(here via the MXU brute-force NN instead of a kd-tree).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.cloud import PointCloud
from ..core.config import InformationMatrixConfig
from ..ops import knn


class InformationMatrixCalculator:
    def __init__(self, cfg: Optional[InformationMatrixConfig] = None):
        self.cfg = cfg or InformationMatrixConfig()

    @staticmethod
    def calc_fitness_score(cloud1: PointCloud, cloud2: PointCloud, relpose: np.ndarray, max_range: float = np.inf) -> float:
        import jax.numpy as jnp

        return float(
            knn.fitness_score(
                cloud1.valid_xyz(), cloud2.xyz, cloud2.mask, jnp.asarray(relpose, cloud2.xyz.dtype), max_range=max_range
            )
        )

    def calc_information_matrix(self, cloud1: PointCloud, cloud2: PointCloud, relpose: np.ndarray) -> np.ndarray:
        c = self.cfg
        if c.use_const_inf_matrix:
            inf = np.eye(6)
            inf[:3, :3] /= c.const_stddev_x
            inf[3:, 3:] /= c.const_stddev_q
            return inf
        fitness = self.calc_fitness_score(cloud1, cloud2, relpose)
        return self.information_from_fitness(fitness)

    def information_from_fitness(self, fitness: float) -> np.ndarray:
        """Information matrix from an already-computed fitness score — lets
        the backend reuse the fitness the batched loop matcher produced
        (same formula, same max_range=inf) instead of re-dispatching an
        identical NN program per loop edge."""
        c = self.cfg
        if c.use_const_inf_matrix:
            inf = np.eye(6)
            inf[:3, :3] /= c.const_stddev_x
            inf[3:, 3:] /= c.const_stddev_q
            return inf
        min_var_x = c.min_stddev_x**2
        max_var_x = c.max_stddev_x**2
        min_var_q = c.min_stddev_q**2
        max_var_q = c.max_stddev_q**2
        w_x = self._weight(c.var_gain_a, c.fitness_score_thresh, min_var_x, max_var_x, fitness)
        w_q = self._weight(c.var_gain_a, c.fitness_score_thresh, min_var_q, max_var_q, fitness)
        inf = np.eye(6)
        inf[:3, :3] /= w_x
        inf[3:, 3:] /= w_q
        return inf

    def calc_information_matrices_batched(self, pairs) -> list:
        """Information matrices for a batch of (cloud1, cloud2, relpose)
        keyframe pairs in ONE device program + ONE host sync.

        The keyframe-queue flush computes one adaptive information matrix
        per admitted keyframe (information_matrix_calculator.cpp:25-48 via
        hdl_graph_slam_nodelet.cpp:257-264); dispatching them one at a time
        costs a tunnel round-trip each. All keyframe clouds share the
        pipeline's cloud capacity, so the fitness scores vmap cleanly; if
        capacities differ (hand-assembled clouds) this falls back to the
        per-pair path."""
        if not pairs:
            return []
        c = self.cfg
        if c.use_const_inf_matrix or len(pairs) == 1:
            return [self.calc_information_matrix(c1, c2, rp) for (c1, c2, rp) in pairs]
        caps1 = {c1.capacity for (c1, _, _) in pairs}
        caps2 = {c2.capacity for (_, c2, _) in pairs}
        if len(caps1) != 1 or len(caps2) != 1:
            return [self.calc_information_matrix(c1, c2, rp) for (c1, c2, rp) in pairs]
        import jax
        import jax.numpy as jnp

        tgt = jnp.stack([c1.valid_xyz() for (c1, _, _) in pairs])
        src = jnp.stack([c2.xyz for (_, c2, _) in pairs])
        msk = jnp.stack([c2.mask for (_, c2, _) in pairs])
        rel = jnp.stack([jnp.asarray(rp, src.dtype) for (_, _, rp) in pairs])
        scores = np.asarray(_batched_fitness(tgt, src, msk, rel))
        return [self.information_from_fitness(float(s)) for s in scores]

    @staticmethod
    def _weight(a, max_x, min_y, max_y, x) -> float:
        y = (1.0 - np.exp(-a * x)) / (1.0 - np.exp(-a * max_x))
        return float(min_y + (max_y - min_y) * y)


def _batched_fitness(tgt, src, msk, rel):
    import jax

    return jax.jit(jax.vmap(knn.fitness_score))(tgt, src, msk, rel)
