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

    @staticmethod
    def _weight(a, max_x, min_y, max_y, x) -> float:
        y = (1.0 - np.exp(-a * x)) / (1.0 - np.exp(-a * max_x))
        return float(min_y + (max_y - min_y) * y)
