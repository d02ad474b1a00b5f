"""Edge information-matrix weighting.

Rebuild of `InformationMatrixCalculator`
(`src/global_graph/information_matrix_calculator.cpp:27-87`,
`include/global_graph/information_matrix_calculator.hpp:40-44`):

- constant mode (the flagship KITTI setting): info = diag(1/sx I3, 1/sq I3).
  Note the reference divides by the *stddev*, not the variance — replicated
  verbatim for parity.
- fitness-adaptive mode: fitness = mean squared NN distance of cloud2
  transformed by relpose into cloud1 (kd-tree there; centroid-grid NN here),
  mapped through the saturating exponential
  `w(x) = min + (max-min) * (1 - e^{-a x}) / (1 - e^{-a x_max})` applied to
  the variances, and info = diag(1/w_x I3, 1/w_q I3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import GraphConfig
from lv_slam_tpu.core.cloud import PointCloud


def _weight(a, max_x, min_y, max_y, x):
    x = min(x, max_x)
    y = (1.0 - np.exp(-a * x)) / (1.0 - np.exp(-a * max_x))
    return min_y + (max_y - min_y) * y


def constant_information(cfg: GraphConfig) -> np.ndarray:
    """Pure host numpy: the flagship runs in constant mode, and producing a
    device array here costs one ~30-500 ms relay fetch PER EDGE when the
    backend converts it (the round-1 full-pipeline throughput wall)."""
    info = np.eye(6, dtype=np.float32)
    info[:3, :3] /= cfg.const_stddev_x
    info[3:, 3:] /= cfg.const_stddev_q
    return info


@functools.lru_cache(maxsize=4)
def _fitness_fn():
    from lv_slam_tpu.ops.nn import fitness_score

    return jax.jit(fitness_score)


def calc_information_matrix(
    cloud1: PointCloud, cloud2: PointCloud, relpose, cfg: GraphConfig
) -> np.ndarray:
    if cfg.use_const_inf_matrix:
        return constant_information(cfg)
    # one jitted device call + one scalar fetch; the weighting runs on host
    fitness = float(_fitness_fn()(cloud1, cloud2, jnp.asarray(relpose, jnp.float32)))
    # thresh default mirrors the loop fitness threshold param (hpp:32)
    max_x = cfg.fitness_score_max_range if np.isfinite(cfg.fitness_score_max_range) else 2.5
    a = cfg.var_gain_a
    w_x = _weight(a, max_x, cfg.min_stddev_x**2, cfg.max_stddev_x**2, fitness)
    w_q = _weight(a, max_x, cfg.min_stddev_q**2, cfg.max_stddev_q**2, fitness)
    info = np.eye(6, dtype=np.float32)
    info[:3, :3] /= w_x
    info[3:, 3:] /= w_q
    return info
