"""LFA scan-to-scan feature odometry (alaserOdometry equivalent).

Per scan: extract features; register the current sharp/flat features against
the previous scan's less-sharp/less-flat clouds with 2 rounds of
(correspondence search -> 4 GN iterations), warm-started by the previous
relative motion (A-LOAM's constant-velocity assumption). Scans are assumed
motion-compensated (the reference KITTI helper publishes undistorted scans).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import LfaConfig
from lv_slam_tpu.core import se3
from lv_slam_tpu.lfa import registration as reg
from lv_slam_tpu.lfa.features import FeatureClouds
from lv_slam_tpu.ops.knn import build_grid


@functools.partial(jax.jit, static_argnums=(7, 8))
def _odom_step(
    guess,
    sharp, sharp_mask,
    flat, flat_mask,
    prev_edge_grid, prev_surf_grid,
    rounds: int,
    iters: int,
):
    t = guess
    lines = planes = None
    for _ in range(rounds):
        ye = se3.transform_points(t, sharp)
        lines = reg.lines_from_2nn(ye, sharp_mask, prev_edge_grid)
        ys = se3.transform_points(t, flat)
        planes = reg.planes_from_3nn(ys, flat_mask, prev_surf_grid)
        t = reg.gn_solve(t, sharp, lines, flat, planes, iters)
    n_e, n_s = reg.match_counts(lines, planes)
    return t, n_e, n_s


class FeatureOdometry:
    """Host driver holding the previous scan's feature grids."""

    def __init__(self, cfg: Optional[LfaConfig] = None):
        self.cfg = cfg or LfaConfig()
        self._grid_cell = 2.0
        self._prev_edge_grid = None
        self._prev_surf_grid = None
        self._pose = np.eye(4)
        self._last_rel = np.eye(4)
        self._build_grid = jax.jit(functools.partial(build_grid, cell_size=self._grid_cell))

    def reset(self):
        self._prev_edge_grid = None
        self._prev_surf_grid = None
        self._pose = np.eye(4)
        self._last_rel = np.eye(4)

    def process(self, feats: FeatureClouds) -> np.ndarray:
        """Returns the accumulated odometry pose (4,4) after this scan."""
        if self._prev_edge_grid is None:
            self._prev_edge_grid = self._build_grid(feats.less_sharp, feats.less_sharp_mask)
            self._prev_surf_grid = self._build_grid(feats.less_flat, feats.less_flat_mask)
            return self._pose.copy()

        guess = jnp.asarray(self._last_rel, jnp.float32)
        rel, n_e, n_s = _odom_step(
            guess,
            feats.sharp, feats.sharp_mask,
            feats.flat, feats.flat_mask,
            self._prev_edge_grid, self._prev_surf_grid,
            2, 4,
        )
        rel_np = np.asarray(rel, np.float64)
        self._pose = self._pose @ rel_np
        self._last_rel = rel_np
        self._prev_edge_grid = self._build_grid(feats.less_sharp, feats.less_sharp_mask)
        self._prev_surf_grid = self._build_grid(feats.less_flat, feats.less_flat_mask)
        return self._pose.copy()
