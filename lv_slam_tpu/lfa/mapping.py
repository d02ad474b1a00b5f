"""LFA scan-to-map feature refinement (alaserMapping equivalent).

Maintains world-frame edge/surf feature maps as fixed-capacity point buffers
(the A-LOAM 21x21x11 cube array of voxel-downsampled clouds becomes one
padded buffer per feature type, re-voxelized at `mapping_line_resolution` /
`mapping_plane_resolution` and cropped to a radius around the pose after
each insertion). Each scan: register this scan's less-sharp/less-flat
features against the map with 2 rounds of (5-NN line/plane fits -> GN),
seeded by the scan-to-scan odometry increment, then merge the scan into the
map.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import LfaConfig
from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import SENTINEL, PointCloud
from lv_slam_tpu.lfa import registration as reg
from lv_slam_tpu.lfa.features import FeatureClouds
from lv_slam_tpu.ops.prefilter import voxel_dedup_first


@functools.partial(jax.jit, static_argnums=(7, 8))
def _map_step(
    guess,
    edges, edges_mask,
    surfs, surfs_mask,
    edge_grid, surf_grid,
    rounds: int,
    iters: int,
):
    t = guess
    lines = planes = None
    for _ in range(rounds):
        ye = se3.transform_points(t, edges)
        lines = reg.lines_from_fit(ye, edges_mask, edge_grid)
        ys = se3.transform_points(t, surfs)
        planes = reg.planes_from_fit(ys, surfs_mask, surf_grid)
        t = reg.gn_solve(t, edges, lines, surfs, planes, iters)
    n_e, n_s = reg.match_counts(lines, planes)
    return t, n_e, n_s


@functools.partial(jax.jit, static_argnums=(4,))
def _merge_map(map_xyz, map_mask, new_xyz, new_mask, resolution: float):
    """Concatenate + voxel-dedup back into the fixed-capacity buffer
    (dedup-first, matching the device-resident `lfa/fused.py` merge)."""
    cap = map_xyz.shape[0]
    xyz = jnp.concatenate([map_xyz, new_xyz], axis=0)
    mask = jnp.concatenate([map_mask, new_mask], axis=0)
    cloud = PointCloud(jnp.where(mask[:, None], xyz, SENTINEL), jnp.zeros(xyz.shape[0]), mask)
    out = voxel_dedup_first(cloud, resolution, cap)
    return out.xyz, out.mask


@functools.partial(jax.jit, static_argnums=(3,))
def _crop_map(map_xyz, map_mask, center, radius: float):
    keep = map_mask & (jnp.linalg.norm(map_xyz - center, axis=1) < radius)
    return jnp.where(keep[:, None], map_xyz, SENTINEL), keep


class FeatureMapping:
    """Host driver holding the persistent feature maps."""

    def __init__(self, cfg: Optional[LfaConfig] = None, crop_radius: Optional[float] = None):
        self.cfg = cfg or LfaConfig()
        self.crop_radius = crop_radius if crop_radius is not None else self.cfg.crop_radius
        c = self.cfg
        self._edge_map = jnp.full((c.map_edge_cap, 3), SENTINEL, jnp.float32)
        self._edge_mask = jnp.zeros((c.map_edge_cap,), bool)
        self._surf_map = jnp.full((c.map_planar_cap, 3), SENTINEL, jnp.float32)
        self._surf_mask = jnp.zeros((c.map_planar_cap,), bool)
        self._pose = np.eye(4)
        self._last_odom = np.eye(4)
        self._initialized = False
        # bucket-table k-NN (cell 2.0 covers the 1.0 m fit gates), same
        # structure/sizing as the device-resident lfa/fused.py path
        from lv_slam_tpu.lfa.fused import _n_buckets
        from lv_slam_tpu.utils.jit_cache import build_cell_table_fn, transform_points_fn

        # shared jitted programs (never per-instance: each instance would
        # re-query the remote compile cache, seconds per shape — CLAUDE.md)
        self._build_edge_table = build_cell_table_fn(
            2.0, _n_buckets(c, c.map_edge_cap), c.knn_slots
        )
        self._build_surf_table = build_cell_table_fn(
            2.0, _n_buckets(c, c.map_planar_cap), c.knn_slots
        )
        self._transform = transform_points_fn()
        self._count = 0

    @property
    def pose(self) -> np.ndarray:
        return self._pose.copy()

    def process(self, feats: FeatureClouds, odom: np.ndarray) -> np.ndarray:
        """feats: this scan's features (sensor frame); odom: the scan-to-scan
        odometry pose. Returns the refined world pose (the reference's
        /aft_mapped_to_init equivalent)."""
        cfg = self.cfg
        # seed: previous refined pose composed with the odometry increment
        # (A-LOAM's transformAssociateToMap)
        rel = np.linalg.inv(self._last_odom) @ odom
        guess = self._pose @ rel
        self._last_odom = odom.copy()

        if self._initialized and self._count % max(cfg.mapping_skip_frame, 1) == 0:
            edge_grid = self._build_edge_table(self._edge_map, self._edge_mask)
            surf_grid = self._build_surf_table(self._surf_map, self._surf_mask)
            refined, n_e, n_s = _map_step(
                jnp.asarray(guess, jnp.float32),
                feats.less_sharp, feats.less_sharp_mask,
                feats.less_flat, feats.less_flat_mask,
                edge_grid, surf_grid,
                self.cfg.mapping_corr_rounds, self.cfg.mapping_max_iterations,
            )
            self._pose = np.asarray(refined, np.float64)
        else:
            self._pose = guess

        # merge this scan's features into the world maps
        t = jnp.asarray(self._pose, jnp.float32)
        edge_w = self._transform(t, feats.less_sharp)
        surf_w = self._transform(t, feats.less_flat)
        self._edge_map, self._edge_mask = _merge_map(
            self._edge_map, self._edge_mask, edge_w, feats.less_sharp_mask,
            cfg.mapping_line_resolution,
        )
        self._surf_map, self._surf_mask = _merge_map(
            self._surf_map, self._surf_mask, surf_w, feats.less_flat_mask,
            cfg.mapping_plane_resolution,
        )
        center = jnp.asarray(self._pose[:3, 3], jnp.float32)
        self._edge_map, self._edge_mask = _crop_map(
            self._edge_map, self._edge_mask, center, self.crop_radius
        )
        self._surf_map, self._surf_mask = _crop_map(
            self._surf_map, self._surf_mask, center, self.crop_radius
        )
        self._initialized = True
        self._count += 1
        return self._pose.copy()
