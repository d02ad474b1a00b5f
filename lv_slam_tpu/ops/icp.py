"""Point-to-point ICP (the registrations factory's ICP option).

The reference exposes `pcl::IterativeClosestPoint` through
`select_registration_method` (`src/global_graph/registrations.cpp:15-30`).
TPU rebuild: correspondences from the fine centroid grid (one gather set per
iteration, `ops/nn`), rejection by max correspondence distance, and a
closed-form weighted Kabsch/Umeyama update per iteration — `lax.fori_loop`
over a fixed iteration budget.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.nn import build_centroid_grid, nn_points


class ICPResult(NamedTuple):
    transform: jax.Array
    fitness: jax.Array     # mean squared correspondence distance
    n_matches: jax.Array


def icp_align(
    target: PointCloud,
    source: PointCloud,
    guess: jax.Array,
    *,
    max_correspondence_distance: float = 2.0,
    max_iterations: int = 30,
    grid_cell: float = 0.25,
) -> ICPResult:
    grid = build_centroid_grid(target, grid_cell)
    src = source.masked_xyz()
    src_mask = source.mask
    max_d2 = max_correspondence_distance**2

    def body(_, transform):
        y = se3.transform_points(transform, src)
        d2, nn, valid = nn_points(grid, y, src_mask)
        w = (valid & (d2 < max_d2)).astype(jnp.float32)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mu_y = jnp.sum(y * w[:, None], 0) / wsum
        mu_n = jnp.sum(nn * w[:, None], 0) / wsum
        yc = (y - mu_y) * w[:, None]
        nc = nn - mu_n
        cov = yc.T @ nc  # (3,3)
        u, s, vt = jnp.linalg.svd(cov)
        d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
        corr = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
        rot = vt.T @ corr @ u.T
        t = mu_n - rot @ mu_y
        update = se3.make_transform(rot, t)
        return update @ transform

    transform = jax.lax.fori_loop(0, max_iterations, body, guess)

    y = se3.transform_points(transform, src)
    d2, _, valid = nn_points(grid, y, src_mask)
    ok = valid & (d2 < max_d2)
    n = jnp.sum(ok.astype(jnp.float32))
    fitness = jnp.sum(jnp.where(ok, d2, 0.0)) / jnp.maximum(n, 1.0)
    return ICPResult(transform=transform, fitness=fitness, n_matches=n.astype(jnp.int32))
