"""Floor plane detection (the `/floor_detection/floor_coeffs` producer).

The reference consumes floor coefficients from hdl_graph_slam's floor
detection nodelet (its `msg/FloorCoeffs.msg` + the backend's floor queue,
`global_graph_nodelet.cpp:576-627`). TPU rebuild: batched RANSAC plane fit
over a z-banded slice of the scan — all candidate triples evaluated in one
vectorized pass — with a normal-direction gate, then a least-squares refit on
inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core.cloud import PointCloud


class FloorResult(NamedTuple):
    coeffs: jax.Array    # (4,) [nx, ny, nz, d] with n.p + d = 0, nz > 0
    n_inliers: jax.Array
    found: jax.Array     # bool


def detect_floor(
    cloud: PointCloud,
    sensor_height: float = 1.73,
    height_clip: float = 1.0,
    distance_thresh: float = 0.1,
    normal_thresh_deg: float = 10.0,
    n_hypotheses: int = 256,
    min_inlier_fraction: float = 0.1,
    seed: int = 0,
) -> FloorResult:
    """RANSAC floor fit on points within +-height_clip of the expected floor."""
    xyz = cloud.masked_xyz()
    band = cloud.mask & (jnp.abs(xyz[:, 2] + sensor_height) < height_clip)
    n = xyz.shape[0]

    key = jax.random.PRNGKey(seed)
    # sample triples from band points: sample indices weighted by band via
    # categorical over the mask (approximate: uniform + reject via validity)
    idx = jax.random.randint(key, (n_hypotheses, 3), 0, n)
    tri_ok = band[idx].all(axis=1)
    p = xyz[idx]  # (H,3,3)
    norm_vec = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    nn = jnp.linalg.norm(norm_vec, axis=1)
    norm_unit = norm_vec / jnp.maximum(nn, 1e-9)[:, None]
    # orient +z
    norm_unit = norm_unit * jnp.where(norm_unit[:, 2:3] < 0, -1.0, 1.0)
    cos_thresh = jnp.cos(jnp.deg2rad(normal_thresh_deg))
    hyp_ok = tri_ok & (nn > 1e-6) & (norm_unit[:, 2] > cos_thresh)
    d = -jnp.sum(norm_unit * p[:, 0], axis=1)  # (H,)

    # inlier counts: (H, N) distances, masked to the band
    dist = jnp.abs(xyz @ norm_unit.T + d[None, :])  # (N,H)
    inlier = (dist < distance_thresh) & band[:, None]
    counts = jnp.sum(inlier.astype(jnp.int32), axis=0)
    counts = jnp.where(hyp_ok, counts, -1)
    best = jnp.argmax(counts)

    best_in = inlier[:, best]
    w = best_in.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(xyz * w[:, None], axis=0) / cnt
    centered = (xyz - mu) * w[:, None]
    cov = centered.T @ centered / cnt
    from lv_slam_tpu.ops.linalg3 import eigh3x3

    evals, evecs = eigh3x3(cov[None])
    normal = evecs[0][:, 0]
    normal = normal * jnp.where(normal[2] < 0, -1.0, 1.0)
    d_fit = -jnp.dot(normal, mu)

    band_count = jnp.sum(band.astype(jnp.float32))
    found = (counts[best] > 0) & (
        jnp.sum(w) >= min_inlier_fraction * jnp.maximum(band_count, 1.0)
    ) & (normal[2] > cos_thresh)
    coeffs = jnp.concatenate([normal, d_fit[None]])
    return FloorResult(coeffs=coeffs, n_inliers=counts[best], found=found)
