"""Generalized ICP (plane-to-plane) — the GICP / GICP_OMP factory options.

The reference's `pclomp::GeneralizedIterativeClosestPoint`
(`include/ndt_omp/gicp_omp.h:62-375`) estimates a covariance per point from
its 20 nearest neighbors (OpenMP loop) and regularizes its eigenvalues to the
"plane" shape (eps, 1, 1), then minimizes Mahalanobis point-to-point errors
`d^T (C_b + R C_a R^T)^-1 d` with BFGS. TPU rebuild: per-point covariances
from the k-NN scatter (batched eigh + eigenvalue replacement), Gauss-Newton
with forward-mode Jacobians, correspondences per iteration from the grid
k-NN — everything batched, no pointer chasing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.knn import KnnGrid, build_grid, knn


class GICPResult(NamedTuple):
    transform: jax.Array
    fitness: jax.Array
    n_matches: jax.Array


def _plane_covariances(xyz: jax.Array, mask: jax.Array, grid: KnnGrid, k: int = 8):
    """GICP-regularized covariance per point: eigenvalues -> (eps, 1, 1)."""
    _, pts, valid = knn(grid, xyz, k=k)
    w = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, 1), 1.0)
    mu = jnp.sum(pts * w[..., None], 1) / cnt[:, None]
    c = (pts - mu[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", c, c) / cnt[:, None, None]
    from lv_slam_tpu.ops.linalg3 import eigh3x3

    evals, evecs = eigh3x3(cov + 1e-9 * jnp.eye(3))
    gicp_evals = jnp.array([1e-3, 1.0, 1.0], jnp.float32)  # gicp_epsilon
    reg = jnp.einsum("nij,j,nkj->nik", evecs, gicp_evals, evecs)
    ok = mask & (jnp.sum(w, 1) >= 3)
    return jnp.where(ok[:, None, None], reg, jnp.eye(3)), ok


def gicp_align(
    target: PointCloud,
    source: PointCloud,
    guess: jax.Array,
    *,
    max_correspondence_distance: float = 2.0,
    max_iterations: int = 20,
    grid_cell: float = 1.0,
    k_covariance: int = 8,
) -> GICPResult:
    tgt_xyz, tgt_mask = target.masked_xyz(), target.mask
    src_xyz, src_mask = source.masked_xyz(), source.mask
    tgt_grid = build_grid(tgt_xyz, tgt_mask, grid_cell)
    src_grid = build_grid(src_xyz, src_mask, grid_cell)

    cov_src, src_ok = _plane_covariances(src_xyz, src_mask, src_grid, k_covariance)

    def body(_, transform):
        y = se3.transform_points(transform, src_xyz)
        dists, pts, valid = knn(tgt_grid, y, k=1)
        nn = pts[:, 0]
        ok = src_mask & src_ok & valid[:, 0] & (dists[:, 0] < max_correspondence_distance)

        # target covariance computed fresh from the NN's own neighborhood
        # (avoids threading a permutation through the grid sort)
        _, nn_nbrs, nn_valid = knn(tgt_grid, nn, k=k_covariance)
        wn = nn_valid.astype(jnp.float32)
        cntn = jnp.maximum(jnp.sum(wn, 1), 1.0)
        mun = jnp.sum(nn_nbrs * wn[..., None], 1) / cntn[:, None]
        cn = (nn_nbrs - mun[:, None, :]) * wn[..., None]
        covn = jnp.einsum("nki,nkj->nij", cn, cn) / cntn[:, None, None]
        from lv_slam_tpu.ops.linalg3 import eigh3x3 as _eigh3

        evals, evecs = _eigh3(covn + 1e-9 * jnp.eye(3))
        gicp_evals = jnp.array([1e-3, 1.0, 1.0], jnp.float32)
        cov_b = jnp.einsum("nij,j,nkj->nik", evecs, gicp_evals, evecs)

        rot = transform[:3, :3]
        m = cov_b + jnp.einsum("ij,njk,lk->nil", rot, cov_src, rot)
        m_inv = jnp.linalg.inv(m + 1e-6 * jnp.eye(3))
        w3 = jnp.where(ok[:, None, None], m_inv, 0.0)

        def res(delta):
            t = se3.exp_se3(delta) @ transform
            d = se3.transform_points(t, src_xyz) - nn
            return d

        zero = jnp.zeros(6, jnp.float32)
        d0 = res(zero)
        jac = jax.jacfwd(res)(zero)  # (N,3,6)
        h = jnp.einsum("nia,nij,njb->ab", jac, w3, jac)
        g = jnp.einsum("nia,nij,nj->a", jac, w3, d0)
        ridge = 1e-6 * jnp.trace(h) / 6.0 + 1e-9
        delta = jnp.linalg.solve(h + ridge * jnp.eye(6), -g)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros(6))
        return se3.exp_se3(delta) @ transform

    transform = jax.lax.fori_loop(0, max_iterations, body, guess)

    y = se3.transform_points(transform, src_xyz)
    dists, _, valid = knn(tgt_grid, y, k=1)
    ok = src_mask & valid[:, 0] & (dists[:, 0] < max_correspondence_distance)
    n = jnp.sum(ok.astype(jnp.float32))
    fitness = jnp.sum(jnp.where(ok, dists[:, 0] ** 2, 0.0)) / jnp.maximum(n, 1.0)
    return GICPResult(transform=transform, fitness=fitness, n_matches=n.astype(jnp.int32))
