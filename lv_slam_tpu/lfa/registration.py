"""Feature registration: point-to-line / point-to-plane Gauss-Newton.

The LM solvers behind A-LOAM's `alaserOdometry` (scan-to-scan, 2-point lines
and 3-point planes from the previous scan's features) and `alaserMapping`
(scan-to-map, line/plane fits to the 5 nearest map features), rebuilt as
batched GN: correspondences come from `ops/knn` grid queries, residual
Jacobians are closed-form in the left se(3) perturbation (see `gn_solve`),
and the 6x6 normal equations come from masked reductions — one jitted
program per (rounds, iters) configuration.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core import se3
from lv_slam_tpu.ops.knn import CellTable, KnnGrid, candidates_cell, knn

_DIST_SQ_THRESH = 25.0  # correspondence gate, matches A-LOAM's 25 m^2


class LineField(NamedTuple):
    """Per-source-feature line correspondence (point mu, direction v)."""

    mu: jax.Array     # (N,3)
    v: jax.Array      # (N,3) unit
    valid: jax.Array  # (N,)


class PlaneField(NamedTuple):
    """Per-source-feature plane correspondence (unit normal n, offset d)."""

    n: jax.Array      # (N,3)
    d: jax.Array      # (N,)
    valid: jax.Array  # (N,)


def lines_from_2nn(y: jax.Array, mask: jax.Array, grid: KnnGrid) -> LineField:
    """Odometry-style: the 2 nearest target edge points span the line."""
    dists, pts, valid = knn(grid, y, k=2)
    a, b = pts[:, 0], pts[:, 1]
    ab = b - a
    norm = jnp.linalg.norm(ab, axis=1)
    ok = (
        mask
        & valid[:, 0]
        & valid[:, 1]
        & (dists[:, 0] ** 2 < _DIST_SQ_THRESH)
        & (norm > 1e-3)
    )
    v = ab / jnp.maximum(norm, 1e-9)[:, None]
    return LineField(mu=a, v=v, valid=ok)


def lines_from_fit(y: jax.Array, mask: jax.Array, grid, k: int = 5) -> LineField:
    """Mapping-style: eigen-fit a line to the map edge points within 1 m of
    the query; accept when >= k neighbors participate and the scatter is
    strongly linear (lambda_max >= 3 * lambda_mid, A-LOAM's laserMapping
    criterion). A-LOAM fits exactly the 5 nearest and requires all of them
    within 1 m; the radius-gated fit keeps the same gate ("at least k map
    points within 1 m") but uses EVERY in-radius candidate — no top-k
    selection network, no per-slot gather, and the eigen criterion is at
    least as robust with more samples. `grid` may be a sorted KnnGrid or the
    bucket-table CellTable (the device-resident mapping path)."""
    if isinstance(grid, CellTable):
        pts, cand_ok = candidates_cell(grid, y)
        d2 = jnp.sum((y[:, None, :] - pts) ** 2, axis=-1)
        use = cand_ok & (d2 < 1.0)
    else:
        dists, pts, valid = knn(grid, y, k=k)
        use = valid & (dists < 1.0)
    w = use.astype(jnp.float32)
    n_use = jnp.sum(w, axis=1)
    cnt = jnp.maximum(n_use, 1.0)
    pts = jnp.where(use[..., None], pts, 0.0)
    mu = jnp.sum(pts, axis=1) / cnt[:, None]
    centered = (pts - mu[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / cnt[:, None, None]
    from lv_slam_tpu.ops.linalg3 import eigh3x3

    evals, evecs = eigh3x3(cov)
    v = evecs[:, :, 2]
    ok = (
        mask
        & (n_use >= k)
        & (evals[:, 2] > 3.0 * jnp.maximum(evals[:, 1], 1e-12))
    )
    return LineField(mu=mu, v=v, valid=ok)


def planes_from_3nn(y: jax.Array, mask: jax.Array, grid: KnnGrid) -> PlaneField:
    """Odometry-style: plane through the 3 nearest target surf points."""
    dists, pts, valid = knn(grid, y, k=3)
    a, b, c = pts[:, 0], pts[:, 1], pts[:, 2]
    n = jnp.cross(b - a, c - a)
    norm = jnp.linalg.norm(n, axis=1)
    ok = (
        mask
        & jnp.all(valid, axis=1)
        & (dists[:, 0] ** 2 < _DIST_SQ_THRESH)
        & (norm > 1e-3)
    )
    n_hat = n / jnp.maximum(norm, 1e-9)[:, None]
    d = -jnp.sum(n_hat * a, axis=1)
    return PlaneField(n=n_hat, d=d, valid=ok)


def planes_from_fit(y: jax.Array, mask: jax.Array, grid, k: int = 5) -> PlaneField:
    """Mapping-style: least-squares plane through the map surf points within
    1 m of the query (A-LOAM fits the exact 5 nearest and solves A n = -1);
    accept when >= k neighbors participate and every participant lies within
    0.2 m of the fit. Radius-gated like `lines_from_fit` (same gate, all
    in-radius candidates, no top-k).

    A-LOAM's A n = -1 on raw coordinates is hopelessly ill-conditioned in
    float32 at ~100 m ranges (cond ~ |p|^2 / spread^2). The PCA fit on
    centered coordinates — normal = smallest-eigenvalue direction of the
    neighborhood scatter — is the well-conditioned equivalent (identical
    plane for clean data)."""
    if isinstance(grid, CellTable):
        pts, cand_ok = candidates_cell(grid, y)
        d2 = jnp.sum((y[:, None, :] - pts) ** 2, axis=-1)
        use = cand_ok & (d2 < 1.0)
    else:
        dists, pts, valid = knn(grid, y, k=k)
        use = valid & (dists < 1.0)
    w = use.astype(jnp.float32)
    n_use = jnp.sum(w, axis=1)
    cnt = jnp.maximum(n_use, 1.0)
    pts = jnp.where(use[..., None], pts, 0.0)
    mu = jnp.sum(pts, axis=1) / cnt[:, None]
    c = (pts - mu[:, None, :]) * w[..., None]
    cov = jnp.einsum("nki,nkj->nij", c, c) / cnt[:, None, None]
    from lv_slam_tpu.ops.linalg3 import eigh3x3

    _, evecs = eigh3x3(cov + 1e-9 * jnp.eye(3))
    n_hat = evecs[:, :, 0]
    d = -jnp.sum(n_hat * mu, axis=1)
    resid = jnp.abs(jnp.einsum("nki,ni->nk", pts, n_hat) + d[:, None])
    finite = jnp.all(jnp.isfinite(n_hat), axis=1) & jnp.isfinite(d)
    flat_enough = jnp.all(jnp.where(use, resid, 0.0) < 0.2, axis=1)
    ok = mask & (n_use >= k) & flat_enough & finite
    n_hat = jnp.where(ok[:, None] & jnp.isfinite(n_hat), n_hat, 0.0)
    d = jnp.where(ok & jnp.isfinite(d), d, 0.0)
    return PlaneField(n=n_hat, d=d, valid=ok)


# ---------------------------------------------------------------------------
# Gauss-Newton on frozen correspondences
# ---------------------------------------------------------------------------


def gn_solve(
    transform: jax.Array,
    edges: jax.Array,
    lines: LineField,
    surfs: jax.Array,
    planes: PlaneField,
    iters: int,
) -> jax.Array:
    """GN iterations on frozen correspondences; returns the updated (4,4).

    Jacobians are closed-form w.r.t. the left perturbation `exp(d) T` with
    tangent [rho, phi] (exp(d) y ~ y + rho + phi x y at d = 0):
    - point-to-plane r = n.y + d  ->  J = [n, y x n]
    - point-to-line  r = |(y - mu) x v|  ->  dr/dy = v x (c / r) with
      c = (y - mu) x v, so J = [g, y x g].
    Identical matrices to forward-mode autodiff of the residual (which this
    replaced), at ~1/7 the arithmetic — the residual re-evaluates once per
    iteration instead of once per tangent basis vector.
    """
    # Zero invalid lanes BEFORE the nonlinear ops: padded sentinel points
    # (~1e6) overflow float32 in the squared terms, and inf/nan would poison
    # the whole J^T J reduction even at weight 0.
    e_pts = jnp.where(lines.valid[:, None], edges, 0.0)
    mu = jnp.where(lines.valid[:, None], lines.mu, 0.0)
    w_e = lines.valid.astype(jnp.float32)
    s_pts = jnp.where(planes.valid[:, None], surfs, 0.0)
    d = jnp.where(planes.valid, jnp.clip(planes.d, -1e4, 1e4), 0.0)
    w_s = planes.valid.astype(jnp.float32)

    def body(_, t):
        ye = se3.transform_points(t, e_pts)
        diff = ye - mu
        c = jnp.cross(diff, lines.v)
        r_e = jnp.sqrt(jnp.sum(c * c, axis=1) + 1e-12)
        g_e = jnp.cross(lines.v, c / r_e[:, None])
        j_e = jnp.concatenate([g_e, jnp.cross(ye, g_e)], axis=1)  # (Ne,6)

        ys = se3.transform_points(t, s_pts)
        r_s = jnp.sum(ys * planes.n, axis=1) + d
        j_s = jnp.concatenate([planes.n, jnp.cross(ys, planes.n)], axis=1)

        r = jnp.concatenate([r_e, r_s])
        jac = jnp.concatenate([j_e, j_s], axis=0)
        w = jnp.concatenate([w_e, w_s])
        # Huber-style clamp on outlier residuals (A-LOAM uses Huber(0.1))
        huber = jnp.where(jnp.abs(r) > 0.1, 0.1 / jnp.maximum(jnp.abs(r), 1e-9), 1.0)
        w = w * huber
        h = jnp.einsum("na,n,nb->ab", jac, w, jac)
        g = jnp.einsum("na,n->a", jac, w * r)
        ridge = 1e-4 * jnp.trace(h) / 6.0 + 1e-9
        delta = jnp.linalg.solve(h + ridge * jnp.eye(6), -g)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        return se3.exp_se3(delta) @ t

    return jax.lax.fori_loop(0, iters, body, transform)


def match_counts(lines: LineField, planes: PlaneField) -> Tuple[jax.Array, jax.Array]:
    return jnp.sum(lines.valid.astype(jnp.int32)), jnp.sum(planes.valid.astype(jnp.int32))
