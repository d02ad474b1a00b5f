"""TPU-optimized NDT hot path: packed leaf table + lane-major arithmetic.

Two measured TPU facts drive this variant of the `ops/ndt.py` pass:
1. a 65k-index gather costs ~0.5 ms **regardless of row width or table
   size** — so the ~11 separate leaf-attribute gathers of the generic path
   collapse into ONE 16-wide gather from a packed (L, 16) table
   [mu(3), upper-triangular icov(6), weight(1), pad] plus the LUT gather;
2. point arrays are kept (3, N)/(N,) so N fills the 128-wide lanes.

Same math as `ndt_derivatives` (float32 rounding aside); validated against it
in tests. Used by the fused odometry step and anywhere throughput matters.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core import se3
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.ndt import GaussParams, NDTResult, make_gauss_params
from lv_slam_tpu.ops.voxel_map import VoxelMap, neighborhood_offsets


class VoxelMapSOA(NamedTuple):
    packed: jax.Array       # (L, 16): mu0..2, c00,c01,c02,c11,c12,c22, w, pad
    lut: jax.Array          # (E^3,)
    origin_cell: jax.Array  # (3,)
    resolution: jax.Array   # ()
    extent: int


def to_soa(vmap_: VoxelMap) -> VoxelMapSOA:
    e = round(vmap_.lut.shape[0] ** (1.0 / 3.0))
    while e * e * e < vmap_.lut.shape[0]:
        e += 1
    c = vmap_.icovs
    packed = jnp.concatenate(
        [
            vmap_.means,                                  # 0:3
            c[:, 0, 0:1], c[:, 0, 1:2], c[:, 0, 2:3],     # 3,4,5
            c[:, 1, 1:2], c[:, 1, 2:3], c[:, 2, 2:3],     # 6,7,8
            vmap_.weights[:, None],                       # 9
            jnp.zeros((vmap_.means.shape[0], 6), jnp.float32),
        ],
        axis=1,
    )
    return VoxelMapSOA(
        packed=packed,
        lut=vmap_.lut,
        origin_cell=vmap_.origin_cell,
        resolution=vmap_.resolution,
        extent=e,
    )


def accumulate_ndt_terms(
    y: jax.Array,      # (3,N) transformed points
    row: jax.Array,    # (N,16) packed leaf attributes (columns per to_soa)
    hit: jax.Array,    # (N,) leaf-hit mask
    gauss: GaussParams,
    weighted: bool,
    col0: int = 0,     # column of mu0 within the row (hash rows embed a key)
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One neighborhood offset's (score, grad, hess) contribution — shared by
    the LUT (SoA) and hash-table derivative passes."""
    mu = row[:, col0 : col0 + 3].T                            # (3,N)
    c00, c01, c02 = row[:, col0 + 3], row[:, col0 + 4], row[:, col0 + 5]
    c11, c12, c22 = row[:, col0 + 6], row[:, col0 + 7], row[:, col0 + 8]
    w_leaf = row[:, col0 + 9]

    d0, d1, d2_ = y[0] - mu[0], y[1] - mu[1], y[2] - mu[2]
    q0 = c00 * d0 + c01 * d1 + c02 * d2_
    q1 = c01 * d0 + c11 * d1 + c12 * d2_
    q2 = c02 * d0 + c12 * d1 + c22 * d2_
    md = d0 * q0 + d1 * q1 + d2_ * q2
    eterm = jnp.exp(-0.5 * gauss.d2 * md)
    gate_val = gauss.d2 * eterm
    gate = hit & (gate_val <= 1.0) & (gate_val >= 0.0) & jnp.isfinite(gate_val)
    w = jnp.where(gate, w_leaf if weighted else 1.0, 0.0)

    score = jnp.sum(w * (-gauss.d1 * eterm))
    f = w * (gauss.d1 * gauss.d2 * eterm)                     # (N,)

    # g6 = [q ; y x q]
    g3 = y[1] * q2 - y[2] * q1
    g4 = y[2] * q0 - y[0] * q2
    g5 = y[0] * q1 - y[1] * q0
    g6 = jnp.stack([q0, q1, q2, g3, g4, g5])                  # (6,N)

    grad = jnp.einsum("n,in->i", f, g6)

    # Hessian: f * (-d2 g6 g6^T + T2 + J^T C J)
    h1 = jnp.einsum("n,in,jn->ij", -gauss.d2 * f, g6, g6)
    qy = q0 * y[0] + q1 * y[1] + q2 * y[2]
    q_st = jnp.stack([q0, q1, q2])
    t2 = jnp.einsum("n,in,jn->ij", f, y, q_st) - jnp.sum(f * qy) * jnp.eye(3)
    h2 = jnp.zeros((6, 6)).at[3:, 3:].set(t2)

    # J^T C J = [[C, -CS],[SC, -SCS]], S = skew(y)
    c = jnp.stack([
        jnp.stack([c00, c01, c02]),
        jnp.stack([c01, c11, c12]),
        jnp.stack([c02, c12, c22]),
    ])  # (3,3,N)
    cs = jnp.stack([
        jnp.stack([c[i, 1] * y[2] - c[i, 2] * y[1] for i in range(3)]),
        jnp.stack([c[i, 2] * y[0] - c[i, 0] * y[2] for i in range(3)]),
        jnp.stack([c[i, 0] * y[1] - c[i, 1] * y[0] for i in range(3)]),
    ], axis=1)   # cs[i,j] = (C S)_{ij}
    # with S antisymmetric and C symmetric: SC = -(CS)^T, so only CS and
    # S C S need computing; scs[i,j] = sum_k (SC)_{ik} S_{kj} = -(CS)^T S
    sc = -jnp.swapaxes(cs, 0, 1)
    scs = jnp.stack([
        jnp.stack([sc[i, 1] * y[2] - sc[i, 2] * y[1] for i in range(3)]),
        jnp.stack([sc[i, 2] * y[0] - sc[i, 0] * y[2] for i in range(3)]),
        jnp.stack([sc[i, 0] * y[1] - sc[i, 1] * y[0] for i in range(3)]),
    ], axis=1)

    c_sum = jnp.einsum("n,ijn->ij", f, c)
    cs_sum = jnp.einsum("n,ijn->ij", f, cs)
    scs_sum = jnp.einsum("n,ijn->ij", f, scs)
    h3 = jnp.zeros((6, 6))
    h3 = h3.at[:3, :3].set(c_sum)
    h3 = h3.at[:3, 3:].set(-cs_sum)
    h3 = h3.at[3:, :3].set(-cs_sum.T)
    h3 = h3.at[3:, 3:].set(-scs_sum)

    return score, grad, h1 + h2 + h3


def ndt_derivatives_soa(
    soa: VoxelMapSOA,
    xs: jax.Array,          # (3, N) source points (SoA)
    mask: jax.Array,        # (N,)
    transform: jax.Array,   # (4,4)
    gauss: GaussParams,
    offsets: jax.Array,     # (K,3)
    weighted: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused score/gradient/Hessian; 2 gathers per neighborhood offset."""
    e = soa.extent
    rot = transform[:3, :3]
    t = transform[:3, 3]
    y = jnp.einsum("ij,jn->in", rot, xs) + t[:, None]         # (3,N)
    coords = jnp.floor(y / soa.resolution).astype(jnp.int32)  # (3,N)

    score = jnp.float32(0.0)
    grad = jnp.zeros((6,), jnp.float32)
    hess = jnp.zeros((6, 6), jnp.float32)

    for ki in range(offsets.shape[0]):  # static unroll over DIRECT-K offsets
        rel = coords - soa.origin_cell[:, None] + offsets[ki][:, None]
        in_extent = jnp.all((rel >= 0) & (rel < e), axis=0)
        flat = (rel[0] * e + rel[1]) * e + rel[2]
        leaf = soa.lut[jnp.where(in_extent, flat, 0)]         # gather 1
        hit = in_extent & (leaf >= 0) & mask
        row = soa.packed[jnp.where(hit, leaf, 0)]             # gather 2 (N,16)
        s, g, h = accumulate_ndt_terms(y, row, hit, gauss, weighted)
        score, grad, hess = score + s, grad + g, hess + h

    return score, grad, hess


def _newton_loop(derivs, guess, eps, step_max, max_iterations):
    """Monotone-guarded damped-Newton ascent on the NDT score.

    The carry's iteration counter and convergence flag are derived from the
    initial score rather than fresh literals so the loop stays legal when the
    inputs vary over a shard_map mesh axis (the varying-axes rule would
    otherwise reject mixing an unvarying carry with varying loop state)."""
    step_min = eps / 2.0
    score0, grad0, hess0 = derivs(guess)

    def cond(state):
        return ~state[-1]

    def body(state):
        transform, score, grad, hess, cap, it, _ = state
        ridge = 1e-6 * jnp.trace(jnp.abs(hess)) / 6.0 + 1e-12
        delta = jnp.linalg.solve(hess + ridge * jnp.eye(6, dtype=hess.dtype), -grad)
        norm = jnp.linalg.norm(delta)
        bad = (norm == 0.0) | ~jnp.isfinite(norm)
        direction = delta / jnp.where(bad, 1.0, norm)
        dphi0 = -jnp.dot(grad, direction)
        direction = jnp.where(dphi0 > 0, -direction, direction)
        alpha = jnp.clip(norm, step_min, cap)
        new_transform = se3.exp_se3(alpha * direction) @ transform
        new_score, new_grad, new_hess = derivs(new_transform)
        accept = ~bad & (new_score >= score)
        transform = jnp.where(accept, new_transform, transform)
        score = jnp.where(accept, new_score, score)
        grad = jnp.where(accept, new_grad, grad)
        hess = jnp.where(accept, new_hess, hess)
        cap = jnp.where(accept, step_max, jnp.maximum(cap * 0.5, step_min))
        it = it + 1
        shrunk_out = ~accept & (alpha <= step_min)
        converged = bad | (it > max_iterations) | (accept & (alpha < eps)) | shrunk_out
        return transform, score, grad, hess, cap, it, converged

    it0 = (score0 * 0.0).astype(jnp.int32)
    conv0 = jnp.isnan(score0)
    init = (guess, score0, grad0, hess0, step_max + score0 * 0.0, it0, conv0)
    return jax.lax.while_loop(cond, body, init)


def ndt_align_soa(
    vmap_: VoxelMap,
    source: PointCloud,
    guess: jax.Array,
    *,
    resolution: float,
    outlier_ratio: float = 0.55,
    step_size: float = 0.1,
    transformation_epsilon: float = 0.01,
    max_iterations: int = 35,
    neighborhood: str = "DIRECT1",
    weighted: bool = False,
    coarse_subsample: int = 1,
) -> NDTResult:
    """Drop-in `ndt_align` with the packed-gather derivative pass.

    `coarse_subsample > 1` enables a two-phase solve: Newton runs first on
    every k-th point (gather cost scales with point count) with a 2x-looser
    epsilon, then polishes on the full set. The final optimum is set by the
    full-resolution phase; only the approach path is subsampled.
    """
    gauss = make_gauss_params(resolution, outlier_ratio)
    offsets = neighborhood_offsets(neighborhood)
    soa = to_soa(vmap_)
    xs = source.masked_xyz().T  # (3,N)
    mask = source.mask
    eps = jnp.float32(transformation_epsilon)
    step_max = jnp.float32(step_size)

    def derivs(transform):
        return ndt_derivatives_soa(soa, xs, mask, transform, gauss, offsets, weighted)

    start = guess
    coarse_iters = jnp.int32(0)
    if coarse_subsample > 1:
        n = mask.shape[0]
        stride_mask = mask & (jnp.arange(n) % coarse_subsample == 0)
        xs_c = xs[:, ::coarse_subsample]
        mask_c = stride_mask[::coarse_subsample]

        def derivs_coarse(transform):
            return ndt_derivatives_soa(soa, xs_c, mask_c, transform, gauss, offsets, weighted)

        start, _, _, _, _, coarse_iters, _ = _newton_loop(
            derivs_coarse, guess, eps * 2.0, step_max, max_iterations
        )

    transform, score, grad, hess, _, it, converged = _newton_loop(
        derivs, start, eps, step_max, max_iterations
    )
    n_pts = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return NDTResult(
        transform=transform,
        score=score,
        iterations=it + coarse_iters,
        converged=converged,
        hessian=hess,
        trans_probability=score / n_pts,
    )
