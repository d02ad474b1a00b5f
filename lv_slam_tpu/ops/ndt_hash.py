"""NDT hot path, hash-table variant: ONE gather per neighborhood offset.

The SoA pass (`ops/ndt_soa.py`) costs two *serial* gathers per DIRECT offset:
voxel coord -> leaf id (dense LUT) -> packed leaf row. On the v5e the gather
engine is latency-bound (~0.5 ms per 65k-index gather regardless of table
size or row width), so that serial chain is the per-iteration floor of the
whole odometry stage. This variant removes the indirection:

- leaves are re-hashed into an open-addressed table of B buckets x 2 slots;
  each 16-float slot embeds its voxel key (bitcast int32) ahead of the
  mu/icov/weight payload, so one 32-wide gather fetches BOTH probe slots and
  the key comparison resolves in registers — no second probe gather ever.
- bucket overflow (>= 3 leaves hashing to one bucket) drops the extra
  leaves. With B = 4 * leaf_cap the expected drop count is Poisson-tail
  small (lambda <= 0.25 per bucket -> ~0.2% of leaves worst-case); NDT's
  mixture score degrades gracefully with a dropped voxel. `n_dropped` is
  reported for observability.

Same math as `ndt_derivatives_soa` (shared `accumulate_ndt_terms`); the only
behavioral delta is the dropped-leaf set, bounded by the parity test.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.ndt import GaussParams, NDTResult, make_gauss_params
from lv_slam_tpu.ops.ndt_soa import _newton_loop, accumulate_ndt_terms
from lv_slam_tpu.ops.voxel_map import VoxelMap, _extent_of, neighborhood_offsets

# Fibonacci multiplicative hashing constant (2^32 / golden ratio)
_FIB = jnp.uint32(2654435769)
_EMPTY_KEY = jnp.int32(-1)


class HashVoxelMap(NamedTuple):
    table: jax.Array        # (B, 32): two 16-wide slots [key, mu(3), icov6, w, pad...]
    origin_cell: jax.Array  # (3,)
    resolution: jax.Array   # ()
    extent: int             # key space = extent^3 (same flat key as the LUT)
    n_dropped: jax.Array    # () int32 leaves lost to bucket overflow


def _hash(key: jax.Array, b_bits: int) -> jax.Array:
    h = key.astype(jnp.uint32) * _FIB
    return (h >> jnp.uint32(32 - b_bits)).astype(jnp.int32)


def to_hash(vmap_: VoxelMap, buckets_per_leaf: int = 4) -> HashVoxelMap:
    """Re-index a built VoxelMap into the bucket-pair hash table. Jittable."""
    e = _extent_of(vmap_.lut)
    # Embedded-key bitcast constraint (see the packed-row comment below):
    # valid keys live in [0, e^3) and must stay below the first float32 NaN
    # bit pattern (0x7F800000), or the TPU silently canonicalizes them in
    # data movement and distinct leaves merge. e is static, so enforce here.
    if e**3 >= 0x7F800000:
        raise ValueError(
            f"lut_extent {e} gives key space {e**3} >= 0x7F800000: embedded "
            "keys would be NaN bit patterns (TPU-canonicalized); max extent 1288"
        )
    leaf_cap = vmap_.leaf_cap
    n_buckets = 1
    while n_buckets < buckets_per_leaf * leaf_cap:
        n_buckets *= 2
    b_bits = n_buckets.bit_length() - 1

    # recover each leaf's flat voxel key from its mean (the centered-moment
    # build guarantees the mean lies inside its cell)
    coords = jnp.floor(vmap_.means / vmap_.resolution).astype(jnp.int32)
    rel = coords - vmap_.origin_cell
    key = (rel[:, 0] * e + rel[:, 1]) * e + rel[:, 2]
    key = jnp.where(vmap_.valid, key, _EMPTY_KEY)
    h = _hash(key, b_bits)

    rows = jnp.arange(leaf_cap, dtype=jnp.int32)
    sentinel = jnp.int32(leaf_cap)
    # slot 0: lowest leaf index per bucket; slot 1: lowest among the rest
    first = jnp.full((n_buckets,), sentinel, jnp.int32)
    first = first.at[jnp.where(vmap_.valid, h, 0)].min(
        jnp.where(vmap_.valid, rows, sentinel), mode="drop"
    )
    is_first = vmap_.valid & (rows == first[h])
    loser = vmap_.valid & ~is_first
    second = jnp.full((n_buckets,), sentinel, jnp.int32)
    second = second.at[jnp.where(loser, h, 0)].min(
        jnp.where(loser, rows, sentinel), mode="drop"
    )
    is_second = loser & (rows == second[h])
    n_dropped = jnp.sum((loser & ~is_second).astype(jnp.int32))

    c = vmap_.icovs
    # Embedded-key bitcast safety on TPU: the hardware canonicalizes NaN bit
    # patterns during data movement. Valid keys are in [0, extent^3) — far
    # below the first NaN pattern (0x7F800001) — so they survive bit-exact.
    # The -1 empty marker IS a NaN pattern; canonicalization maps it to
    # 0x7FC00000 = 2143289344, which still never equals a valid query key,
    # so empty slots stay misses. (Do NOT embed arbitrary negative keys.)
    key_f = jax.lax.bitcast_convert_type(key, jnp.float32)
    packed = jnp.concatenate(
        [
            key_f[:, None],                               # 0: embedded key
            vmap_.means,                                  # 1:4
            c[:, 0, 0:1], c[:, 0, 1:2], c[:, 0, 2:3],     # 4,5,6
            c[:, 1, 1:2], c[:, 1, 2:3], c[:, 2, 2:3],     # 7,8,9
            vmap_.weights[:, None],                       # 10
            jnp.zeros((leaf_cap, 5), jnp.float32),
        ],
        axis=1,
    )  # (L,16)
    empty_row = jnp.zeros((16,), jnp.float32).at[0].set(
        jax.lax.bitcast_convert_type(_EMPTY_KEY, jnp.float32)
    )
    slot0 = jnp.where(
        (first < sentinel)[:, None], packed[jnp.minimum(first, leaf_cap - 1)], empty_row
    )
    slot1 = jnp.where(
        (second < sentinel)[:, None], packed[jnp.minimum(second, leaf_cap - 1)], empty_row
    )
    return HashVoxelMap(
        table=jnp.concatenate([slot0, slot1], axis=1),
        origin_cell=vmap_.origin_cell,
        resolution=vmap_.resolution,
        extent=e,
        n_dropped=n_dropped,
    )


def ndt_derivatives_hash(
    hmap: HashVoxelMap,
    xs: jax.Array,          # (3, N)
    mask: jax.Array,        # (N,)
    transform: jax.Array,   # (4,4)
    gauss: GaussParams,
    offsets: jax.Array,     # (K,3)
    weighted: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused score/gradient/Hessian; ONE 32-wide gather per offset."""
    e = hmap.extent
    b_bits = (hmap.table.shape[0]).bit_length() - 1
    rot = transform[:3, :3]
    t = transform[:3, 3]
    y = jnp.einsum("ij,jn->in", rot, xs) + t[:, None]         # (3,N)
    coords = jnp.floor(y / hmap.resolution).astype(jnp.int32)

    score = jnp.float32(0.0)
    grad = jnp.zeros((6,), jnp.float32)
    hess = jnp.zeros((6, 6), jnp.float32)

    for ki in range(offsets.shape[0]):
        rel = coords - hmap.origin_cell[:, None] + offsets[ki][:, None]
        in_extent = jnp.all((rel >= 0) & (rel < e), axis=0)
        key = (rel[0] * e + rel[1]) * e + rel[2]
        key = jnp.where(in_extent & mask, key, _EMPTY_KEY)
        h = _hash(key, b_bits)
        row32 = hmap.table[h]                                 # THE gather (N,32)
        k0 = jax.lax.bitcast_convert_type(row32[:, 0], jnp.int32)
        k1 = jax.lax.bitcast_convert_type(row32[:, 16], jnp.int32)
        valid_key = key >= 0
        m0 = valid_key & (k0 == key)
        m1 = valid_key & ~m0 & (k1 == key)
        row = jnp.where(m0[:, None], row32[:, :16], row32[:, 16:])
        s, g, hh = accumulate_ndt_terms(y, row, m0 | m1, gauss, weighted, col0=1)
        score, grad, hess = score + s, grad + g, hess + hh

    return score, grad, hess


def ndt_align_hash(
    vmap_: VoxelMap,
    source: PointCloud,
    guess: jax.Array,
    *,
    buckets_per_leaf: int = 4,
    **kwargs,
) -> NDTResult:
    """Drop-in `ndt_align_soa` with the single-gather hash derivative pass."""
    return ndt_align_hash_table(to_hash(vmap_, buckets_per_leaf), source, guess, **kwargs)


def ndt_align_hash_table(
    hmap: HashVoxelMap,
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
    """Align against a pre-built hash table (the fused odometry carries the
    table as its keyframe-map state so the dense LUT never materializes)."""
    gauss = make_gauss_params(resolution, outlier_ratio)
    offsets = neighborhood_offsets(neighborhood)
    xs = source.masked_xyz().T
    mask = source.mask
    eps = jnp.float32(transformation_epsilon)
    step_max = jnp.float32(step_size)

    def derivs(transform):
        return ndt_derivatives_hash(hmap, xs, mask, transform, gauss, offsets, weighted)

    start = guess
    coarse_iters = jnp.int32(0)
    if coarse_subsample > 1:
        n = mask.shape[0]
        stride_mask = mask & (jnp.arange(n) % coarse_subsample == 0)
        xs_c = xs[:, ::coarse_subsample]
        mask_c = stride_mask[::coarse_subsample]

        def derivs_coarse(transform):
            return ndt_derivatives_hash(hmap, xs_c, mask_c, transform, gauss, offsets, weighted)

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
