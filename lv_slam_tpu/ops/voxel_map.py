"""Voxel-Gaussian NDT map: build + constant-time neighborhood lookup.

TPU-native replacement for `pclomp::VoxelGridCovariance`
(`include/ndt_omp/voxel_grid_covariance_omp_impl.hpp:159-370`) and its PCA
extension `pclpca::VoxelGridCovariance`
(`include/ndt_pca/voxel_grid_covariance_pca_impl.hpp:365-397`):

- `std::map<size_t, Leaf>` becomes a flat leaf table (means/icovs/weights) of
  static capacity, built with one lexicographic sort + segment reductions.
- The FLANN kd-tree / DIRECT hash probing becomes a dense int32 voxel->leaf
  LUT: `DIRECT1/7/26` neighborhoods are one gather per offset.
- Covariances are accumulated centered on each voxel's geometric cell center,
  so float32 raw moments never cancel catastrophically (the reference uses
  double accumulators instead).
- Eigen inflation follows eq. 6.11 [Magnusson 2009]: eigenvalues below
  `0.01 * lambda_max` are clamped (`_impl.hpp:344-358`); the inverse covariance
  is formed as `V diag(1/lambda) V^T` directly.
- PCA dimensionality weights (`dimension_2d_`): with sigma ascending,
  `a1d=(s2-s1)/s2, a2d=(s1-s0)/s2, a3d=s0/s2`; label = argmax;
  weight = scale(label) * |mean|, scale = (0.75 linear, 1.25 planar, 1.0
  spherical) (`voxel_grid_covariance_pca_impl.hpp:365-397`).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core.cloud import PointCloud

# Flat-key sentinel for points outside the LUT extent (or invalid lanes).
_PCA_SCALES = jnp.array([0.75, 1.25, 1.0], dtype=jnp.float32)


class VoxelMap(NamedTuple):
    """Fixed-capacity voxel-Gaussian map (a pytree of device arrays).

    `lut` maps a flattened in-extent voxel coordinate to its leaf row, or -1.
    `origin_cell` is the integer cell coordinate of LUT index (0,0,0).
    """

    means: jax.Array        # (L, 3)  voxel Gaussian means (world/map frame)
    icovs: jax.Array        # (L, 3, 3) inflated inverse covariances
    weights: jax.Array      # (L,)   pclpca dimension weight (1.0 if unweighted)
    normals: jax.Array      # (L, 3) surface normal (min-eigenvalue direction)
    valid: jax.Array        # (L,)   bool
    lut: jax.Array          # (E*E*E,) int32 leaf row or -1
    origin_cell: jax.Array  # (3,) int32
    resolution: jax.Array   # () f32
    n_leaves: jax.Array     # () int32 number of valid leaves

    @property
    def leaf_cap(self) -> int:
        return self.means.shape[0]


def _extent_of(lut: jax.Array) -> int:
    e = round(lut.shape[0] ** (1.0 / 3.0))
    while e * e * e < lut.shape[0]:
        e += 1
    return e


def build_voxel_map(
    cloud: PointCloud,
    resolution: float,
    leaf_cap: int = 32768,
    lut_extent: int = 256,
    min_points_per_voxel: int = 6,
    min_covar_eigvalue_mult: float = 0.01,
    weighted: bool = False,
) -> VoxelMap:
    """Build the NDT map from a (padded, masked) cloud. Fully jittable."""
    e = lut_extent
    n = cloud.cap
    res = jnp.float32(resolution)
    xyz = cloud.masked_xyz()
    mask = cloud.mask

    coords = jnp.floor(xyz / res).astype(jnp.int32)  # (N,3)
    # LUT origin: cell floor of the min valid coordinate (centers the extent
    # on the data; keyframe maps span <= ~2*far_thresh cells at res 1.0).
    big = jnp.int32(2**30)
    masked_coords = jnp.where(mask[:, None], coords, big)
    origin_cell = jnp.min(masked_coords, axis=0)
    origin_cell = jnp.where(origin_cell == big, 0, origin_cell)

    rel = coords - origin_cell  # (N,3) in [0, E) if in extent
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=1) & mask
    flat = (rel[:, 0] * e + rel[:, 1]) * e + rel[:, 2]
    overflow_key = jnp.int32(e * e * e)
    keys = jnp.where(in_extent, flat, overflow_key)

    # Sort points by voxel key; contiguous runs become leaves.
    order = jnp.argsort(keys)
    skeys = keys[order]
    sxyz = xyz[order]
    svalid = in_extent[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), skeys[1:] != skeys[:-1]])
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # (N,)
    # Leaves beyond capacity (or the overflow run) land in a scratch bucket.
    seg_id = jnp.where(svalid & (seg_id < leaf_cap), seg_id, leaf_cap)
    num_seg = leaf_cap + 1

    # Center on the cell's geometric center: |centered| <= res/2 keeps float32
    # second moments cancellation-free. All reductions ride ONE packed
    # segment_sum (segment ops lower to scatters; each costs ~ms at this
    # size) plus the one segment_max for the keys.
    cell_center = (jnp.floor(sxyz / res) + 0.5) * res
    centered = jnp.where(svalid[:, None], sxyz - cell_center, 0.0)
    outer = centered[:, :, None] * centered[:, None, :]
    seg_in = jnp.concatenate(
        [svalid.astype(jnp.float32)[:, None], centered, outer.reshape(n, 9)],
        axis=1,
    )  # (N,13): count, sum_c(3), sum_cc(9)
    sums = jax.ops.segment_sum(seg_in, seg_id, num_segments=num_seg)[:leaf_cap]
    counts = sums[:, 0]
    sum_c = sums[:, 1:4]
    sum_cc = sums[:, 4:13].reshape(leaf_cap, 3, 3)
    seg_key = jax.ops.segment_max(jnp.where(svalid, skeys, -1), seg_id, num_segments=num_seg)[:leaf_cap]

    cnt = jnp.maximum(counts, 1.0)
    mean_c = sum_c / cnt[:, None]
    # cov = (E[xx^T] - mu mu^T) * (n-1)/n, the reference's single-pass formula
    # (`voxel_grid_covariance_omp_impl.hpp:330-331`), in centered coordinates.
    cov = (sum_cc / cnt[:, None, None] - mean_c[:, :, None] * mean_c[:, None, :])
    cov = cov * ((cnt - 1.0) / cnt)[:, None, None]

    # Reconstruct the world-frame mean: cell center of the leaf + centered mean.
    kz = seg_key % e
    ky = (seg_key // e) % e
    kx = seg_key // (e * e)
    leaf_cell = jnp.stack([kx, ky, kz], axis=1) + origin_cell
    leaf_center = (leaf_cell.astype(jnp.float32) + 0.5) * res
    means = leaf_center + mean_c

    leaf_occupied = (seg_key >= 0) & (counts >= min_points_per_voxel)

    # Symmetric 3x3 eigendecomposition (ascending, like Eigen's
    # SelfAdjointEigenSolver) + eq. 6.11 inflation. Closed-form analytic
    # solver: XLA's iterative eigh costs ~100 ms for 32k batched 3x3 on TPU.
    from lv_slam_tpu.ops.linalg3 import eigh3x3

    evals, evecs = eigh3x3(jnp.where(leaf_occupied[:, None, None], cov, jnp.eye(3, dtype=cov.dtype)))
    # The reference rejects leaves with negative eigenvalues (exact arithmetic
    # assumption); in float32, thin planar voxels routinely round the smallest
    # eigenvalue a hair below zero, so tolerate rounding-scale negatives —
    # the eq-6.11 inflation floor (0.01 * lambda_max) replaces them anyway.
    tol = 1e-5 * jnp.abs(evals[:, 2])
    pos_def = (evals[:, 0] >= -tol) & (evals[:, 1] >= -tol) & (evals[:, 2] > 0)
    min_ev = min_covar_eigvalue_mult * evals[:, 2]
    evals_inf = jnp.maximum(evals, min_ev[:, None])
    inv_evals = 1.0 / jnp.maximum(evals_inf, 1e-30)
    icovs = jnp.einsum("lij,lj,lkj->lik", evecs, inv_evals, evecs)
    finite = jnp.all(jnp.isfinite(icovs.reshape(leaf_cap, 9)), axis=1)
    valid = leaf_occupied & pos_def & finite

    if weighted:
        sigma = jnp.sqrt(jnp.maximum(evals_inf, 0.0))
        s_max = jnp.maximum(sigma[:, 2], 1e-30)
        feats = jnp.stack(
            [
                (sigma[:, 2] - sigma[:, 1]) / s_max,   # linear-ness
                (sigma[:, 1] - sigma[:, 0]) / s_max,   # planar-ness
                sigma[:, 0] / s_max,                   # spherical-ness
            ],
            axis=1,
        )
        label = jnp.argmax(feats, axis=1)
        weights_arr = _PCA_SCALES[label] * jnp.linalg.norm(means, axis=1)
    else:
        weights_arr = jnp.ones((leaf_cap,), jnp.float32)
    weights_arr = jnp.where(valid, weights_arr, 0.0)

    # Dense LUT scatter: valid leaves write their row index at their flat key.
    lut = jnp.full((e * e * e,), -1, dtype=jnp.int32)
    rows = jnp.arange(leaf_cap, dtype=jnp.int32)
    scatter_idx = jnp.where(valid, seg_key, e * e * e)  # drop invalid
    lut = lut.at[scatter_idx].set(jnp.where(valid, rows, -1), mode="drop")

    means = jnp.where(valid[:, None], means, 0.0)
    normals = jnp.where(valid[:, None], evecs[:, :, 0], 0.0)
    return VoxelMap(
        means=means,
        icovs=jnp.where(valid[:, None, None], icovs, 0.0),
        weights=weights_arr,
        normals=normals,
        valid=valid,
        lut=lut,
        origin_cell=origin_cell,
        resolution=res,
        n_leaves=jnp.sum(valid.astype(jnp.int32)),
    )


# DIRECT neighborhoods (`voxel_grid_covariance_omp_impl.hpp:419-443`):
# DIRECT1 = the containing cell only; DIRECT7 = + 6 face neighbors;
# DIRECT26 = full 3x3x3 block.
def neighborhood_offsets(name: str) -> jnp.ndarray:
    name = name.upper()
    if name == "DIRECT1":
        off = [(0, 0, 0)]
    elif name == "DIRECT7":
        off = [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
    elif name == "DIRECT26":
        off = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    else:
        raise ValueError(f"unknown neighborhood {name!r} (KDTREE is subsumed by DIRECT modes)")
    return jnp.asarray(off, dtype=jnp.int32)


def lookup_leaves(
    vmap_: VoxelMap, points: jax.Array, offsets: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Gather leaf Gaussians at each point's DIRECT-K neighborhood.

    points: (N,3) query positions. offsets: (K,3) int cell offsets.
    Returns (means (N,K,3), icovs (N,K,3,3), weights (N,K), hit (N,K)).
    """
    e = _extent_of(vmap_.lut)
    coords = jnp.floor(points / vmap_.resolution).astype(jnp.int32)
    rel = coords[:, None, :] - vmap_.origin_cell + offsets[None, :, :]  # (N,K,3)
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=-1)
    flat = (rel[..., 0] * e + rel[..., 1]) * e + rel[..., 2]
    flat = jnp.where(in_extent, flat, 0)
    leaf = vmap_.lut[flat]  # (N,K)
    hit = in_extent & (leaf >= 0)
    leaf = jnp.where(hit, leaf, 0)
    means = vmap_.means[leaf]
    icovs = vmap_.icovs[leaf]
    weights = vmap_.weights[leaf]
    return means, icovs, weights, hit
