"""Grid-bucketed k-nearest-neighbor search over padded point sets.

The LFA stage (LOAM-style feature odometry/mapping, reference: the external
A-LOAM package launched by `launch/dlo_lfa_*.launch`) needs k-NN queries on
feature clouds (2 points to form a line, 5 to fit a line/plane). Instead of
kd-trees, points are bucketed into a uniform grid (cell ~ the search radius):
one sort at build; each query gathers up to `slots_per_cell` points from the
27 neighboring cells and top-k's over that fixed candidate set — all dense
gathers, no data-dependent shapes.

Points per cell beyond `slots_per_cell` are dropped from candidacy (bounded
occupancy is guaranteed upstream by the voxel-downsampling of feature
clouds). Distances to dropped/missing candidates are +inf.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_EXTENT = 1024
_KEY_MAX = jnp.int32(2**31 - 1)

_OFF27 = jnp.asarray(
    [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)],
    dtype=jnp.int32,
)


class KnnGrid(NamedTuple):
    keys: jax.Array         # (N,) ascending flat cell keys (pad: INT32_MAX)
    xyz: jax.Array          # (N,3) points sorted by key
    origin_cell: jax.Array  # (3,)
    cell_size: jax.Array    # ()


def build_grid(xyz: jax.Array, mask: jax.Array, cell_size: float) -> KnnGrid:
    """xyz (N,3), mask (N,) -> sorted grid. Jittable."""
    e = _EXTENT
    cs = jnp.float32(cell_size)
    coords = jnp.floor(xyz / cs).astype(jnp.int32)
    big = jnp.int32(2**30)
    origin = jnp.min(jnp.where(mask[:, None], coords, big), axis=0)
    origin = jnp.where(origin == big, 0, origin)
    rel = coords - origin
    ok = jnp.all((rel >= 0) & (rel < e), axis=1) & mask
    flat = (rel[:, 0] * e + rel[:, 1]) * e + rel[:, 2]
    keys = jnp.where(ok, flat, _KEY_MAX)
    order = jnp.argsort(keys)
    return KnnGrid(keys=keys[order], xyz=xyz[order], origin_cell=origin, cell_size=cs)


# ---------------------------------------------------------------------------
# bucket-table variant: O(1) gathers per query batch
# ---------------------------------------------------------------------------
#
# Measured v5e cost model: gathers cost ~0.5 ms per 65k INDICES regardless of
# row width, and `searchsorted` lowers to log2(n) serial gather rounds. The
# sorted-grid `knn` above therefore pays ~16 gather rounds (searchsorted) plus
# 27-cell x slots candidate gathers per query batch. This variant stores each
# cell's first S points DIRECTLY in a hashed (B, S, 4) bucket table, so a
# query batch costs ONE row gather over 8 probe cells:
# - 8-cell probe: the 2x2x2 cell block around (q - cell/2) covers every point
#   within cell_size/2 of the query — pick cell_size = 2 * search radius.
# - hash collisions (two cells sharing a bucket) mix candidates; wrong-cell
#   points fail the caller's radius gate, so collisions only cost recall in
#   the ~few % of colliding cells.

_OFF8 = jnp.asarray(
    [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=jnp.int32
)
_H1, _H2, _H3 = 73856093, 19349669, 83492791  # classic spatial-hash primes


class CellTable(NamedTuple):
    table: jax.Array      # (B, S*4): S slots of [x, y, z, valid]
    cell_size: jax.Array  # ()

    @property
    def slots(self) -> int:
        return self.table.shape[1] // 4


def _bucket(coords: jax.Array, n_buckets: int) -> jax.Array:
    h = (
        coords[..., 0] * _H1 ^ coords[..., 1] * _H2 ^ coords[..., 2] * _H3
    ).astype(jnp.uint32)
    return (h % jnp.uint32(n_buckets)).astype(jnp.int32)


def build_cell_table(
    xyz: jax.Array,
    mask: jax.Array,
    cell_size: float,
    n_buckets: int | None = None,
    slots: int = 8,
) -> CellTable:
    """xyz (N,3), mask (N,) -> hashed bucket table. Jittable.

    One sort (bucket ids), one packed gather, one scatter. Scatter cost on
    TPU scales with the TABLE size, so `n_buckets` defaults to ~2N (clamped
    to [2^12, 2^18]): feature maps occupy far fewer cells than points (they
    are voxel-deduped well below the cell size), keeping collisions at a few
    percent. Pass n_buckets explicitly for point sets that are sparse
    relative to the cell size."""
    n = xyz.shape[0]
    if n_buckets is None:
        n_buckets = 1 << max(12, min(18, (2 * n - 1).bit_length()))
    cs = jnp.float32(cell_size)
    coords = jnp.floor(xyz / cs).astype(jnp.int32)
    b = jnp.where(mask, _bucket(coords, n_buckets), jnp.int32(n_buckets))
    order = jnp.argsort(b)
    sb = b[order]
    packed = jnp.concatenate(
        [xyz, mask[:, None].astype(jnp.float32)], axis=1
    )[order]                                              # one gather (N,4)
    idx = jnp.arange(n, dtype=jnp.int32)
    new_seg = jnp.concatenate([jnp.ones((1,), bool), sb[1:] != sb[:-1]])
    seg_start = jax.lax.cummax(jnp.where(new_seg, idx, 0))
    rank = idx - seg_start
    ok = (packed[:, 3] > 0.5) & (rank < slots) & (sb < n_buckets)
    dest = jnp.where(ok, sb * slots + rank, n_buckets * slots)
    rows = jnp.concatenate([packed[:, :3], ok[:, None].astype(jnp.float32)], axis=1)
    table = jnp.zeros((n_buckets * slots, 4), jnp.float32)
    table = table.at[dest].set(rows, mode="drop")         # one scatter
    return CellTable(table=table.reshape(n_buckets, slots * 4), cell_size=cs)


def empty_cell_table(n_buckets: int, slots: int, cell_size: float) -> CellTable:
    """All-invalid table (valid flags 0) for incremental insertion."""
    return CellTable(
        table=jnp.zeros((n_buckets, slots * 4), jnp.float32),
        cell_size=jnp.float32(cell_size),
    )


def insert_cell_table(
    table: CellTable, xyz: jax.Array, mask: jax.Array, resolution: float
) -> CellTable:
    """Dedup-first insertion of a (small) new point batch into a persistent
    table: new points whose voxel (at `resolution`) is already occupied by a
    stored point are dropped (the map wins — same semantics as
    `voxel_dedup_first` merging), the rest claim free slots of their cell's
    bucket (first-come; a full cell drops the overflow — matching what the
    per-scan rebuild kept visible to queries anyway).

    This replaces the per-scan `build_cell_table` + million-row merge sort of
    the LFA world maps (the map only ever changed by ONE bounded feature
    batch per scan): cost is one small multi-key sort over the batch, one
    bucket-row gather, and one scatter — all sized to the BATCH, not the map.
    """
    n_buckets = table.table.shape[0]
    s = table.slots
    n = xyz.shape[0]
    cs = table.cell_size
    res = jnp.float32(resolution)

    from lv_slam_tpu.ops.prefilter import _pack_yz, _unpack_yz

    vox = jnp.floor(xyz / res).astype(jnp.int32)
    cell = jnp.floor(xyz / cs).astype(jnp.int32)
    b = jnp.where(mask, _bucket(cell, n_buckets), jnp.int32(n_buckets))
    big = jnp.int32(2**30)
    vx = jnp.where(mask, vox[:, 0], big)
    vyz = _pack_yz(vox[:, 1], vox[:, 2])  # one packed key column (world vox
    # coords stay within the ±16384 pack range for runs under ~6.5 km at the
    # 0.4 m line resolution — one fewer carried sort operand)
    # one multi-key sort groups bucket runs AND voxel runs (a voxel lies
    # inside one cell, so same-voxel rows are adjacent within a bucket run)
    sb, svx, svyz, sx, sy, sz = jax.lax.sort(
        (b, vx, vyz, xyz[:, 0], xyz[:, 1], xyz[:, 2]),
        num_keys=3,
    )
    svy, svz = _unpack_yz(svyz)
    smask = sb < n_buckets
    first_in_vox = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (sb[1:] != sb[:-1]) | (svx[1:] != svx[:-1]) | (svyz[1:] != svyz[:-1]),
        ]
    )

    rows = table.table[jnp.where(smask, sb, 0)].reshape(n, s, 4)  # ONE gather
    occ_valid = rows[..., 3] > 0.5
    occ_vox = jnp.floor(rows[..., :3] / res).astype(jnp.int32)
    pv = jnp.stack([svx, svy, svz], axis=1)
    dup_map = jnp.any(
        occ_valid & jnp.all(occ_vox == pv[:, None, :], axis=-1), axis=-1
    )
    keep = smask & first_in_vox & ~dup_map

    # rank among KEPT rows within each bucket run (exclusive cumsum rebased
    # at run starts via cummax — ek is nondecreasing)
    ki = keep.astype(jnp.int32)
    ek = jnp.cumsum(ki) - ki
    new_b = jnp.concatenate([jnp.ones((1,), bool), sb[1:] != sb[:-1]])
    base = jax.lax.cummax(jnp.where(new_b, ek, -1))
    rank = ek - base

    # the rank-th FREE slot of the gathered bucket row (crop leaves holes, so
    # occupancy is not a prefix): position where the running free count hits
    # rank+1
    free = ~occ_valid
    cumfree = jnp.cumsum(free.astype(jnp.int32), axis=1)
    hit = free & (cumfree == rank[:, None] + 1)
    pos = jnp.argmax(hit, axis=1).astype(jnp.int32)
    ok = keep & jnp.any(hit, axis=1)
    dest = jnp.where(ok, sb * s + pos, n_buckets * s)

    new_rows = jnp.stack([sx, sy, sz, jnp.ones_like(sx)], axis=1)
    flat = table.table.reshape(n_buckets * s, 4)
    flat = flat.at[dest].set(new_rows, mode="drop")  # one scatter (batch-sized)
    return CellTable(table=flat.reshape(n_buckets, s * 4), cell_size=cs)


def crop_cell_table(table: CellTable, center: jax.Array, radius: float) -> CellTable:
    """Invalidate slots beyond `radius` of `center` — one elementwise pass
    over the table (no gather/sort/scatter), freeing slots for reuse."""
    n_buckets = table.table.shape[0]
    s = table.slots
    rows = table.table.reshape(n_buckets, s, 4)
    d2 = jnp.sum((rows[..., :3] - center) ** 2, axis=-1)
    valid = (rows[..., 3] > 0.5) & (d2 < jnp.float32(radius) ** 2)
    rows = jnp.concatenate(
        [rows[..., :3], valid[..., None].astype(jnp.float32)], axis=-1
    )
    return CellTable(table=rows.reshape(n_buckets, s * 4), cell_size=table.cell_size)


def cell_table_points(table: CellTable) -> Tuple[jax.Array, jax.Array]:
    """All stored points as a flat ((B*S,3), (B*S,)) padded point set."""
    rows = table.table.reshape(-1, 4)
    return rows[:, :3], rows[:, 3] > 0.5


def candidates_cell(table: CellTable, queries: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Raw candidate set per query: (points (Q,8*S,3), valid (Q,8*S)).

    ONE row gather over the 8 probe cells around each query — complete for
    neighbors within cell_size/2. The caller applies its own radius gate and
    fits over the whole candidate set (no top-k selection network needed for
    radius-gated least-squares fits, which saves ~half the correspondence
    cost of the LFA mapping stage on v5e)."""
    n_buckets = table.table.shape[0]
    s = table.slots
    cs = table.cell_size
    base = jnp.floor((queries - cs / 2.0) / cs).astype(jnp.int32)  # (Q,3)
    cells = base[:, None, :] + _OFF8[None, :, :]                   # (Q,8,3)
    b = jnp.asarray(_bucket(cells, n_buckets))                     # (Q,8)
    # dedup duplicate probe buckets (see knn_cell)
    dup = jnp.any(
        (b[:, :, None] == b[:, None, :]) & jnp.tril(jnp.ones((8, 8), bool), k=-1),
        axis=-1,
    )
    rows = table.table[b]                                          # ONE gather
    q = queries.shape[0]
    cand = rows.reshape(q, 8, s, 4)
    ok = (cand[..., 3] > 0.5) & ~dup[:, :, None]
    return cand[..., :3].reshape(q, 8 * s, 3), ok.reshape(q, 8 * s)


def knn_cell(
    table: CellTable, queries: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """For each query (Q,3): (dists (Q,k), points (Q,k,3), valid (Q,k)).
    Complete for neighbors within cell_size/2 of the query (8-cell probe;
    duplicate probe buckets invalidated so the k slots hold distinct points)."""
    cand, ok = candidates_cell(table, queries)
    d2 = jnp.sum((queries[:, None, :] - cand) ** 2, axis=-1)
    d2 = jnp.where(ok, d2, jnp.inf)
    neg, top_idx = jax.lax.top_k(-d2, k)
    dists = jnp.sqrt(jnp.maximum(-neg, 0.0))
    points = jnp.take_along_axis(cand, top_idx[..., None], axis=1)
    valid = jnp.isfinite(dists)
    return dists, points, valid


def knn(
    grid: KnnGrid,
    queries: jax.Array,
    k: int,
    slots_per_cell: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """For each query (Q,3): (dists (Q,k), points (Q,k,3), valid (Q,k)).

    Candidates: the first `slots_per_cell` stored points of each of the 27
    cells around the query. Results are sorted ascending by distance; misses
    have dist=+inf, valid=False.
    """
    e = _EXTENT
    coords = jnp.floor(queries / grid.cell_size).astype(jnp.int32)
    rel = coords[:, None, :] - grid.origin_cell + _OFF27[None, :, :]       # (Q,27,3)
    in_extent = jnp.all((rel >= 0) & (rel < e), axis=-1)
    flat = (rel[..., 0] * e + rel[..., 1]) * e + rel[..., 2]
    cell_key = jnp.where(in_extent, flat, _KEY_MAX)                         # (Q,27)
    start = jnp.searchsorted(grid.keys, cell_key.reshape(-1)).reshape(cell_key.shape)

    n = grid.keys.shape[0]
    slot = jnp.arange(slots_per_cell, dtype=jnp.int32)
    idx = jnp.minimum(start[..., None] + slot, n - 1)                       # (Q,27,S)
    hit = (grid.keys[idx] == cell_key[..., None]) & in_extent[..., None]
    cand = grid.xyz[idx]                                                    # (Q,27,S,3)
    d2 = jnp.sum((queries[:, None, None, :] - cand) ** 2, axis=-1)
    d2 = jnp.where(hit, d2, jnp.inf)

    q = queries.shape[0]
    d2_flat = d2.reshape(q, -1)
    cand_flat = cand.reshape(q, -1, 3)
    # top-k smallest: negate for lax.top_k
    neg, top_idx = jax.lax.top_k(-d2_flat, k)
    dists = jnp.sqrt(jnp.maximum(-neg, 0.0))
    points = jnp.take_along_axis(cand_flat, top_idx[..., None], axis=1)
    valid = jnp.isfinite(dists)
    return dists, points, valid
