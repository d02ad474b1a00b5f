"""Bucket-table k-NN (ops/knn.build_cell_table / knn_cell) vs brute force."""

import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.ops.knn import build_cell_table, build_grid, knn, knn_cell


def test_cell_table_matches_brute_force(rng):
    pts = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
    mask = np.ones(2000, bool)
    mask[1500:] = False  # padding lanes must never be candidates
    pts[1500:] = 1e6
    queries = rng.uniform(-18, 18, (256, 3)).astype(np.float32)

    cell = 2.0
    table = build_cell_table(jnp.asarray(pts), jnp.asarray(mask), cell)
    dists, points, valid = knn_cell(table, jnp.asarray(queries), k=5)
    dists, points, valid = np.asarray(dists), np.asarray(points), np.asarray(valid)

    real = pts[:1500]
    for qi in range(0, 256, 7):
        bf = np.linalg.norm(real - queries[qi], axis=1)
        order = np.argsort(bf)
        # complete within cell_size/2 (8-cell probe guarantee), up to the
        # per-cell slot cap — verify the nearest neighbor when it's in range
        if bf[order[0]] < cell / 2.0:
            assert valid[qi, 0]
            assert abs(dists[qi, 0] - bf[order[0]]) < 1e-4, (qi, dists[qi, 0], bf[order[0]])
            np.testing.assert_allclose(points[qi, 0], real[order[0]], atol=1e-5)
        # every returned neighbor must be a genuine point (no padding leakage)
        for j in range(5):
            if valid[qi, j] and dists[qi, j] < cell / 2.0:
                nearest = np.abs(real - points[qi, j]).sum(axis=1).min()
                assert nearest < 1e-4


def test_voxel_dedup_first(rng):
    """Sort-only dedup: one point per occupied voxel, first-in-order wins."""
    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import voxel_dedup_first

    pts = rng.uniform(-8, 8, (4000, 3)).astype(np.float32)
    pts[2000:] = pts[:2000] + 0.01  # half the cloud duplicates the first half
    raw = np.concatenate([pts, np.arange(4000, dtype=np.float32)[:, None]], axis=1)
    cloud = PointCloud.from_numpy(raw, cap=8192)
    out = voxel_dedup_first(cloud, 1.0, 8192)
    xyz = np.asarray(out.xyz)[np.asarray(out.mask)]
    inten = np.asarray(out.intensity)[np.asarray(out.mask)]
    vox = np.unique(np.floor(pts).astype(np.int32), axis=0)
    assert xyz.shape[0] == vox.shape[0]
    got = np.unique(np.floor(xyz).astype(np.int32), axis=0)
    assert got.shape[0] == xyz.shape[0]  # one representative per voxel
    # stability: every survivor is a real input point (identified by its
    # intensity tag), and duplicates resolved to the EARLIER point
    assert (inten < 2000 + 1e-3).mean() > 0.95


def test_cell_table_agrees_with_sorted_grid(rng):
    """Within the shared coverage radius both structures return the same
    nearest neighbor."""
    pts = rng.uniform(-10, 10, (1024, 3)).astype(np.float32)
    mask = np.ones(1024, bool)
    queries = pts[:100] + rng.normal(0, 0.05, (100, 3)).astype(np.float32)

    table = build_cell_table(jnp.asarray(pts), jnp.asarray(mask), 2.0)
    grid = build_grid(jnp.asarray(pts), jnp.asarray(mask), 2.0)
    d1, p1, v1 = knn_cell(table, jnp.asarray(queries), k=1)
    d2, p2, v2 = knn(grid, jnp.asarray(queries), k=1, slots_per_cell=32)
    d1, d2 = np.asarray(d1)[:, 0], np.asarray(d2)[:, 0]
    agree = np.abs(d1 - d2) < 1e-4
    # hash collisions / slot caps may cost a few queries; require >= 95%
    assert agree.mean() > 0.95, agree.mean()


def test_insert_cell_table_incremental(rng):
    """Incremental insertion semantics: dedup-first at voxel resolution (the
    map wins), within-batch dedup, per-cell slot cap, and query parity with
    a from-scratch build over the same survivors."""
    import jax

    from lv_slam_tpu.ops.knn import (
        crop_cell_table, empty_cell_table, insert_cell_table,
    )

    res, cell, slots, nb = 0.5, 2.0, 6, 4096
    pts = rng.uniform(-20, 20, (3000, 3)).astype(np.float32)
    mask = np.ones(3000, bool)
    mask[2500:] = False
    pts[2500:] = 1e6

    t0 = empty_cell_table(nb, slots, cell)
    t1 = jax.jit(lambda t, x, m: insert_cell_table(t, x, m, res))(
        t0, jnp.asarray(pts), jnp.asarray(mask)
    )
    rows = np.asarray(t1.table).reshape(nb, slots, 4)
    stored = rows[rows[..., 3] > 0.5][:, :3]
    # every stored point is a real input point
    for p in stored[::17]:
        assert np.abs(pts[:2500] - p).sum(axis=1).min() < 1e-5
    # one stored point per voxel at most
    vox = np.floor(stored / res).astype(np.int64)
    uniq = np.unique(vox, axis=0)
    assert uniq.shape[0] == vox.shape[0]

    # re-inserting the same batch changes NOTHING (map wins on dup voxels)
    t2 = jax.jit(lambda t, x, m: insert_cell_table(t, x, m, res))(
        t1, jnp.asarray(pts), jnp.asarray(mask)
    )
    np.testing.assert_array_equal(np.asarray(t2.table), np.asarray(t1.table))

    # query parity: nearest neighbor matches a from-scratch table built over
    # the stored survivors
    queries = jnp.asarray(pts[:200] + rng.normal(0, 0.05, (200, 3)).astype(np.float32))
    smask = np.zeros(stored.shape[0] + 1, bool); smask[:-1] = True
    spts = np.concatenate([stored, [[1e6, 1e6, 1e6]]], 0).astype(np.float32)
    ref = build_cell_table(jnp.asarray(spts), jnp.asarray(smask), cell,
                           n_buckets=nb, slots=slots)
    d1, _, v1 = knn_cell(t1, queries, k=1)
    d2, _, v2 = knn_cell(ref, queries, k=1)
    close = np.asarray(d1)[:, 0] < cell / 2
    agree = np.abs(np.asarray(d1)[:, 0] - np.asarray(d2)[:, 0]) < 1e-4
    assert (agree | ~close).mean() > 0.95


def test_insert_cell_table_slot_overflow_and_crop_reuse(rng):
    """A full cell drops overflow points; crop frees slots for reuse."""
    import jax

    from lv_slam_tpu.ops.knn import (
        crop_cell_table, empty_cell_table, insert_cell_table,
    )

    res, cell, slots, nb = 0.1, 2.0, 4, 1024
    # 20 points in ONE cell, distinct voxels
    pts = (0.15 * np.arange(20)[:, None] * np.array([[1.0, 0, 0]])).astype(np.float32)
    pts += 0.05
    mask = np.ones(20, bool)
    t0 = empty_cell_table(nb, slots, cell)
    ins = jax.jit(lambda t, x, m: insert_cell_table(t, x, m, res))
    t1 = ins(t0, jnp.asarray(pts[:20]), jnp.asarray(mask))
    rows = np.asarray(t1.table).reshape(nb, slots, 4)
    # two cells covered (13 points in x<2.0, 7 in x>=2.0), each capped at
    # `slots` stored points
    n_valid = int((rows[..., 3] > 0.5).sum())
    assert n_valid == 2 * slots, n_valid

    # crop around far center frees everything; a later insert reuses slots
    t2 = crop_cell_table(t1, jnp.asarray([100.0, 0, 0]), 1.0)
    rows2 = np.asarray(t2.table).reshape(nb, slots, 4)
    assert int((rows2[..., 3] > 0.5).sum()) == 0
    t3 = ins(t2, jnp.asarray(pts), jnp.asarray(mask))
    rows3 = np.asarray(t3.table).reshape(nb, slots, 4)
    assert int((rows3[..., 3] > 0.5).sum()) == 2 * slots
