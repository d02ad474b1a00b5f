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
