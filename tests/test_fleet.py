"""Fleet data parallelism: sequences sharded over the mesh batch axis."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lv_slam_tpu.config import NDTConfig, OdometryConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.parallel import fleet, mesh as pmesh

_CFG = OdometryConfig(
    ndt=NDTConfig(leaf_cap=4096, lut_extent=64, coarse_subsample=1, retry_deviation_thresh=0.0)
)


@pytest.fixture(scope="module")
def sequences():
    cap, n_scans = 8192, 4
    seqs = []
    for s in range(8):
        # figure8 constrains the along-track direction (a sparse straight
        # corridor is translation-degenerate at this density)
        scans, poses, _ = synthetic.make_sequence(
            n_scans, seed=50 + s, trajectory="figure8", step=1.0,
            n_rings=32, n_azimuth=225,
        )
        clouds = [PointCloud.from_numpy(sc, cap=cap) for sc in scans]
        seqs.append(
            (
                jnp.stack([c.xyz for c in clouds]),
                jnp.stack([c.mask for c in clouds]),
                jnp.arange(n_scans, dtype=jnp.float32) * 0.1,
                poses,
            )
        )
    xyz = jnp.stack([s[0] for s in seqs])
    mask = jnp.stack([s[1] for s in seqs])
    stamps = jnp.stack([s[2] for s in seqs])
    gt = np.stack([s[3] for s in seqs])
    return xyz, mask, stamps, gt


def test_fleet_matches_single_sequence(sequences):
    xyz, mask, stamps, gt = sequences
    from lv_slam_tpu.odometry.fused import run_sequence_fused

    # single-device references first (the plain executables must not be
    # traced under the sharded context)
    singles = {
        s: np.asarray(run_sequence_fused(xyz[s], mask[s], stamps[s], _CFG))
        for s in (0, 5)
    }

    m = pmesh.make_mesh(n_batch=8, n_point=1)
    poses = np.asarray(fleet.run_fleet_odometry(m, xyz, mask, stamps, _CFG))
    assert poses.shape == (8, 4, 4, 4)
    assert np.isfinite(poses).all()

    for s in (0, 5):
        single = singles[s]
        np.testing.assert_allclose(poses[s], single, atol=5e-3)
        gt_rel = np.linalg.inv(gt[s][0]) @ gt[s][-1]
        err = np.linalg.norm(poses[s][-1][:3, 3] - gt_rel[:3, 3])
        # sanity only: this test pins fleet==single parity; tracking accuracy
        # at full density is covered by test_fused (the tiny 64 m LUT and
        # 4k-leaf map here truncate the scene)
        assert err < 0.5, (s, err)


def test_fleet_with_lfa_matches_single(sequences):
    """The LFA-coupled fleet (the bench's fleet_* program: dlo feeding the
    fused LFA refinement per lane) matches the single-sequence chain
    run_sequence_fused -> run_sequence_lfa on each shard."""
    from lv_slam_tpu.config import LfaConfig
    from lv_slam_tpu.lfa.fused import run_sequence_lfa
    from lv_slam_tpu.odometry.fused import run_sequence_fused

    xyz, mask, stamps, _ = sequences
    xyz, mask, stamps = xyz[:4], mask[:4], stamps[:4]
    lfa_cfg = LfaConfig(
        scan_line=32, edge_cap=1024, planar_cap=2048,
        map_edge_cap=8192, map_planar_cap=16384,
    )

    singles = {}
    for s in (0, 3):
        odom = run_sequence_fused(xyz[s], mask[s], stamps[s], _CFG)
        singles[s] = np.asarray(
            run_sequence_lfa(xyz[s], mask[s], lfa_cfg, odom_poses=odom)
        )

    m = pmesh.make_mesh(n_batch=4, n_point=1)
    poses = np.asarray(
        fleet.run_fleet_odometry(m, xyz, mask, stamps, _CFG, lfa_cfg=lfa_cfg)
    )
    assert poses.shape == (4, 4, 4, 4)
    assert np.isfinite(poses).all()
    for s in (0, 3):
        np.testing.assert_allclose(poses[s], singles[s], atol=5e-3)
