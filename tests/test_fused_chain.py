"""The fused dlo+LFA chain must equal the two component programs run
back-to-back, and chunked state threading must equal the unchunked run
(`pipeline/fused_chain.py`; flagship topology
`launch/dlo_lfa_ggo_kitti.launch:62-88`)."""

import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.config import LfaConfig, NDTConfig, OdometryConfig, PrefilterConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.lfa.fused import run_sequence_lfa
from lv_slam_tpu.odometry.fused import run_sequence_fused
from lv_slam_tpu.pipeline.fused_chain import run_sequence_chain


def _stack(scans, cap):
    clouds = [PointCloud.from_numpy(s, cap=cap) for s in scans]
    xyz = jnp.stack([c.xyz for c in clouds])
    mask = jnp.stack([c.mask for c in clouds])
    inten = jnp.stack([c.intensity for c in clouds])
    return xyz, mask, inten


_CAP = 32768
_ODO = OdometryConfig(ndt=NDTConfig(leaf_cap=16384, lut_extent=256))
_LFA = LfaConfig(
    scan_line=32, edge_cap=2048, planar_cap=4096,
    map_edge_cap=8192, map_planar_cap=16384,
)


def test_chain_matches_split_programs(small_sequence):
    scans, gt, _ = small_sequence
    pf = PrefilterConfig(raw_cap=_CAP, out_cap=_CAP)
    stamps = jnp.arange(len(scans), dtype=jnp.float32) * 0.1
    xyz, mask, inten = _stack(scans, _CAP)

    (odom_s, filt_s) = run_sequence_fused(
        xyz, mask, stamps, _ODO, pf, inten=inten, return_filtered=True
    )
    refined_s = run_sequence_lfa(xyz, mask, _LFA, odom_poses=odom_s)

    odom_c, refined_c, filt_c = run_sequence_chain(
        xyz, mask, stamps, _ODO, pf, _LFA, inten=inten, return_filtered=True
    )
    np.testing.assert_allclose(np.asarray(odom_c), np.asarray(odom_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(refined_c), np.asarray(refined_s), atol=1e-5)
    for a, b in zip(filt_c, filt_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # accuracy sanity on the refined output
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    final_err = np.linalg.norm(
        np.asarray(refined_c)[-1][:3, 3] - gt_rel[-1][:3, 3]
    )
    assert final_err < 0.25, final_err


def test_chain_chunked_matches_unchunked(small_sequence):
    scans, _, _ = small_sequence
    pf = PrefilterConfig(raw_cap=_CAP, out_cap=_CAP)
    n = len(scans)
    stamps = jnp.arange(n, dtype=jnp.float32) * 0.1
    xyz, mask, inten = _stack(scans, _CAP)

    odom_w, refined_w = run_sequence_chain(
        xyz, mask, stamps, _ODO, pf, _LFA, inten=inten
    )
    k = n // 2
    (o1, r1), state = run_sequence_chain(
        xyz[:k], mask[:k], stamps[:k], _ODO, pf, _LFA,
        inten=inten[:k], return_state=True,
    )
    o2, r2 = run_sequence_chain(
        xyz[k:], mask[k:], stamps[k:], _ODO, pf, _LFA,
        inten=inten[k:], init_state=state,
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(o1), np.asarray(o2)]), np.asarray(odom_w),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.concatenate([np.asarray(r1), np.asarray(r2)]), np.asarray(refined_w),
        atol=1e-5,
    )
