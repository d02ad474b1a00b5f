import jax
import numpy as np
import pytest

from lv_slam_tpu.config import LfaConfig
from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.lfa.features import extract_features
from lv_slam_tpu.lfa.pipeline import LfaPipeline

_CFG = LfaConfig(
    scan_line=32,
    edge_cap=2048,
    planar_cap=4096,
    map_edge_cap=16384,
    map_planar_cap=32768,
)


@pytest.fixture(scope="module")
def lfa_sequence():
    scans, poses, _ = synthetic.make_sequence(
        8, seed=21, trajectory="figure8", step=1.0, n_rings=32, n_azimuth=900,
        noise_std=0.005,
    )
    return scans, poses


def test_feature_extraction(lfa_sequence):
    scans, _ = lfa_sequence
    cloud = PointCloud.from_numpy(scans[0], cap=32768)
    feats = extract_features(cloud, _CFG)
    n_sharp = int(feats.sharp_mask.sum())
    n_flat = int(feats.flat_mask.sum())
    n_less_flat = int(feats.less_flat_mask.sum())
    assert n_sharp > 20, n_sharp
    assert n_flat > 100, n_flat
    assert n_less_flat > n_flat
    # edges should be on vertical structures / corners -> higher mean |z| spread
    sharp = np.asarray(feats.sharp)[np.asarray(feats.sharp_mask)]
    flat = np.asarray(feats.flat)[np.asarray(feats.flat_mask)]
    assert np.isfinite(sharp).all() and np.isfinite(flat).all()
    # flats dominated by ground: median z near the ground plane (sensor at 1.73)
    assert np.median(flat[:, 2]) < -1.0


def test_lfa_pipeline_tracks(lfa_sequence):
    scans, gt = lfa_sequence
    pipe = LfaPipeline(_CFG)
    est = [pipe.process_numpy(s, cap=32768) for s in scans]
    est = np.stack(est)
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    for i in range(1, len(scans)):
        rel_gt = np.linalg.inv(gt_rel[i - 1]) @ gt_rel[i]
        rel_est = np.linalg.inv(est[i - 1]) @ est[i]
        err = np.linalg.norm((np.linalg.inv(rel_est) @ rel_gt)[:3, 3])
        assert err < 0.10, (i, err)
    final_err = np.linalg.norm(est[-1][:3, 3] - gt_rel[-1][:3, 3])
    assert final_err < 0.25, final_err


def test_lfa_mapping_corrects_bad_seed(lfa_sequence):
    """Scan-to-map refinement must pull a perturbed odometry seed back to the
    map (this was silently a no-op before the NaN-poisoning fix)."""
    import jax.numpy as jnp

    from lv_slam_tpu.lfa.features import extract_features
    from lv_slam_tpu.lfa.mapping import FeatureMapping
    from lv_slam_tpu.core.cloud import PointCloud

    scans, gt = lfa_sequence
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    mapper = FeatureMapping(_CFG)
    for i in range(3):
        feats = extract_features(PointCloud.from_numpy(scans[i], cap=32768), _CFG)
        mapper.process(feats, gt_rel[i])
    feats = extract_features(PointCloud.from_numpy(scans[3], cap=32768), _CFG)
    bad_seed = gt_rel[3].copy()
    bad_seed[0, 3] += 0.3
    bad_seed[1, 3] -= 0.2
    refined = mapper.process(feats, bad_seed)
    err = np.linalg.norm(refined[:3, 3] - gt_rel[3][:3, 3])
    assert err < 0.08, err
