import numpy as np
import pytest

from lv_slam_tpu.core import se3
from lv_slam_tpu.ops.floor import detect_floor
from lv_slam_tpu.tools.calibration import estimate_pose_2d3d, estimate_pose_3d3d, umeyama
from lv_slam_tpu.tools.dlg import dlg_segmentation, extract_lines
from lv_slam_tpu.utils.nmea import parse_gprmc

import jax.numpy as jnp

from lv_slam_tpu.core.cloud import PointCloud


def test_nmea_gprmc():
    # standard example sentence (checksum-valid)
    s = "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A"
    out = parse_gprmc(s)
    assert out is not None and out.status == "A"
    np.testing.assert_allclose(out.latitude, 48 + 7.038 / 60, atol=1e-6)
    np.testing.assert_allclose(out.longitude, 11 + 31.0 / 60, atol=1e-6)
    assert parse_gprmc("$GPGGA,foo,bar") is None
    bad = parse_gprmc(s.replace("*6A", "*00"))
    assert bad is None  # checksum mismatch


def test_calibration_3d3d(rng):
    src = rng.uniform(-5, 5, (30, 3))
    t_true = np.asarray(se3.exp_se3(jnp.array([0.5, -1.2, 0.3, 0.1, -0.05, 0.8])))
    dst = src @ t_true[:3, :3].T + t_true[:3, 3] + rng.normal(0, 0.002, (30, 3))
    check_src = rng.uniform(-5, 5, (10, 3))
    check_dst = check_src @ t_true[:3, :3].T + t_true[:3, 3]
    est = estimate_pose_3d3d(src, dst, check_src, check_dst)
    np.testing.assert_allclose(est.transform, t_true, atol=5e-3)
    assert est.rmse < 0.01
    assert est.check_rmse < 0.01
    assert est.covariance.shape == (6, 6)
    assert np.all(np.linalg.eigvalsh(est.covariance) >= -1e-12)


def test_calibration_2d3d(rng):
    k = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    t_true = np.asarray(se3.exp_se3(jnp.array([0.2, -0.1, 0.5, 0.05, -0.02, 0.1])))
    pts3d = rng.uniform(-3, 3, (40, 3))
    pts3d[:, 2] += 8.0  # in front of the camera after transform
    cam = pts3d @ t_true[:3, :3].T + t_true[:3, 3]
    uv = np.stack([
        k[0, 0] * cam[:, 0] / cam[:, 2] + k[0, 2],
        k[1, 1] * cam[:, 1] / cam[:, 2] + k[1, 2],
    ], 1) + rng.normal(0, 0.3, (40, 2))
    est = estimate_pose_2d3d(pts3d, uv, k)
    np.testing.assert_allclose(est.transform[:3, 3], t_true[:3, 3], atol=0.05)
    np.testing.assert_allclose(est.transform[:3, :3], t_true[:3, :3], atol=0.01)
    assert est.rmse < 1.0


def test_dlg_extraction(tmp_path, rng):
    # two walls at right angles + noise points at floor level
    t = rng.uniform(0, 10, 400)
    wall1 = np.stack([t, np.zeros_like(t), np.zeros_like(t)], 1)
    wall2 = np.stack([np.zeros_like(t), t, np.zeros_like(t)], 1)
    noise = rng.uniform(-10, 10, (50, 3)) * [1, 1, 0.01]
    pts = np.concatenate([wall1, wall2, noise]) + rng.normal(0, 0.01, (850, 3))
    obj = str(tmp_path / "dlg.obj")
    lines = dlg_segmentation(pts, obj_path=obj, min_inliers=50)
    assert len(lines) >= 2
    lengths = [np.linalg.norm(l.p1 - l.p0) for l in lines[:2]]
    assert all(8.0 < L < 11.0 for L in lengths), lengths
    text = open(obj).read()
    assert text.count("\nl ") >= 2


def test_floor_detection(small_sequence):
    scans, _, _ = small_sequence
    cloud = PointCloud.from_numpy(scans[0], cap=16384)
    result = detect_floor(cloud)
    assert bool(result.found)
    coeffs = np.asarray(result.coeffs)
    # floor normal ~ +z; plane height ~ sensor height below origin
    assert coeffs[2] > 0.99
    np.testing.assert_allclose(-coeffs[3] / coeffs[2], -1.73, atol=0.1)
