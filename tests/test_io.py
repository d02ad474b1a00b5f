import numpy as np

from lv_slam_tpu.io import kitti, pcd


def test_pcd_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(777, 4)).astype(np.float32)
    p = str(tmp_path / "c.pcd")
    pcd.write_pcd(p, pts)
    out = pcd.read_pcd(p)
    np.testing.assert_array_equal(out, pts)
    # ascii variant
    p2 = str(tmp_path / "c2.pcd")
    pcd.write_pcd(p2, pts[:50, :3], binary=False)
    out2 = pcd.read_pcd(p2)
    np.testing.assert_allclose(out2, pts[:50, :3], atol=1e-5)


def test_pose_file_roundtrip(tmp_path, rng):
    from lv_slam_tpu.core import se3
    import jax.numpy as jnp

    t = rng.normal(size=(12, 6)).astype(np.float32) * 0.3
    poses = np.asarray(se3.exp_se3(jnp.asarray(t)), np.float64)
    p = str(tmp_path / "poses.txt")
    kitti.write_pose_file(p, poses)
    out = kitti.read_pose_file(p)
    np.testing.assert_allclose(out, poses, atol=1e-5)


def test_calib_parse_and_conjugation(tmp_path):
    tr = np.array([
        [0.0, -1.0, 0.0, 0.1],
        [0.0, 0.0, -1.0, -0.05],
        [1.0, 0.0, 0.0, 0.2],
    ])
    lines = ["P0: " + " ".join(["1 0 0 0 0 1 0 0 0 0 1 0"])] * 4
    calib_path = str(tmp_path / "calib.txt")
    with open(calib_path, "w") as f:
        for i, l in enumerate(lines):
            f.write(f"P{i}: 1 0 0 0 0 1 0 0 0 0 1 0\n")
        f.write("Tr: " + " ".join(str(v) for v in tr.reshape(-1)) + "\n")
    calib = kitti.read_calib(calib_path)
    np.testing.assert_allclose(calib["Tr"], tr)
    m = kitti.tr_to_matrix(calib["Tr"])
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    cam = kitti.velo_to_cam_poses(pose[None], m)[0]
    # conjugation preserves rigid structure
    np.testing.assert_allclose(cam[:3, :3] @ cam[:3, :3].T, np.eye(3), atol=1e-12)
    back = np.linalg.inv(m) @ cam @ m
    np.testing.assert_allclose(back, pose, atol=1e-12)


def test_devkit_error_zero_for_perfect(rng):
    from lv_slam_tpu.io.synthetic import figure8_trajectory

    gt = figure8_trajectory(1200, step=1.0).astype(np.float64)
    t_err, r_err = kitti.kitti_seq_error(gt, gt)
    assert t_err < 1e-12 and r_err < 1e-12
    # a constant-offset estimate has zero *relative* error as well
    off = np.eye(4)
    off[:3, 3] = [5.0, -2.0, 0.0]
    est = np.einsum("ij,njk->nik", off, gt)
    t_err2, _ = kitti.kitti_seq_error(gt, est)
    assert t_err2 < 1e-9


def test_angle_calibration_rotates_up(rng):
    import jax.numpy as jnp

    from lv_slam_tpu.core.cloud import PointCloud
    from lv_slam_tpu.ops.prefilter import vertical_angle_calibration

    pts = np.array([[10.0, 0.0, 0.0], [0.0, 10.0, -1.0]], np.float32)
    cloud = PointCloud.from_numpy(pts, cap=4)
    out = vertical_angle_calibration(cloud, 0.11)
    moved = np.asarray(out.xyz)[:2]
    # range preserved, elevation increased by 0.11 deg
    np.testing.assert_allclose(
        np.linalg.norm(moved, axis=1), np.linalg.norm(pts, axis=1), rtol=1e-5
    )
    elev_before = np.arcsin(pts[:, 2] / np.linalg.norm(pts, axis=1))
    elev_after = np.arcsin(moved[:, 2] / np.linalg.norm(moved, axis=1))
    np.testing.assert_allclose(
        np.rad2deg(elev_after - elev_before), [0.11, 0.11], atol=1e-3
    )


def test_render_camera_image_no_invalid_cast():
    """Points at/behind the camera plane must not flow NaN/inf into the
    int32 pixel cast (regression: io/synthetic.py emitted a RuntimeWarning
    per render; an undefined cast is a wrong-but-plausible-pixel hazard)."""
    import warnings

    from lv_slam_tpu.io import synthetic

    world = synthetic.make_world(seed=5)
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 1.0]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        img = synthetic.render_camera_image(world, pose, seed=5)
    assert img.dtype == np.uint8 and img.shape == (128, 256)
    assert img.max() > img.min()  # something visible rendered
