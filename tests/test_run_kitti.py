"""End-to-end test of the KITTI batch entrypoint on a fabricated mini
dataset (synthetic scans written as velodyne .bin + calib.txt)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from lv_slam_tpu.io import kitti, synthetic


@pytest.fixture()
def mini_kitti(tmp_path):
    seq_dir = tmp_path / "sequences" / "04"
    velo = seq_dir / "velodyne"
    velo.mkdir(parents=True)
    # figure8 + moderate density: a straight corridor at very low ray count
    # is longitudinally degenerate for any scan matcher
    scans, poses, world = synthetic.make_sequence(
        6, seed=17, trajectory="figure8", step=1.0, n_rings=32, n_azimuth=450
    )
    for i, s in enumerate(scans):
        s.astype(np.float32).tofile(velo / f"{i:06d}.bin")
    # camera frames: the driver must pick up image_2/ and run ORB per
    # keyframe (`global_graph_nodelet.cpp:110-119,212-236`)
    from PIL import Image

    img_dir = seq_dir / "image_2"
    img_dir.mkdir()
    for i in range(len(scans)):
        img = synthetic.render_camera_image(world, poses[i], seed=17)
        Image.fromarray(img).save(img_dir / f"{i:06d}.png")
    tr = np.array([[0, -1, 0, 0.0], [0, 0, -1, 0.0], [1, 0, 0, 0.0]], float)
    with open(seq_dir / "calib.txt", "w") as f:
        for i in range(4):
            f.write(f"P{i}: 1 0 0 0 0 1 0 0 0 0 1 0\n")
        f.write("Tr: " + " ".join(str(v) for v in tr.reshape(-1)) + "\n")
    return str(tmp_path), poses


def test_run_kitti_script(mini_kitti, tmp_path):
    dataset, gt = mini_kitti
    out = str(tmp_path / "out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lv_slam_jax")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, "scripts/run_kitti.py", "--dataset", dataset,
         "--seq", "04", "--output", out, "--no-lfa", "--optimize-every", "4"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=500,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "camera frames" in result.stdout  # image_2/ picked up -> ORB ran
    pose_file = os.path.join(out, "KITTI_04_odom.txt")
    assert os.path.exists(pose_file)
    est_cam = kitti.read_pose_file(pose_file)
    assert est_cam.shape[0] == 6
    # undo the camera conjugation and compare against ground truth
    tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
    est_velo = np.einsum("ij,njk,kl->nil", np.linalg.inv(tr), est_cam, tr)
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    err = np.linalg.norm(est_velo[-1][:3, 3] - gt_rel[5][:3, 3])
    assert err < 0.3, err
    assert os.path.exists(os.path.join(out, "dump", "graph.g2o"))
    assert os.path.exists(os.path.join(out, "map.pcd"))


def test_run_kitti_fused_chunked(mini_kitti, tmp_path):
    """--fused: chunked lax.scan pipeline with state threaded between
    chunks; chunk=4 over 6 scans exercises the continuation programs."""
    dataset, gt = mini_kitti
    out = str(tmp_path / "out_fused")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/lv_slam_jax")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    result = subprocess.run(
        [sys.executable, "scripts/run_kitti.py", "--dataset", dataset,
         "--seq", "04", "--output", out, "--no-lfa", "--fused", "--chunk", "4",
         "--optimize-every", "4"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "camera frames" in result.stdout
    est_cam = kitti.read_pose_file(os.path.join(out, "KITTI_04_odom.txt"))
    assert est_cam.shape[0] == 6
    tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
    est_velo = np.einsum("ij,njk,kl->nil", np.linalg.inv(tr), est_cam, tr)
    gt_rel = np.einsum("ij,njk->nik", np.linalg.inv(gt[0]), gt)
    err = np.linalg.norm(est_velo[-1][:3, 3] - gt_rel[5][:3, 3])
    assert err < 0.3, err
    assert os.path.exists(os.path.join(out, "dump", "graph.g2o"))
