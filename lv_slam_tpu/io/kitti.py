"""KITTI odometry dataset IO: velodyne scans, calibration, pose files.

Pose files use the KITTI 12-value row format written with `%le` formatting,
matching the reference's odometry tap (`scan_matching_odom_nodelet.cpp:156-166`)
and the backend's kf/wf dumps (`global_graph_nodelet.cpp:1089-1148`). Odometry
poses are conjugated into the camera frame with the calibration `Tr`
(velo->cam): `pose_cam = Tr @ pose_velo @ Tr^-1`.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def read_velodyne_bin(path: str) -> np.ndarray:
    """KITTI velodyne scan -> (N,4) float32 [x y z intensity]."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def read_calib(path: str) -> Dict[str, np.ndarray]:
    """Parse a KITTI calib.txt into name -> (3,4) matrices (P0..P3, Tr).

    The reference reads only the 5th line (`Tr`) by skipping four lines
    (`scan_matching_odom_nodelet.cpp:80-86`); we parse all entries keyed by
    label for the same effect.
    """
    out: Dict[str, np.ndarray] = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            name, vals = line.split(":", 1)
            arr = np.fromstring(vals, sep=" ", dtype=np.float64)
            if arr.size == 12:
                out[name.strip()] = arr.reshape(3, 4)
    return out


def tr_to_matrix(tr: Optional[np.ndarray]) -> np.ndarray:
    """(3,4) Tr row block -> (4,4) homogeneous velo->cam transform."""
    m = np.eye(4, dtype=np.float64)
    if tr is not None:
        m[:3, :4] = tr
    return m


def write_pose_file(path: str, poses: np.ndarray) -> None:
    """Write (N,4,4) poses as KITTI rows with `%le` formatting."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for pose in poses:
            row = pose[:3, :4].reshape(-1)
            f.write(" ".join(f"{v:e}" for v in row) + "\n")


def read_pose_file(path: str) -> np.ndarray:
    """Read a KITTI pose file -> (N,4,4)."""
    rows = np.loadtxt(path, dtype=np.float64).reshape(-1, 3, 4)
    out = np.tile(np.eye(4, dtype=np.float64), (rows.shape[0], 1, 1))
    out[:, :3, :4] = rows
    return out


def velo_to_cam_poses(poses_velo: np.ndarray, tr: np.ndarray) -> np.ndarray:
    """pose_cam = Tr @ pose_velo @ Tr^-1 (scan_matching_odom_nodelet.cpp:156-160)."""
    tr_inv = np.linalg.inv(tr)
    return np.einsum("ij,njk,kl->nil", tr, poses_velo, tr_inv)


def list_sequence_scans(dataset_dir: str, seq: str) -> List[str]:
    d = os.path.join(dataset_dir, "sequences", seq, "velodyne")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".bin")
    )


def list_sequence_images(dataset_dir: str, seq: str, camera: str = "image_2") -> List[str]:
    """Per-scan camera frames (the reference's kittiHelper publishes image_2,
    ApproximateTime-synced with the cloud, `global_graph_nodelet.cpp:110-119`).
    Returns [] when the sequence ships without images."""
    d = os.path.join(dataset_dir, "sequences", seq, camera)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith((".png", ".jpg"))
    )


def read_image_gray(path: str) -> np.ndarray:
    """(H,W) uint8 grayscale (ORB input; the reference converts via cv_bridge
    mono8, `global_graph_nodelet.cpp:212-236`)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), dtype=np.uint8)


# ---------------------------------------------------------------------------
# KITTI odometry-devkit relative-error metric (evaluate_odometry_seq)
# ---------------------------------------------------------------------------

_LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)


def _trajectory_distances(poses: np.ndarray) -> np.ndarray:
    d = np.zeros(len(poses))
    steps = np.linalg.norm(poses[1:, :3, 3] - poses[:-1, :3, 3], axis=1)
    d[1:] = np.cumsum(steps)
    return d


def kitti_seq_error(gt: np.ndarray, est: np.ndarray, step: int = 10, lengths=None):
    """(t_err, r_err) averaged over all subsequences of the devkit lengths —
    the metric behind the README's seq-04 numbers (`README.md:135-138`).
    `lengths` overrides the devkit's 100-800 m segments (short synthetic
    benchmark runs need proportionally shorter segments)."""
    assert len(gt) == len(est)
    dist = _trajectory_distances(gt)
    errs_t, errs_r = [], []
    for first in range(0, len(gt), step):
        for seg_len in lengths or _LENGTHS:
            target = dist[first] + seg_len
            last = int(np.searchsorted(dist, target))
            if last >= len(gt):
                continue
            pose_delta_gt = np.linalg.inv(gt[first]) @ gt[last]
            pose_delta_est = np.linalg.inv(est[first]) @ est[last]
            pose_error = np.linalg.inv(pose_delta_est) @ pose_delta_gt
            r_err = np.arccos(
                np.clip((np.trace(pose_error[:3, :3]) - 1.0) / 2.0, -1.0, 1.0)
            )
            t_err = np.linalg.norm(pose_error[:3, 3])
            errs_t.append(t_err / seg_len)
            errs_r.append(r_err / seg_len)
    if not errs_t:
        return float("nan"), float("nan")
    return float(np.mean(errs_t)), float(np.mean(errs_r))
