"""Extrinsic calibration tools.

Rebuilds of the reference's offline research executables:

- `estimate_pose_3d3d`: LRF extrinsics from 3D-3D control points —
  closed-form Umeyama followed by robust Gauss-Newton refinement with a 6x6
  covariance estimate and held-out check-point residuals
  (`test/pose_estimation_ceres.cpp:29-565`, SVD-ICP init + Ceres refine).
- `estimate_pose_2d3d`: LiDAR->camera extrinsics from 2D-3D correspondences —
  DLT/EPnP-style initialization + reprojection Gauss-Newton with covariance
  (`test/pose_estimation_2d3d_l2v_ceres.cpp:44-384`, solvePnP init +
  AngleAxis reprojection cost).

Autodiff Jacobians; numpy/JAX hybrid (these are offline tools, not hot path).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.core import se3


class PoseEstimate(NamedTuple):
    transform: np.ndarray        # (4,4) source -> target
    covariance: np.ndarray       # (6,6) of the se(3) parameters
    rmse: float
    check_rmse: Optional[float]  # held-out residual, if check points given


def umeyama(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Closed-form rigid alignment (no scale): dst ~ R @ src + t."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    h = (src - mu_s).T @ (dst - mu_d)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    rot = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    t = mu_d - rot @ mu_s
    out = np.eye(4)
    out[:3, :3] = rot
    out[:3, 3] = t
    return out


def _gn_refine(residual_fn, t0: np.ndarray, iters: int = 20):
    """Generic GN on left-perturbed SE(3) with autodiff; returns (T, cov)."""
    transform = jnp.asarray(t0, jnp.float32)

    def res(delta, t):
        return residual_fn(se3.exp_se3(delta) @ t)

    jac_fn = jax.jit(jax.jacfwd(res, argnums=0))
    res_fn = jax.jit(res)
    zero = jnp.zeros(6, jnp.float32)
    for _ in range(iters):
        r = res_fn(zero, transform)
        j = jac_fn(zero, transform).reshape(-1, 6)
        r = r.reshape(-1)
        h = j.T @ j
        g = j.T @ r
        delta = jnp.linalg.solve(h + 1e-9 * jnp.eye(6), -g)
        if not bool(jnp.all(jnp.isfinite(delta))):
            break
        transform = se3.exp_se3(delta) @ transform
        if float(jnp.linalg.norm(delta)) < 1e-10:
            break
    # covariance = sigma^2 (J^T J)^-1 with sigma^2 = r^T r / (m - 6)
    r = np.asarray(res_fn(zero, transform)).reshape(-1)
    j = np.asarray(jac_fn(zero, transform)).reshape(-1, 6)
    dof = max(r.size - 6, 1)
    sigma2 = float(r @ r) / dof
    cov = sigma2 * np.linalg.inv(j.T @ j + 1e-12 * np.eye(6))
    return np.asarray(transform, np.float64), cov, float(np.sqrt((r**2).mean()))


def estimate_pose_3d3d(
    src: np.ndarray,
    dst: np.ndarray,
    check_src: Optional[np.ndarray] = None,
    check_dst: Optional[np.ndarray] = None,
) -> PoseEstimate:
    """3D-3D control-point calibration: Umeyama init + GN refinement."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    t0 = umeyama(src, dst)
    src_j = jnp.asarray(src, jnp.float32)
    dst_j = jnp.asarray(dst, jnp.float32)

    def residual(t):
        return se3.transform_points(t, src_j) - dst_j

    transform, cov, rmse = _gn_refine(residual, t0)
    check = None
    if check_src is not None and check_dst is not None:
        moved = (np.asarray(check_src) @ transform[:3, :3].T) + transform[:3, 3]
        check = float(np.sqrt(((moved - np.asarray(check_dst)) ** 2).sum(1).mean()))
    return PoseEstimate(transform, cov, rmse, check)


def _dlt_init(points_3d: np.ndarray, points_2d: np.ndarray, k: np.ndarray) -> np.ndarray:
    """Direct linear transform initialization of [R|t] (normalized points)."""
    pts_n = np.linalg.solve(k, np.concatenate([points_2d, np.ones((len(points_2d), 1))], 1).T).T
    a = []
    for (x, y, z), (u, v, _) in zip(points_3d, pts_n):
        a.append([x, y, z, 1, 0, 0, 0, 0, -u * x, -u * y, -u * z, -u])
        a.append([0, 0, 0, 0, x, y, z, 1, -v * x, -v * y, -v * z, -v])
    _, _, vt = np.linalg.svd(np.asarray(a))
    p = vt[-1].reshape(3, 4)
    # extract rigid part: orthogonalize R, fix scale/sign
    r_raw = p[:, :3]
    u, s, vt2 = np.linalg.svd(r_raw)
    scale = s.mean()
    rot = u @ vt2
    if np.linalg.det(rot) < 0:
        rot, scale = -rot, -scale
    t = p[:, 3] / scale
    out = np.eye(4)
    out[:3, :3] = rot
    out[:3, 3] = t
    # cheirality: points must be in front of the camera
    depths = (points_3d @ rot.T + t)[:, 2]
    if np.median(depths) < 0:
        out[:3, :3] = -rot  # 180-deg ambiguity fallback
        out[:3, 3] = -t
    return out


def estimate_pose_2d3d(
    points_3d: np.ndarray,
    points_2d: np.ndarray,
    camera_matrix: np.ndarray,
) -> PoseEstimate:
    """LiDAR->camera extrinsics from 2D-3D correspondences (the "l2v" tool):
    DLT init + reprojection Gauss-Newton."""
    points_3d = np.asarray(points_3d, np.float64)
    points_2d = np.asarray(points_2d, np.float64)
    k = np.asarray(camera_matrix, np.float64)
    t0 = _dlt_init(points_3d, points_2d, k)

    p3 = jnp.asarray(points_3d, jnp.float32)
    p2 = jnp.asarray(points_2d, jnp.float32)
    kj = jnp.asarray(k, jnp.float32)

    def residual(t):
        cam = se3.transform_points(t, p3)
        z = jnp.maximum(cam[:, 2], 1e-6)
        u = kj[0, 0] * cam[:, 0] / z + kj[0, 2]
        v = kj[1, 1] * cam[:, 1] / z + kj[1, 2]
        return jnp.stack([u, v], 1) - p2

    transform, cov, rmse = _gn_refine(residual, t0, iters=30)
    return PoseEstimate(transform, cov, rmse, None)
