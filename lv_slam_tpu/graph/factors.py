"""Pose-graph factor residuals (the reference's custom g2o edge set).

Every residual follows g2o's error conventions so information matrices and
robust-kernel widths carry over unchanged:

- SE3-SE3 (`g2o::EdgeSE3`, used for odometry + loop edges,
  `graph_slam.cpp:136-147`): error = toVectorMQT(Z^-1 (Ti^-1 Tj)) =
  [translation, quaternion-xyz (w>=0)] of the measurement-relative delta.
  For small errors q_xyz ~ phi/2.
- prior XYZ (`include/g2o/edge_se3_priorxyz.hpp:35-70`): error = t_i - meas.
- prior XY (`include/g2o/edge_se3_priorxy.hpp`): error = t_i.xy - meas.
- prior quaternion (`include/g2o/edge_se3_priorquat.hpp`): error =
  (q_i^-1 * q_meas).xyz with sign fixed to the hemisphere of w.
- prior direction (`include/g2o/edge_se3_priorvec.hpp`, gravity): error =
  R_i^T * v_world_meas - v_local_meas.
- SE3-plane (`include/g2o/edge_se3_plane.hpp:36-73`, floor constraint):
  error between the global floor plane transformed into the sensor frame and
  the locally measured plane coefficients, in (azimuth-elevation, distance)
  minimal form; here reduced to the (normal residual, distance residual)
  4-vector against the fixed z=0 floor, matching the floor-detection usage.

All functions are per-factor and vmap-friendly; Jacobians come from autodiff
of these residuals w.r.t. left-multiplicative se(3) perturbations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lv_slam_tpu.core import se3


def se3_edge_residual(t_i: jax.Array, t_j: jax.Array, meas: jax.Array) -> jax.Array:
    """(6,) g2o EdgeSE3 error: delta = meas^-1 (Ti^-1 Tj) -> [t, 2*q_xyz]...

    g2o's toVectorMQT uses the unit quaternion's xyz (w normalized >= 0); we
    scale by 2 so the rotation block approximates the rotation vector and the
    reference's information weights (sigma_q) keep their published meaning.
    g2o itself leaves the factor at 1 (q_xyz ~ phi/2); scaling by 2 only
    rescales sigma_q, and parity tests pin the constant-information case where
    both conventions coincide after re-anchoring.
    """
    delta = se3.inverse(meas) @ se3.inverse(t_i) @ t_j
    q = se3.quat_from_matrix(delta[:3, :3])
    return jnp.concatenate([delta[:3, 3], 2.0 * q[1:]])


def prior_xyz_residual(t_i: jax.Array, meas_xyz: jax.Array) -> jax.Array:
    return t_i[:3, 3] - meas_xyz


def prior_xy_residual(t_i: jax.Array, meas_xy: jax.Array) -> jax.Array:
    return t_i[:2, 3] - meas_xy


def prior_quat_residual(t_i: jax.Array, meas_quat_wxyz: jax.Array) -> jax.Array:
    q_i = se3.quat_from_matrix(t_i[:3, :3])
    # q_err = q_i^-1 * q_meas
    w1, v1 = q_i[0], -q_i[1:]
    w2, v2 = meas_quat_wxyz[0], meas_quat_wxyz[1:]
    w = w1 * w2 - jnp.dot(v1, v2)
    v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
    v = v * jnp.where(w < 0, -1.0, 1.0)
    return 2.0 * v


def prior_vec_residual(t_i: jax.Array, meas_world: jax.Array, meas_local: jax.Array) -> jax.Array:
    """Gravity-direction style prior: rotate the world vector into the sensor
    frame and compare with the locally measured one."""
    return t_i[:3, :3].T @ meas_world - meas_local


def se3_plane_residual(t_i: jax.Array, meas_coeffs: jax.Array) -> jax.Array:
    """(4,) floor-plane factor: global plane z=0 (n=[0,0,1], d=0) transformed
    into the sensor frame vs measured local coefficients [nx, ny, nz, d]."""
    rot = t_i[:3, :3]
    t = t_i[:3, 3]
    n_local = rot.T @ jnp.array([0.0, 0.0, 1.0], dtype=t_i.dtype)
    d_local = t[2]  # distance of sensor origin above the plane
    n_meas = meas_coeffs[:3]
    n_meas = n_meas / jnp.maximum(jnp.linalg.norm(n_meas), 1e-9)
    sign = jnp.where(jnp.dot(n_local, n_meas) < 0, -1.0, 1.0)
    return jnp.concatenate([n_local - sign * n_meas, (d_local - sign * meas_coeffs[3])[None]])


def huber_weight(chi: jax.Array, delta: jax.Array) -> jax.Array:
    """Huber IRLS weight on chi = sqrt(r^T Omega r): 1 inside, delta/chi outside
    (g2o RobustKernelHuber semantics; widths from the launch, e.g. 1.0)."""
    return jnp.where(chi <= delta, 1.0, delta / jnp.maximum(chi, 1e-12))


def robust_weight(kind: str, chi: jax.Array, delta: float) -> jax.Array:
    """IRLS weights for the robust kernels the reference exposes
    (`launch/dlo_lfa_ggo_kitti.launch:129` lists them; only Huber is used and
    serialized, `robust_kernel_io.cpp:13-19`)."""
    kind = (kind or "NONE").upper()
    d = jnp.float32(delta)
    safe = jnp.maximum(chi, 1e-12)
    if kind == "NONE":
        return jnp.ones_like(chi)
    if kind == "HUBER":
        return huber_weight(chi, d)
    if kind == "CAUCHY":
        return 1.0 / (1.0 + (safe / d) ** 2)
    if kind in ("PSEUDOHUBER", "PSEUDO_HUBER"):
        return 1.0 / jnp.sqrt(1.0 + (safe / d) ** 2)
    if kind == "FAIR":
        return 1.0 / (1.0 + safe / d)
    if kind in ("GEMANMCCLURE", "GM"):
        return 1.0 / (1.0 + (safe / d) ** 2) ** 2
    if kind == "WELSCH":
        return jnp.exp(-((safe / d) ** 2))
    if kind == "TUKEY":
        return jnp.where(safe <= d, (1.0 - (safe / d) ** 2) ** 2, 0.0)
    if kind == "SATURATED":
        return jnp.minimum(1.0, (d / safe) ** 2)
    if kind == "DCS":
        return jnp.minimum(1.0, 2.0 * d / (d + safe**2))
    raise ValueError(f"unknown robust kernel {kind!r}")
