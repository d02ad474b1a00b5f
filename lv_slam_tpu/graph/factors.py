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


# ---------------------------------------------------------------------------
# plane vertices (g2o::VertexPlane) + plane factor residuals
# ---------------------------------------------------------------------------
#
# Plane state is the (4,) coefficient vector [nx, ny, nz, d] of the plane
# {x : n.x + d = 0} with |n| = 1 (the reference's floor node is
# add_plane_node([0,0,1,0]), `global_graph_nodelet.cpp:601-604`). g2o's
# Plane3D minimal parameterization is (azimuth, elevation, distance); its
# azimuth/elevation chart is singular exactly at the floor normal +z, so we
# use a smooth tangent basis at the current normal instead: the update and
# the minimal difference agree with g2o's to first order up to an in-plane
# rotation of the two angular components — which leaves chi2 unchanged for
# the isotropic information matrices the reference uses everywhere
# (`global_graph_nodelet.cpp:610`). Our basis is singular at n ~ +-x instead.


def plane_normalize(p: jax.Array) -> jax.Array:
    """Scale (4,) coeffs so the normal is unit length."""
    return p / jnp.maximum(jnp.linalg.norm(p[:3]), 1e-9)


def plane_tangent_basis(n: jax.Array):
    """Two unit vectors spanning the tangent space of the unit normal n,
    smooth everywhere except n ~ +-x (floor normals live near +z)."""
    b1 = jnp.array([1.0, 0.0, 0.0], n.dtype) - n * n[0]
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), 1e-9)
    b2 = jnp.cross(n, b1)
    return b1, b2


def plane_oplus(p: jax.Array, delta: jax.Array) -> jax.Array:
    """3-dof tangent update of a plane (g2o Plane3D::oplus equivalent):
    delta = (two normal-rotation components, distance increment)."""
    p = plane_normalize(p)
    n = p[:3]
    b1, b2 = plane_tangent_basis(n)
    n_new = n + delta[0] * b1 + delta[1] * b2
    n_new = n_new / jnp.maximum(jnp.linalg.norm(n_new), 1e-9)
    return jnp.concatenate([n_new, (p[3] + delta[2])[None]])


def plane_ominus(p_a: jax.Array, p_b: jax.Array) -> jax.Array:
    """(3,) minimal difference a (-) b (g2o Plane3D::ominus equivalent):
    angular components of b's normal in a's tangent basis + distance delta."""
    a = plane_normalize(p_a)
    b = plane_normalize(p_b)
    b1, b2 = plane_tangent_basis(a[:3])
    return jnp.stack([jnp.dot(b[:3], b1), jnp.dot(b[:3], b2), a[3] - b[3]])


def plane_transform(t_inv_of: jax.Array, p: jax.Array) -> jax.Array:
    """Plane p expressed in the frame of pose T (i.e. T^-1 * plane): for
    x_world = T x_local, n_local = R^T n and d_local = d + n . t."""
    n = p[:3]
    return jnp.concatenate(
        [t_inv_of[:3, :3].T @ n, (p[3] + jnp.dot(n, t_inv_of[:3, 3]))[None]]
    )


def se3_plane_shared_residual(t_i: jax.Array, plane: jax.Array, meas: jax.Array) -> jax.Array:
    """(3,) `g2o::EdgeSE3Plane` error (`include/g2o/edge_se3_plane.hpp:40-47`):
    the shared plane vertex transformed into the keyframe's frame, ominus the
    locally measured coefficients."""
    local = plane_transform(t_i, plane)
    return plane_ominus(local, meas)


def plane_identity_residual(p1: jax.Array, p2: jax.Array, meas4: jax.Array) -> jax.Array:
    """(4,) `EdgePlaneIdentity` (`include/g2o/edge_plane_identity.hpp:47-60`):
    (p2 - p1) - meas with p2 sign-aligned to p1."""
    a = plane_normalize(p1)
    b = plane_normalize(p2)
    b = b * jnp.where(jnp.dot(a, b) < 0, -1.0, 1.0)
    return (b - a) - meas4


def plane_parallel_residual(p1: jax.Array, p2: jax.Array, meas3: jax.Array) -> jax.Array:
    """(3,) `EdgePlaneParallel` (`edge_plane_parallel.hpp:44-56`):
    (n2 - n1) - meas with n2 sign-aligned to n1."""
    n1 = plane_normalize(p1)[:3]
    n2 = plane_normalize(p2)[:3]
    n2 = n2 * jnp.where(jnp.dot(n1, n2) < 0, -1.0, 1.0)
    return (n2 - n1) - meas3


def plane_perpendicular_residual(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """(1,) `EdgePlanePerpendicular` (`edge_plane_parallel.hpp:105-114`):
    the normals' dot product (the reference ignores its own measurement)."""
    n1 = plane_normalize(p1)[:3]
    n2 = plane_normalize(p2)[:3]
    return jnp.dot(n1, n2)[None]


def plane_prior_normal_residual(p: jax.Array, meas3: jax.Array) -> jax.Array:
    """(3,) `EdgePlanePriorNormal` (`edge_plane_prior.hpp:40-49`):
    n - meas with n sign-aligned to the measurement."""
    n = plane_normalize(p)[:3]
    n = n * jnp.where(jnp.dot(n, meas3) < 0, -1.0, 1.0)
    return n - meas3


def plane_prior_distance_residual(p: jax.Array, meas_d: jax.Array) -> jax.Array:
    """(1,) `EdgePlanePriorDistance` (`edge_plane_prior.hpp:79-82`):
    meas - distance."""
    return (meas_d - plane_normalize(p)[3])[None]


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
