"""SE(3)/SO(3) Lie-group operations in JAX.

Sophus semantics (the reference's pose parameterization, `ndt_omp_impl2.hpp:119-166`):
the se(3) tangent vector is ``[rho, phi]`` with translation part first and
rotation (angle-axis) part last; ``exp([rho, phi]) = (exp(phi), V(phi) rho)``.

Everything is float32, batched-friendly (all functions vmap cleanly), and
Taylor-guarded near the identity so gradients and small-angle KITTI motion are
well conditioned in single precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_SMALL_ANGLE = 1e-4


def skew(v: jax.Array) -> jax.Array:
    """[...,3] -> [...,3,3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def _sinc_factors(theta_sq: jax.Array):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), Taylor-guarded.

    The sqrt argument is guarded *before* the sqrt so autodiff never sees
    d(sqrt)/dx at 0 (which would leak NaN through jnp.where).
    """
    small = theta_sq < _SMALL_ANGLE * _SMALL_ANGLE
    safe_tsq = jnp.where(small, 1.0, theta_sq)
    safe_t = jnp.sqrt(safe_tsq)
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe_t) / safe_t)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_t)) / safe_tsq)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (safe_t - jnp.sin(safe_t)) / (safe_tsq * safe_t))
    return a, b, c


def exp_so3(phi: jax.Array) -> jax.Array:
    """Angle-axis [...,3] -> rotation matrix [...,3,3] (Rodrigues)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sinc_factors(theta_sq)
    k = skew(phi)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), k.shape)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def log_so3(rot: jax.Array) -> jax.Array:
    """Rotation matrix [...,3,3] -> angle-axis [...,3].

    Uses the quaternion route for stability near pi.
    """
    q = quat_from_matrix(rot)
    return quat_log(q)


def exp_se3(tangent: jax.Array) -> jax.Array:
    """se(3) tangent [...,6] = [rho, phi] -> homogeneous transform [...,4,4]."""
    rho, phi = tangent[..., :3], tangent[..., 3:]
    theta_sq = jnp.sum(phi * phi, axis=-1)
    a, b, c = _sinc_factors(theta_sq)
    k = skew(phi)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), k.shape)
    rot = eye + a[..., None, None] * k + b[..., None, None] * k2
    v = eye + b[..., None, None] * k + c[..., None, None] * k2
    t = jnp.einsum("...ij,...j->...i", v, rho)
    return make_transform(rot, t)


def log_se3(transform: jax.Array) -> jax.Array:
    """Homogeneous transform [...,4,4] -> se(3) tangent [...,6] = [rho, phi]."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    phi = log_so3(rot)
    theta_sq = jnp.sum(phi * phi, axis=-1)
    a, b, _ = _sinc_factors(theta_sq)
    k = skew(phi)
    # V^-1 = I - k/2 + (1/theta^2)(1 - A/(2B)) k^2
    small = theta_sq < _SMALL_ANGLE * _SMALL_ANGLE
    safe_tsq = jnp.where(small, 1.0, theta_sq)
    coef = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, (1.0 - a / (2.0 * b)) / safe_tsq)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=transform.dtype), k.shape)
    v_inv = eye - 0.5 * k + coef[..., None, None] * (k @ k)
    rho = jnp.einsum("...ij,...j->...i", v_inv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def make_transform(rot: jax.Array, t: jax.Array) -> jax.Array:
    """([...,3,3], [...,3]) -> [...,4,4]."""
    batch = jnp.broadcast_shapes(rot.shape[:-2], t.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(transform: jax.Array) -> jax.Array:
    """Rigid-transform inverse [...,4,4]."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    return make_transform(rot_t, -jnp.einsum("...ij,...j->...i", rot_t, t))


def transform_points(transform: jax.Array, points: jax.Array) -> jax.Array:
    """Apply [...,4,4] to points [...,N,3]."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return points @ jnp.swapaxes(rot, -1, -2) + t[..., None, :]


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def orthonormalize(transform: jax.Array) -> jax.Array:
    """Project the rotation block back onto SO(3) (via quaternion).

    Chained float32 compositions accumulate orthonormality defect
    multiplicatively; feedback loops that compose their own outputs (the
    odometry warm start) must re-project each cycle or the defect grows
    geometrically (~3x/step through guess = tf * pre^-1 * tf).
    """
    rot = quat_to_matrix(quat_from_matrix(transform[..., :3, :3]))
    return make_transform(rot, transform[..., :3, 3])


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------


def quat_from_matrix(rot: jax.Array) -> jax.Array:
    """Rotation matrix [...,3,3] -> unit quaternion [...,4] (w,x,y,z), w >= 0.

    Shepperd's branch-free formulation: build all four candidate quaternions
    scaled by 4*|component|^2 and pick the largest — stable for every rotation
    including angle ~ pi, and vmap/jit friendly.
    """
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each valid when its leading squared term is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    mags = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [...,4 cand,4 comp]
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion [...,4] (w,x,y,z) -> rotation matrix [...,3,3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_log(q: jax.Array) -> jax.Array:
    """Unit quaternion [...,4] -> angle-axis [...,3]."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    vec = q[..., 1:]
    vec_norm = jnp.linalg.norm(vec, axis=-1)
    angle = 2.0 * jnp.arctan2(vec_norm, w)
    small = vec_norm < _EPS
    scale = jnp.where(small, 2.0 / jnp.where(jnp.abs(w) < _EPS, 1.0, w), angle / jnp.where(small, 1.0, vec_norm))
    return vec * scale[..., None]


def rotation_angle(rot: jax.Array) -> jax.Array:
    """Rotation matrix [...,3,3] -> rotation angle [0, pi].

    Equals the reference keyframe-gate quantity ``2*acos(q.w)``
    (`scan_matching_odom_nodelet.cpp:238`) for w >= 0.
    """
    q = quat_from_matrix(rot)
    return 2.0 * jnp.arccos(jnp.clip(q[..., 0], -1.0, 1.0))
