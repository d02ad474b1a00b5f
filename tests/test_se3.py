import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.core import se3

# Eager dispatch is slow under the axon plugin; jit everything once.
_roundtrip = jax.jit(lambda t: se3.log_se3(se3.exp_se3(t)))
_exp_so3 = jax.jit(se3.exp_so3)
_exp_se3 = jax.jit(se3.exp_se3)
_quat_rt = jax.jit(lambda r: se3.quat_to_matrix(se3.quat_from_matrix(r)))
_compose_inv = jax.jit(lambda t: jnp.einsum("nij,njk->nik", t, se3.inverse(t)))
_rotation_angle = jax.jit(se3.rotation_angle)
_transform_pts = jax.jit(se3.transform_points)


def random_tangents(rng, n, rot_scale=1.0, trans_scale=5.0, max_angle=2.0):
    t = rng.normal(size=(n, 6)).astype(np.float32)
    t[:, :3] *= trans_scale
    t[:, 3:] *= rot_scale
    # log(exp(phi)) wraps for |phi| >= pi, and the float32 log map loses
    # precision approaching pi; SLAM-scale rotations are << 2 rad.
    norms = np.linalg.norm(t[:, 3:], axis=1, keepdims=True)
    t[:, 3:] *= np.minimum(1.0, max_angle / np.maximum(norms, 1e-9))
    return jnp.asarray(t)


def test_exp_log_roundtrip(rng):
    tangents = random_tangents(rng, 64, rot_scale=0.8)
    back = _roundtrip(tangents)
    np.testing.assert_allclose(np.asarray(back), np.asarray(tangents), atol=5e-4)


def test_exp_small_angle(rng):
    tangents = random_tangents(rng, 16, rot_scale=1e-6, trans_scale=1e-5)
    back = _roundtrip(tangents)
    np.testing.assert_allclose(np.asarray(back), np.asarray(tangents), atol=1e-7)


def test_rotation_orthonormal(rng):
    phi = random_tangents(rng, 32, rot_scale=2.0)[:, 3:]
    rot = _exp_so3(phi)
    eye = jnp.einsum("nij,nkj->nik", rot, rot)
    np.testing.assert_allclose(np.asarray(eye), np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    det = np.linalg.det(np.asarray(rot))
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


def test_compose_inverse(rng):
    t = _exp_se3(random_tangents(rng, 8, rot_scale=0.5))
    prod = _compose_inv(t)
    np.testing.assert_allclose(np.asarray(prod), np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)


def test_quat_matrix_roundtrip(rng):
    phi = random_tangents(rng, 64, rot_scale=3.0, max_angle=3.1)[:, 3:]  # near-pi ok
    rot = _exp_so3(phi)
    rot2 = _quat_rt(rot)
    np.testing.assert_allclose(np.asarray(rot2), np.asarray(rot), atol=1e-5)


def test_rotation_angle():
    phi = jnp.array([[0.0, 0.0, 0.3], [0.1, 0.0, 0.0], [0.0, 0.0, 0.0]])
    ang = _rotation_angle(_exp_so3(phi))
    np.testing.assert_allclose(np.asarray(ang), [0.3, 0.1, 0.0], atol=1e-3)


def test_transform_points():
    transform = se3.make_transform(
        _exp_so3(jnp.array([0.0, 0.0, np.pi / 2])), jnp.array([1.0, 0.0, 0.0])
    )
    out = _transform_pts(transform, jnp.array([[1.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(out), [[1.0, 1.0, 0.0]], atol=1e-6)
