import jax
import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.ops.linalg3 import eigh3x3

_eigh3 = jax.jit(eigh3x3)


def _check(mats, atol=1e-4):
    evals, evecs = _eigh3(jnp.asarray(mats, jnp.float32))
    evals, evecs = np.asarray(evals, np.float64), np.asarray(evecs, np.float64)
    # ascending
    assert (np.diff(evals, axis=-1) >= -1e-4).all()
    # reconstruction A = V diag(w) V^T
    recon = np.einsum("...ij,...j,...kj->...ik", evecs, evals, evecs)
    scale = np.abs(mats).max(axis=(-1, -2), keepdims=True) + 1.0
    np.testing.assert_allclose(recon, mats, atol=atol * scale.max())
    # orthonormal columns
    eye = np.einsum("...ji,...jk->...ik", evecs, evecs)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)


def test_random_spd(rng):
    m = rng.normal(size=(4096, 3, 3))
    mats = np.einsum("nij,nkj->nik", m, m) + 0.01 * np.eye(3)
    _check(mats)


def test_matches_lapack(rng):
    m = rng.normal(size=(256, 3, 3))
    mats = (np.einsum("nij,nkj->nik", m, m)).astype(np.float32)
    evals, _ = _eigh3(jnp.asarray(mats))
    ref = np.linalg.eigvalsh(mats.astype(np.float64))
    np.testing.assert_allclose(np.asarray(evals), ref, rtol=1e-3, atol=1e-3)


def test_degenerate_cases():
    mats = np.stack([
        np.eye(3),                                  # isotropic
        np.diag([1.0, 1.0, 5.0]),                   # repeated small pair
        np.diag([2.0, 7.0, 7.0]),                   # repeated large pair
        np.zeros((3, 3)),                           # zero
        np.diag([1e-8, 1e-8, 1e-8]),                # tiny isotropic
        np.diag([3.0, 3.0, 3.0]),                   # scaled identity
    ])
    _check(mats, atol=1e-5)


def test_planar_voxel_shape():
    # typical NDT planar leaf: two large, one tiny eigenvalue
    cov = np.diag([0.08, 0.05, 1e-5]).astype(np.float32)
    rot = np.linalg.qr(np.random.default_rng(0).normal(size=(3, 3)))[0]
    mats = rot @ cov @ rot.T
    evals, evecs = _eigh3(jnp.asarray(mats[None]))
    np.testing.assert_allclose(np.sort(np.asarray(evals)[0]), [1e-5, 0.05, 0.08], rtol=1e-2, atol=1e-6)
    # the smallest-eigenvalue direction (normal) must match
    normal = np.asarray(evecs)[0][:, 0]
    expected = rot[:, 2]
    assert abs(abs(normal @ expected) - 1.0) < 1e-3
