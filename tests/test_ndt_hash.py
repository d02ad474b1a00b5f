"""Pins the single-gather hash-table NDT path to the LUT/SoA implementation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.ops.ndt import make_gauss_params
from lv_slam_tpu.ops.ndt_hash import ndt_align_hash, ndt_derivatives_hash, to_hash
from lv_slam_tpu.ops.ndt_soa import ndt_align_soa, ndt_derivatives_soa, to_soa
from lv_slam_tpu.ops.voxel_map import build_voxel_map, neighborhood_offsets


@pytest.fixture(scope="module")
def setup():
    scans, poses, _ = synthetic.make_sequence(
        2, seed=41, trajectory="figure8", step=1.0, n_rings=32, n_azimuth=450
    )
    target = PointCloud.from_numpy(scans[0], cap=16384)
    source = PointCloud.from_numpy(scans[1], cap=16384)
    vm = jax.jit(
        functools.partial(build_voxel_map, resolution=1.0, leaf_cap=16384, lut_extent=256, weighted=True)
    )(target)
    return vm, source, np.linalg.inv(poses[0]) @ poses[1]


def test_hash_build_is_near_lossless(setup):
    vm, _, _ = setup
    hmap = jax.jit(to_hash)(vm)
    n_leaves = int(vm.n_leaves)
    n_dropped = int(hmap.n_dropped)
    # bucket-pair overflow must lose at most a fraction of a percent
    assert n_dropped <= max(2, n_leaves // 200), (n_dropped, n_leaves)
    # every stored key decodes to a real in-extent voxel
    table = np.asarray(hmap.table)
    k0 = table[:, 0].view(np.int32)
    k1 = table[:, 16].view(np.int32)
    stored = np.concatenate([k0[k0 >= 0], k1[k1 >= 0]])
    assert stored.shape[0] == n_leaves - n_dropped
    assert np.unique(stored).shape[0] == stored.shape[0]  # no duplicate keys


@pytest.mark.parametrize("neighborhood,weighted", [("DIRECT1", True), ("DIRECT7", False)])
def test_hash_derivatives_match_soa(setup, neighborhood, weighted):
    vm, source, _ = setup
    gauss = make_gauss_params(1.0)
    offs = neighborhood_offsets(neighborhood)
    t0 = jnp.eye(4).at[0, 3].set(1.2).at[1, 3].set(-0.1)
    soa = to_soa(vm)
    s1, g1, h1 = jax.jit(
        lambda T: ndt_derivatives_soa(soa, source.masked_xyz().T, source.mask, T, gauss, offs, weighted)
    )(t0)
    hmap = jax.jit(to_hash)(vm)
    s2, g2, h2 = jax.jit(
        lambda T: ndt_derivatives_hash(hmap, source.masked_xyz().T, source.mask, T, gauss, offs, weighted)
    )(t0)
    # identical up to the (near-empty) dropped-leaf set
    drop_frac = float(hmap.n_dropped) / max(int(vm.n_leaves), 1)
    tol = max(1e-4, 3.0 * drop_frac)
    np.testing.assert_allclose(float(s1), float(s2), rtol=tol)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=tol, atol=tol * float(jnp.abs(g1).max()))
    scale = float(jnp.abs(h1).max())
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=max(2e-5, drop_frac) * scale)


def test_hash_align_matches_soa(setup):
    vm, source, gt = setup
    guess = jnp.eye(4).at[0, 3].set(1.4)
    kw = dict(resolution=1.0, transformation_epsilon=0.01, max_iterations=64,
              neighborhood="DIRECT1", weighted=True)
    r_soa = jax.jit(functools.partial(ndt_align_soa, **kw))(vm, source, guess)
    r_hash = jax.jit(functools.partial(ndt_align_hash, **kw))(vm, source, guess)
    np.testing.assert_allclose(
        np.asarray(r_soa.transform), np.asarray(r_hash.transform), atol=5e-3
    )
    err = np.linalg.norm(np.asarray(r_hash.transform)[:3, 3] - gt[:3, 3])
    assert err < 0.05, err


def test_hash_align_two_phase(setup):
    vm, source, _ = setup
    guess = jnp.eye(4).at[0, 3].set(1.4)
    kw = dict(resolution=1.0, transformation_epsilon=0.01, max_iterations=64,
              neighborhood="DIRECT1", weighted=True)
    r1 = jax.jit(functools.partial(ndt_align_hash, **kw))(vm, source, guess)
    r2 = jax.jit(functools.partial(ndt_align_hash, coarse_subsample=2, **kw))(vm, source, guess)
    t1, t2 = np.asarray(r1.transform), np.asarray(r2.transform)
    assert np.linalg.norm(t1[:3, 3] - t2[:3, 3]) < 0.02
