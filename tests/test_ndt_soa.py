"""Pins the SoA fast path to the reference-semantics AoS implementation."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.io import synthetic
from lv_slam_tpu.ops.ndt import make_gauss_params, ndt_align, ndt_derivatives
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


@pytest.mark.parametrize("neighborhood,weighted", [("DIRECT1", True), ("DIRECT7", False)])
def test_soa_derivatives_match_aos(setup, neighborhood, weighted):
    vm, source, _ = setup
    gauss = make_gauss_params(1.0)
    offs = neighborhood_offsets(neighborhood)
    t0 = jnp.eye(4).at[0, 3].set(1.2).at[1, 3].set(-0.1)
    s1, g1, h1 = jax.jit(
        lambda T: ndt_derivatives(vm, source.masked_xyz(), source.mask, T, gauss, offs, weighted)
    )(t0)
    soa = to_soa(vm)
    s2, g2, h2 = jax.jit(
        lambda T: ndt_derivatives_soa(soa, source.masked_xyz().T, source.mask, T, gauss, offs, weighted)
    )(t0)
    np.testing.assert_allclose(float(s1), float(s2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-2)
    scale = float(jnp.abs(h1).max())
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=2e-5 * scale)


def test_soa_align_matches_aos(setup):
    vm, source, gt = setup
    guess = jnp.eye(4).at[0, 3].set(1.4)
    kw = dict(resolution=1.0, transformation_epsilon=0.01, max_iterations=64,
              neighborhood="DIRECT1", weighted=True)
    r_aos = jax.jit(functools.partial(ndt_align, **kw))(vm, source, guess)
    r_soa = jax.jit(functools.partial(ndt_align_soa, **kw))(vm, source, guess)
    np.testing.assert_allclose(
        np.asarray(r_aos.transform), np.asarray(r_soa.transform), atol=5e-3
    )
    err = np.linalg.norm(np.asarray(r_soa.transform)[:3, 3] - gt[:3, 3])
    assert err < 0.05, err


def test_two_phase_matches_single_phase(setup):
    vm, source, gt = setup
    guess = jnp.eye(4).at[0, 3].set(1.4)
    kw = dict(resolution=1.0, transformation_epsilon=0.01, max_iterations=64,
              neighborhood="DIRECT1", weighted=True)
    r1 = jax.jit(functools.partial(ndt_align_soa, **kw))(vm, source, guess)
    r2 = jax.jit(functools.partial(ndt_align_soa, coarse_subsample=2, **kw))(vm, source, guess)
    t1, t2 = np.asarray(r1.transform), np.asarray(r2.transform)
    # both land on the same optimum within the eps tolerance
    assert np.linalg.norm(t1[:3, 3] - t2[:3, 3]) < 0.02


def test_utm_projection():
    from lv_slam_tpu.utils.geo import gprmc_to_utm, latlon_to_utm

    # canonical check: equator/central-meridian anchor
    e, n, zone, hemi = latlon_to_utm(0.0, 3.0)
    assert zone == 31 and hemi == "N"
    np.testing.assert_allclose(e, 500000.0, atol=1e-3)
    np.testing.assert_allclose(n, 0.0, atol=1e-3)
    # metric self-consistency at Munich (zone 32U): local scale must match
    # the ellipsoid's meridian/parallel arc lengths x the UTM scale factor
    import math

    e, n, zone, hemi = latlon_to_utm(48.1372, 11.5755)
    assert zone == 32 and hemi == "N"
    e2, _, _, _ = latlon_to_utm(48.1372, 11.5765)
    _, n2, _, _ = latlon_to_utm(48.1382, 11.5755)
    east_per_deg = (e2 - e) * 1000.0
    north_per_deg = (n2 - n) * 1000.0
    np.testing.assert_allclose(
        east_per_deg, math.cos(math.radians(48.1372)) * 111319.49 * 1.00035, rtol=2e-3
    )
    np.testing.assert_allclose(north_per_deg, 111132.95 * 1.00035, rtol=2e-3)
    out = gprmc_to_utm(
        "$GPRMC,123519,A,4807.038,N,01131.000,E,022.4,084.4,230394,003.1,W*6A"
    )
    assert out is not None and 600000 < out[0] < 700000
