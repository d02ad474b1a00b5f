"""Registration-method factory (reference `src/global_graph/registrations.cpp`).

`select_registration_method(params)` returns a uniform callable
`(target_cloud, source_cloud, guess) -> RegistrationResult` for the same
method names the reference accepts: ICP, GICP, GICP_OMP, NDT, NDT_OMP (and
additionally NDT_PCA, the weighted odometry matcher). NDT parameters mirror
the reference's (`ndt_resolution`, `ndt_nn_search_method`;
`ndt_num_threads` has no meaning on TPU — lanes replace threads).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple

import jax

from lv_slam_tpu.core.cloud import PointCloud
from lv_slam_tpu.ops.gicp import gicp_align
from lv_slam_tpu.ops.icp import icp_align
from lv_slam_tpu.ops.ndt import ndt_align
from lv_slam_tpu.ops.nn import fitness_score
from lv_slam_tpu.ops.voxel_map import build_voxel_map


class RegistrationResult(NamedTuple):
    transform: jax.Array
    fitness: jax.Array


@dataclasses.dataclass(frozen=True)
class RegistrationParams:
    registration_method: str = "NDT_OMP"
    ndt_resolution: float = 1.0
    ndt_nn_search_method: str = "DIRECT7"
    transformation_epsilon: float = 0.01
    max_iterations: int = 64
    max_correspondence_distance: float = 2.0
    leaf_cap: int = 16384
    lut_extent: int = 256


def select_registration_method(params: RegistrationParams) -> Callable:
    method = params.registration_method.upper()

    if method in ("NDT", "NDT_OMP", "NDT_PCA"):
        weighted = method == "NDT_PCA"

        @jax.jit
        def run_ndt(target: PointCloud, source: PointCloud, guess):
            vm = build_voxel_map(
                target,
                params.ndt_resolution,
                leaf_cap=params.leaf_cap,
                lut_extent=params.lut_extent,
                weighted=weighted,
            )
            res = ndt_align(
                vm,
                source,
                guess,
                resolution=params.ndt_resolution,
                transformation_epsilon=params.transformation_epsilon,
                max_iterations=params.max_iterations,
                neighborhood=params.ndt_nn_search_method,
                weighted=weighted,
            )
            fit = fitness_score(target, source, res.transform)
            return RegistrationResult(res.transform, fit)

        return run_ndt

    if method == "ICP":

        @jax.jit
        def run_icp(target: PointCloud, source: PointCloud, guess):
            res = icp_align(
                target,
                source,
                guess,
                max_correspondence_distance=params.max_correspondence_distance,
                max_iterations=params.max_iterations,
            )
            return RegistrationResult(res.transform, res.fitness)

        return run_icp

    if method in ("GICP", "GICP_OMP"):

        @jax.jit
        def run_gicp(target: PointCloud, source: PointCloud, guess):
            res = gicp_align(
                target,
                source,
                guess,
                max_correspondence_distance=params.max_correspondence_distance,
                max_iterations=min(params.max_iterations, 20),
            )
            return RegistrationResult(res.transform, res.fitness)

        return run_gicp

    raise ValueError(f"unknown registration method {params.registration_method!r}")
