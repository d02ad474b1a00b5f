"""Multi-chip scaling: device meshes + sharded registration.

The reference's concurrency is OpenMP threads inside one process
(`ndt_omp_impl2.hpp:206-302`: per-thread score/gradient/Hessian accumulators
merged after the parallel-for). The TPU-native equivalents:

- **point sharding** ("tensor parallel" over the point axis): each chip holds
  a replica of the voxel map and a shard of the scan; the fused derivative
  pass reduces its shard locally and a `psum` over ICI merges the 1+6+36
  accumulator — the exact analogue of the per-thread accumulator merge, with
  XLA collectives instead of the OpenMP join.
- **pair batching** ("data parallel" over registrations): independent
  registrations (loop-closure candidate verification, multi-sequence
  evaluation) run one-per-mesh-row with `vmap` inside `shard_map`.

A 2D mesh ("batch", "point") composes both: B pairs, each point-sharded
across the row's chips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lv_slam_tpu.core import se3
from lv_slam_tpu.ops.ndt import GaussParams, make_gauss_params
from lv_slam_tpu.ops.voxel_map import VoxelMap, neighborhood_offsets


def make_mesh(n_batch: int = 1, n_point: Optional[int] = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_point is None:
        n_point = len(devices) // n_batch
    grid = np.asarray(devices[: n_batch * n_point]).reshape(n_batch, n_point)
    return Mesh(grid, ("batch", "point"))


def ndt_derivatives_sharded(
    mesh: Mesh,
    vmap_: VoxelMap,
    src_xyz: jax.Array,
    src_mask: jax.Array,
    transform: jax.Array,
    gauss: GaussParams,
    offsets: jax.Array,
    weighted: bool,
):
    """Point-sharded derivative pass: map replicated, points split on "point",
    accumulators merged with psum over ICI. Shapes: src_xyz (N,3). Uses the
    same packed-gather SoA kernel as the single-chip hot path."""
    from lv_slam_tpu.ops.ndt_soa import ndt_derivatives_soa, to_soa

    def local(vm, xyz, mask, T):
        s, g, h = ndt_derivatives_soa(to_soa(vm), xyz.T, mask, T, gauss, offsets, weighted)
        return (
            jax.lax.psum(s, "point"),
            jax.lax.psum(g, "point"),
            jax.lax.psum(h, "point"),
        )

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("point"), P("point"), P()),
        out_specs=(P(), P(), P()),
    )
    return fn(vmap_, src_xyz, src_mask, transform)


def ndt_align_sharded(
    mesh: Mesh,
    vmaps: VoxelMap,
    src_xyz: jax.Array,
    src_mask: jax.Array,
    guesses: jax.Array,
    *,
    resolution: float,
    outlier_ratio: float = 0.55,
    step_size: float = 0.1,
    transformation_epsilon: float = 0.01,
    max_iterations: int = 35,
    neighborhood: str = "DIRECT7",
    weighted: bool = False,
    coarse_subsample: int = 1,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched + point-sharded NDT registration.

    vmaps: stacked VoxelMap pytree with leading batch axis B.
    src_xyz: (B, N, 3); src_mask: (B, N); guesses: (B, 4, 4).
    Returns (transforms (B,4,4), scores (B,), iterations (B,)).

    Each mesh "batch" row registers B/n_batch pairs; within a row the scan is
    sharded over "point" chips and the Newton loop runs replicated off psum'd
    accumulators (every chip computes the same 6x6 solve — cheaper than
    communicating it).

    Algorithmically identical to the single-chip `ops/ndt_soa.ndt_align_soa`:
    the same packed-gather SoA derivative pass, the same monotone-score
    guarded `_newton_loop`, and the same optional coarse-subsample approach
    phase (each shard strides its local points) — asserted by the
    sharded-vs-SoA parity test in `tests/test_parallel.py`.
    """
    from lv_slam_tpu.ops.ndt_soa import _newton_loop, ndt_derivatives_soa, to_soa

    gauss = make_gauss_params(resolution, outlier_ratio)
    offsets = neighborhood_offsets(neighborhood)
    eps = jnp.float32(transformation_epsilon)
    step_max = jnp.float32(step_size)

    def one_pair(vm, xyz, mask, guess):
        soa = to_soa(vm)
        xs = xyz.T  # (3, N_local)

        def derivs(T):
            s, g, h = ndt_derivatives_soa(soa, xs, mask, T, gauss, offsets, weighted)
            return (
                jax.lax.psum(s, "point"),
                jax.lax.psum(g, "point"),
                jax.lax.psum(h, "point"),
            )

        start = guess
        coarse_iters = jnp.int32(0)
        if coarse_subsample > 1:
            n = mask.shape[0]
            stride_mask = mask & (jnp.arange(n) % coarse_subsample == 0)
            xs_c = xs[:, ::coarse_subsample]
            mask_c = stride_mask[::coarse_subsample]

            def derivs_coarse(T):
                s, g, h = ndt_derivatives_soa(soa, xs_c, mask_c, T, gauss, offsets, weighted)
                return (
                    jax.lax.psum(s, "point"),
                    jax.lax.psum(g, "point"),
                    jax.lax.psum(h, "point"),
                )

            start, _, _, _, _, coarse_iters, _ = _newton_loop(
                derivs_coarse, guess, eps * 2.0, step_max, max_iterations
            )

        T, score, _, _, _, it, _ = _newton_loop(derivs, start, eps, step_max, max_iterations)
        return T, score, it + coarse_iters

    def local(vms, xyzs, masks, gs):
        # local leading batch axis = B / n_batch; vmap the pair routine.
        # psum inside vmap reduces over "point" only — safe and supported.
        return jax.vmap(one_pair)(vms, xyzs, masks, gs)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("batch"), P("batch", "point"), P("batch", "point"), P("batch")),
        out_specs=(P("batch"), P("batch"), P("batch")),
    )
    return fn(vmaps, src_xyz, src_mask, guesses)


def optimize_pose_graph_sharded(
    mesh: Mesh,
    graph,
    num_iterations: int = 64,
):
    """Edge/prior-sharded pose-graph LM.

    Factors (edges + priors) are sharded across every device of the mesh;
    each shard assembles its partial dense normal system, a `psum` over ICI
    merges them (the block-sparse J^T J assembly as one collective), and the
    LM loop runs replicated (every chip performs the identical 6K x 6K
    Cholesky — cheaper than distributing a solve this small). Node state is
    replicated. Results match `optimize_pose_graph` to float tolerance.
    """
    from lv_slam_tpu.graph import pose_graph as pg

    axes = mesh.axis_names

    def local(g: pg.PoseGraph):
        from lv_slam_tpu.graph import factors

        k = g.poses.shape[0]
        chi2_0, _, _ = pg._chi2_and_normal(g, g.poses, g.planes, build=False)
        for ax in axes:
            chi2_0 = jax.lax.psum(chi2_0, ax)

        def system(poses, planes):
            chi2, h, b = pg._chi2_and_normal(g, poses, planes, build=True)
            for ax in axes:
                chi2 = jax.lax.psum(chi2, ax)
                h = jax.lax.psum(h, ax)
                b = jax.lax.psum(b, ax)
            return chi2, *pg._apply_gauge(h, b, g)

        def chi2_of(poses, planes):
            chi2, _, _ = pg._chi2_and_normal(g, poses, planes, build=False)
            for ax in axes:
                chi2 = jax.lax.psum(chi2, ax)
            return chi2

        def cond(state):
            return ~state[-1]

        def body(state):
            poses, planes, lam, chi2, it, _ = state
            _, h, b = system(poses, planes)
            damped = h + lam * jnp.diag(jnp.maximum(jnp.diag(h), 1e-6))
            delta = jax.scipy.linalg.solve(damped, -b, assume_a="pos")
            ok = jnp.all(jnp.isfinite(delta))
            delta = jnp.where(ok, delta, 0.0)
            step = delta[: 6 * k].reshape(k, 6)
            new_poses = jax.vmap(lambda d, t: se3.exp_se3(d) @ t)(step, poses)
            step_pl = delta[6 * k :].reshape(g.planes.shape[0], 3)
            new_planes = jax.vmap(factors.plane_oplus)(planes, step_pl)
            new_chi2 = chi2_of(new_poses, new_planes)
            accept = ok & (new_chi2 <= chi2)
            poses = jnp.where(accept, new_poses, poses)
            planes = jnp.where(accept, new_planes, planes)
            chi2_next = jnp.where(accept, new_chi2, chi2)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
            it = it + 1
            small = jnp.max(jnp.abs(delta)) < 1e-6
            rel_ok = accept & ((chi2 - chi2_next) < 1e-8 * (chi2 + 1e-12))
            converged = (it >= num_iterations) | small | rel_ok
            return poses, planes, lam, chi2_next, it, converged

        init = (g.poses, g.planes, jnp.float32(1e-4), chi2_0, jnp.int32(0), jnp.bool_(False))
        poses, planes, _, chi2_after, it, _ = jax.lax.while_loop(cond, body, init)
        anchor = g.poses[0] @ se3.inverse(poses[0])
        poses = jnp.einsum("ij,njk->nik", anchor, poses)
        return poses, chi2_0, chi2_after, it, planes

    factor_spec = P(axes)  # shard factor arrays over all mesh axes jointly
    in_specs = graph._replace(
        poses=P(), node_valid=P(), node_fixed=P(),
        planes=P(), plane_valid=P(), plane_fixed=P(),
        e_i=factor_spec, e_j=factor_spec, e_meas=factor_spec,
        e_info=factor_spec, e_huber=factor_spec, e_valid=factor_spec,
        p_node=factor_spec, p_type=factor_spec, p_meas=factor_spec,
        p_info=factor_spec, p_huber=factor_spec, p_valid=factor_spec,
        sp_i=factor_spec, sp_plane=factor_spec, sp_meas=factor_spec,
        sp_info=factor_spec, sp_huber=factor_spec, sp_valid=factor_spec,
        q_i=factor_spec, q_j=factor_spec, q_type=factor_spec,
        q_meas=factor_spec, q_info=factor_spec, q_huber=factor_spec,
        q_valid=factor_spec,
    )
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(in_specs,), out_specs=(P(), P(), P(), P(), P())
    )
    poses, chi2_before, chi2_after, it, planes = fn(graph)
    from lv_slam_tpu.graph.pose_graph import OptimizeResult

    return OptimizeResult(
        poses=poses, chi2_before=chi2_before, chi2_after=chi2_after,
        iterations=it, planes=planes,
    )


def stack_maps(maps: list) -> VoxelMap:
    """Stack VoxelMap pytrees along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *maps)


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
