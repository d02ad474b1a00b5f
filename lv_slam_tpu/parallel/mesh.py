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
from lv_slam_tpu.ops.ndt import GaussParams, make_gauss_params, ndt_derivatives
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
    accumulators merged with psum over ICI. Shapes: src_xyz (N,3)."""

    def local(vm, xyz, mask, T):
        s, g, h = ndt_derivatives(vm, xyz, mask, T, gauss, offsets, weighted)
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
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched + point-sharded NDT registration.

    vmaps: stacked VoxelMap pytree with leading batch axis B.
    src_xyz: (B, N, 3); src_mask: (B, N); guesses: (B, 4, 4).
    Returns (transforms (B,4,4), scores (B,), iterations (B,)).

    Each mesh "batch" row registers B/n_batch pairs; within a row the scan is
    sharded over "point" chips and the Newton loop runs replicated off psum'd
    accumulators (every chip computes the same 6x6 solve — cheaper than
    communicating it).
    """
    gauss = make_gauss_params(resolution, outlier_ratio)
    offsets = neighborhood_offsets(neighborhood)
    eps = jnp.float32(transformation_epsilon)
    step_min = eps / 2.0
    step_max = jnp.float32(step_size)

    def one_pair(vm, xyz, mask, guess):
        def derivs(T):
            s, g, h = ndt_derivatives(vm, xyz, mask, T, gauss, offsets, weighted)
            return (
                jax.lax.psum(s, "point"),
                jax.lax.psum(g, "point"),
                jax.lax.psum(h, "point"),
            )

        score0, grad0, hess0 = derivs(guess)

        def cond(state):
            return ~state[-1]

        def body(state):
            T, score, grad, hess, it, _ = state
            ridge = 1e-6 * jnp.trace(jnp.abs(hess)) / 6.0 + 1e-12
            delta = jnp.linalg.solve(hess + ridge * jnp.eye(6, dtype=hess.dtype), -grad)
            norm = jnp.linalg.norm(delta)
            bad = (norm == 0.0) | ~jnp.isfinite(norm)
            direction = delta / jnp.where(bad, 1.0, norm)
            dphi0 = -jnp.dot(grad, direction)
            direction = jnp.where(dphi0 > 0, -direction, direction)
            alpha = jnp.clip(norm, step_min, step_max)
            new_T = se3.exp_se3(alpha * direction) @ T
            new_score, new_grad, new_hess = derivs(new_T)
            keep = ~bad
            T = jnp.where(keep, new_T, T)
            score = jnp.where(keep, new_score, score)
            grad = jnp.where(keep, new_grad, grad)
            hess = jnp.where(keep, new_hess, hess)
            it = it + 1
            converged = bad | (it > max_iterations) | (alpha < eps)
            return T, score, grad, hess, it, converged

        # derive the iteration/convergence inits from score0 so the carry is
        # "varying" over the mesh batch axis (shard_map vma rule)
        it0 = (score0 * 0.0).astype(jnp.int32)
        conv0 = jnp.isnan(score0)
        init = (guess, score0, grad0, hess0, it0, conv0)
        T, score, _, _, it, _ = jax.lax.while_loop(cond, body, init)
        return T, score, it

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
        chi2_0, _, _ = pg._chi2_and_normal(g, g.poses, build=False)
        for ax in axes:
            chi2_0 = jax.lax.psum(chi2_0, ax)

        def system(poses):
            chi2, h, b = pg._chi2_and_normal(g, poses, build=True)
            for ax in axes:
                chi2 = jax.lax.psum(chi2, ax)
                h = jax.lax.psum(h, ax)
                b = jax.lax.psum(b, ax)
            return chi2, *pg._apply_gauge(h, b, g.node_valid)

        def chi2_of(poses):
            chi2, _, _ = pg._chi2_and_normal(g, poses, build=False)
            for ax in axes:
                chi2 = jax.lax.psum(chi2, ax)
            return chi2

        def cond(state):
            return ~state[-1]

        def body(state):
            poses, lam, chi2, it, _ = state
            _, h, b = system(poses)
            damped = h + lam * jnp.diag(jnp.maximum(jnp.diag(h), 1e-6))
            delta = jax.scipy.linalg.solve(damped, -b, assume_a="pos")
            ok = jnp.all(jnp.isfinite(delta))
            delta = jnp.where(ok, delta, 0.0)
            step = delta.reshape(g.poses.shape[0], 6)
            new_poses = jax.vmap(lambda d, t: se3.exp_se3(d) @ t)(step, poses)
            new_chi2 = chi2_of(new_poses)
            accept = ok & (new_chi2 <= chi2)
            poses = jnp.where(accept, new_poses, poses)
            chi2_next = jnp.where(accept, new_chi2, chi2)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
            it = it + 1
            small = jnp.max(jnp.abs(delta)) < 1e-6
            rel_ok = accept & ((chi2 - chi2_next) < 1e-8 * (chi2 + 1e-12))
            converged = (it >= num_iterations) | small | rel_ok
            return poses, lam, chi2_next, it, converged

        init = (g.poses, jnp.float32(1e-4), chi2_0, jnp.int32(0), jnp.bool_(False))
        poses, _, chi2_after, it, _ = jax.lax.while_loop(cond, body, init)
        anchor = g.poses[0] @ se3.inverse(poses[0])
        poses = jnp.einsum("ij,njk->nik", anchor, poses)
        return poses, chi2_0, chi2_after, it

    factor_spec = P(axes)  # shard factor arrays over all mesh axes jointly
    in_specs = graph._replace(
        poses=P(), node_valid=P(),
        e_i=factor_spec, e_j=factor_spec, e_meas=factor_spec,
        e_info=factor_spec, e_huber=factor_spec, e_valid=factor_spec,
        p_node=factor_spec, p_type=factor_spec, p_meas=factor_spec,
        p_info=factor_spec, p_huber=factor_spec, p_valid=factor_spec,
    )
    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(in_specs,), out_specs=(P(), P(), P(), P())
    )
    poses, chi2_before, chi2_after, it = fn(graph)
    from lv_slam_tpu.graph.pose_graph import OptimizeResult

    return OptimizeResult(
        poses=poses, chi2_before=chi2_before, chi2_after=chi2_after, iterations=it
    )


def stack_maps(maps: list) -> VoxelMap:
    """Stack VoxelMap pytrees along a new leading batch axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *maps)


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
