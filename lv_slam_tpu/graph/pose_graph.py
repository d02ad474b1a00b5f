"""Batched Levenberg-Marquardt SE(3) pose-graph optimizer.

TPU-native replacement for the reference's g2o backend
(`src/global_graph/graph_slam.cpp`): instead of CHOLMOD sparse normal
equations built edge-by-edge on the CPU, residuals and Jacobians for *all*
factors are computed batched with vmap + autodiff, scatter-assembled into a
dense (6K, 6K) normal matrix, and solved with dense Cholesky — which for
SLAM-scale graphs (K <= a few thousand) runs on the MXU far faster than
pointer-chasing sparse factorization.

Conventions:
- state: one (4,4) pose per node; updates are left-multiplicative se(3)
  perturbations `T <- exp(delta) T`.
- node 0 is gauge-fixed during the solve; like the reference, estimates are
  re-anchored to keyframe 0 afterwards (`global_graph_nodelet.cpp:710-715`),
  so the fixed-node choice is unobservable.
- robust kernels are applied as IRLS weights on chi = sqrt(r^T Omega r)
  (g2o semantics; Huber width from the launch files).
- `optimize()` mirrors `GraphSLAM::optimize` (`graph_slam.cpp:298-331`):
  runs up to `num_iterations` LM steps, returns chi2 before/after.

Capacities are static; invalid nodes/factors are masked out of the normal
equations (their diagonal gets identity so the dense solve stays regular).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lv_slam_tpu.core import se3
from lv_slam_tpu.graph import factors


class PoseGraph(NamedTuple):
    """Fixed-capacity factor-graph arrays (a device pytree)."""

    poses: jax.Array        # (K,4,4)
    node_valid: jax.Array   # (K,) bool
    # --- binary SE3 edges (odometry + loops) ---
    e_i: jax.Array          # (E,) int32
    e_j: jax.Array          # (E,) int32
    e_meas: jax.Array       # (E,4,4)
    e_info: jax.Array       # (E,6,6)
    e_huber: jax.Array      # (E,) huber width, <=0 disables
    e_valid: jax.Array      # (E,) bool
    # --- unary priors: XYZ position (GPS), quaternion orientation (IMU),
    #     direction (gravity), floor plane. Masked by *_valid. ---
    p_node: jax.Array       # (P,) int32
    p_type: jax.Array       # (P,) int32: 0=xyz 1=xy 2=quat 3=vec 4=plane
    p_meas: jax.Array       # (P,8) packed measurement
    p_info: jax.Array       # (P,4,4) information on the (<=4-dim) residual
    p_huber: jax.Array      # (P,)
    p_valid: jax.Array      # (P,) bool

    @property
    def node_cap(self) -> int:
        return self.poses.shape[0]

    @property
    def edge_cap(self) -> int:
        return self.e_i.shape[0]


def empty_graph(node_cap: int = 1024, edge_cap: int = 4096, prior_cap: int = 256) -> PoseGraph:
    """Host-side (numpy) graph arrays: graph *construction* is incremental
    host work (one write per factor); only `optimize_pose_graph` ships the
    arrays to device. Device-side .at[].set per edge would bake each slot
    index into a fresh executable — pathological through a remote TPU link."""
    import numpy as _np

    return PoseGraph(
        poses=_np.tile(_np.eye(4, dtype=_np.float32), (node_cap, 1, 1)),
        node_valid=_np.zeros((node_cap,), bool),
        e_i=_np.zeros((edge_cap,), _np.int32),
        e_j=_np.zeros((edge_cap,), _np.int32),
        e_meas=_np.tile(_np.eye(4, dtype=_np.float32), (edge_cap, 1, 1)),
        e_info=_np.tile(_np.eye(6, dtype=_np.float32), (edge_cap, 1, 1)),
        e_huber=_np.zeros((edge_cap,), _np.float32),
        e_valid=_np.zeros((edge_cap,), bool),
        p_node=_np.zeros((prior_cap,), _np.int32),
        p_type=_np.zeros((prior_cap,), _np.int32),
        p_meas=_np.zeros((prior_cap, 8), _np.float32),
        p_info=_np.tile(_np.eye(4, dtype=_np.float32), (prior_cap, 1, 1)),
        p_huber=_np.zeros((prior_cap,), _np.float32),
        p_valid=_np.zeros((prior_cap,), bool),
    )


# ---------------------------------------------------------------------------
# residuals + Jacobians
# ---------------------------------------------------------------------------


def _edge_res_jac(t_i, t_j, meas):
    """Residual (6,) and Jacobians (6,6),(6,6) w.r.t. left-perturbations."""

    def res(d_i, d_j):
        return factors.se3_edge_residual(
            se3.exp_se3(d_i) @ t_i, se3.exp_se3(d_j) @ t_j, meas
        )

    zero = jnp.zeros(6, t_i.dtype)
    r = res(zero, zero)
    j_i = jax.jacfwd(res, argnums=0)(zero, zero)
    j_j = jax.jacfwd(res, argnums=1)(zero, zero)
    return r, j_i, j_j


def _prior_res_jac(t_i, p_type, p_meas):
    """Unary residual padded to (4,), Jacobian (4,6).

    Branchless (all five types computed, one selected): unary priors are
    cheap, and jnp.where selection is vmap- and shard_map-safe where
    lax.switch trips the varying-axes rules.
    """

    def res(d):
        t = se3.exp_se3(d) @ t_i
        r = jnp.stack(
            [
                jnp.pad(factors.prior_xyz_residual(t, p_meas[:3]), (0, 1)),
                jnp.pad(factors.prior_xy_residual(t, p_meas[:2]), (0, 2)),
                jnp.pad(factors.prior_quat_residual(t, p_meas[:4]), (0, 1)),
                jnp.pad(factors.prior_vec_residual(t, p_meas[:3], p_meas[3:6]), (0, 1)),
                factors.se3_plane_residual(t, p_meas[:4]),
            ]
        )
        onehot = (jnp.arange(5) == p_type).astype(t.dtype)
        return onehot @ r

    zero = jnp.zeros(6, t_i.dtype)
    return res(zero), jax.jacfwd(res)(zero)


# ---------------------------------------------------------------------------
# normal equations
# ---------------------------------------------------------------------------


def _chi2_and_normal(graph: PoseGraph, poses: jax.Array, build: bool):
    k = graph.node_cap
    n = 6 * k

    t_i = poses[graph.e_i]
    t_j = poses[graph.e_j]
    r, j_i, j_j = jax.vmap(_edge_res_jac)(t_i, t_j, graph.e_meas)

    omega_r = jnp.einsum("eab,eb->ea", graph.e_info, r)
    chi2_e = jnp.sum(r * omega_r, axis=1)
    chi = jnp.sqrt(jnp.maximum(chi2_e, 0.0))
    w_rob = jnp.where(
        graph.e_huber > 0, factors.huber_weight(chi, graph.e_huber), 1.0
    )
    w = jnp.where(graph.e_valid, w_rob, 0.0)
    # g2o reports the robustified chi2
    rho = jnp.where(
        graph.e_huber > 0,
        jnp.where(
            chi <= graph.e_huber,
            chi2_e,
            2.0 * graph.e_huber * chi - graph.e_huber**2,
        ),
        chi2_e,
    )
    chi2 = jnp.sum(jnp.where(graph.e_valid, rho, 0.0))

    # priors
    t_p = poses[graph.p_node]
    rp, jp = jax.vmap(_prior_res_jac)(t_p, graph.p_type, graph.p_meas)
    omega_rp = jnp.einsum("pab,pb->pa", graph.p_info, rp)
    chi2_p = jnp.sum(rp * omega_rp, axis=1)
    chi_p = jnp.sqrt(jnp.maximum(chi2_p, 0.0))
    wp_rob = jnp.where(graph.p_huber > 0, factors.huber_weight(chi_p, graph.p_huber), 1.0)
    wp = jnp.where(graph.p_valid, wp_rob, 0.0)
    chi2 = chi2 + jnp.sum(jnp.where(graph.p_valid, chi2_p, 0.0))

    if not build:
        return chi2, None, None

    # --- assemble dense H, b (gauge fix applied separately so sharded
    #     assemblies can psum partial systems first) ---
    j_stack = jnp.concatenate([j_i, j_j], axis=2)          # (E,6,12)
    w_info = w[:, None, None] * graph.e_info               # (E,6,6)
    h_blk = jnp.einsum("era,erc,ecb->eab", j_stack, w_info, j_stack)  # (E,12,12)
    b_blk = jnp.einsum("era,erc,ec->ea", j_stack, w_info, r)          # (E,12)

    idx = jnp.concatenate(
        [graph.e_i[:, None] * 6 + jnp.arange(6), graph.e_j[:, None] * 6 + jnp.arange(6)],
        axis=1,
    )  # (E,12)
    h = jnp.zeros((n, n), poses.dtype)
    h = h.at[idx[:, :, None], idx[:, None, :]].add(h_blk)
    b = jnp.zeros((n,), poses.dtype).at[idx].add(b_blk)

    wp_info = wp[:, None, None] * graph.p_info
    hp_blk = jnp.einsum("pra,prc,pcb->pab", jp, wp_info, jp)  # (P,6,6)
    bp_blk = jnp.einsum("pra,prc,pc->pa", jp, wp_info, rp)
    pidx = graph.p_node[:, None] * 6 + jnp.arange(6)
    h = h.at[pidx[:, :, None], pidx[:, None, :]].add(hp_blk)
    b = b.at[pidx].add(bp_blk)
    return chi2, h, b


def _apply_gauge(h: jax.Array, b: jax.Array, node_valid: jax.Array):
    """Fix node 0 and regularize invalid/unconstrained nodes."""
    k = node_valid.shape[0]
    free = node_valid & (jnp.arange(k) > 0)
    free6 = jnp.repeat(free, 6)
    h = jnp.where(free6[:, None] & free6[None, :], h, 0.0)
    h = h + jnp.diag(jnp.where(free6, 0.0, 1.0))
    b = jnp.where(free6, b, 0.0)
    return h, b


class OptimizeResult(NamedTuple):
    poses: jax.Array
    chi2_before: jax.Array
    chi2_after: jax.Array
    iterations: jax.Array


@functools.partial(jax.jit, static_argnums=(1,))
def optimize_pose_graph(graph: PoseGraph, num_iterations: int = 128) -> OptimizeResult:
    """LM loop; returns re-anchored poses (keyframe 0 at its prior pose)."""

    chi2_0, _, _ = _chi2_and_normal(graph, graph.poses, build=False)

    def cond(state):
        return ~state[-1]

    def body(state):
        poses, lam, chi2, it, _ = state
        _, h, b = _chi2_and_normal(graph, poses, build=True)
        h, b = _apply_gauge(h, b, graph.node_valid)
        damped = h + lam * jnp.diag(jnp.maximum(jnp.diag(h), 1e-6))
        delta = jax.scipy.linalg.solve(damped, -b, assume_a="pos")
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        step = delta.reshape(graph.node_cap, 6)
        new_poses = jax.vmap(lambda d, t: se3.exp_se3(d) @ t)(step, poses)
        new_chi2, _, _ = _chi2_and_normal(graph, new_poses, build=False)
        accept = ok & (new_chi2 <= chi2)
        poses = jnp.where(accept, new_poses, poses)
        chi2_next = jnp.where(accept, new_chi2, chi2)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        it = it + 1
        small = jnp.max(jnp.abs(delta)) < 1e-6
        rel_ok = accept & ((chi2 - chi2_next) < 1e-8 * (chi2 + 1e-12))
        converged = (it >= num_iterations) | small | rel_ok
        return poses, lam, chi2_next, it, converged

    init = (graph.poses, jnp.float32(1e-4), chi2_0, jnp.int32(0), jnp.bool_(False))
    poses, _, chi2_after, it, _ = jax.lax.while_loop(cond, body, init)

    # re-anchor to node 0 (`global_graph_nodelet.cpp:710-715`)
    anchor = graph.poses[0] @ se3.inverse(poses[0])
    poses = jnp.einsum("ij,njk->nik", anchor, poses)
    return OptimizeResult(poses=poses, chi2_before=chi2_0, chi2_after=chi2_after, iterations=it)


# ---------------------------------------------------------------------------
# host-side graph building helpers
# ---------------------------------------------------------------------------


def add_node(graph: PoseGraph, idx: int, pose) -> PoseGraph:
    """In-place host write (graph arrays must be numpy, see empty_graph)."""
    import numpy as _np

    graph.poses[idx] = _np.asarray(pose, _np.float32)
    graph.node_valid[idx] = True
    return graph


def add_se3_edge(graph: PoseGraph, slot: int, i: int, j: int, meas, info, huber: float = 0.0) -> PoseGraph:
    import numpy as _np

    graph.e_i[slot] = i
    graph.e_j[slot] = j
    graph.e_meas[slot] = _np.asarray(meas, _np.float32)
    graph.e_info[slot] = _np.asarray(info, _np.float32)
    graph.e_huber[slot] = huber
    graph.e_valid[slot] = True
    return graph


def add_prior(graph: PoseGraph, slot: int, node: int, p_type: int, meas, info, huber: float = 0.0) -> PoseGraph:
    import numpy as _np

    meas = _np.asarray(meas, _np.float32).reshape(-1)
    info = _np.asarray(info, _np.float32)
    graph.p_node[slot] = node
    graph.p_type[slot] = p_type
    graph.p_meas[slot] = 0.0
    graph.p_meas[slot, : meas.shape[0]] = meas
    graph.p_info[slot] = _np.eye(4, dtype=_np.float32)
    graph.p_info[slot, : info.shape[0], : info.shape[1]] = info
    graph.p_huber[slot] = huber
    graph.p_valid[slot] = True
    return graph


PRIOR_XYZ, PRIOR_XY, PRIOR_QUAT, PRIOR_VEC, PRIOR_PLANE = range(5)
