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
    # --- SE3 node gauge flags (anchor nodes are fixed; node 0 is always
    #     gauge-fixed on top of this, `_apply_gauge`) ---
    node_fixed: jax.Array   # (K,) bool
    # --- plane vertices (g2o::VertexPlane; `graph_slam.cpp:116-124`) ---
    planes: jax.Array       # (Q,4) [nx,ny,nz,d], n.x + d = 0, |n| = 1
    plane_valid: jax.Array  # (Q,) bool
    plane_fixed: jax.Array  # (Q,) bool (the floor node is fixed, :601-604)
    # --- SE3<->plane edges (g2o::EdgeSE3Plane, 3-dim error) ---
    sp_i: jax.Array         # (S,) int32 SE3 node
    sp_plane: jax.Array     # (S,) int32 plane node
    sp_meas: jax.Array      # (S,4) measured local plane coeffs
    sp_info: jax.Array      # (S,3,3)
    sp_huber: jax.Array     # (S,)
    sp_valid: jax.Array     # (S,) bool
    # --- plane-plane + plane-prior edges, typed like the unary priors:
    #     0=identity(4) 1=parallel(3) 2=perpendicular(1)
    #     3=prior_normal(3) 4=prior_distance(1) ---
    q_i: jax.Array          # (R,) int32 plane node
    q_j: jax.Array          # (R,) int32 plane node (== q_i for priors)
    q_type: jax.Array       # (R,) int32
    q_meas: jax.Array       # (R,4)
    q_info: jax.Array       # (R,4,4)
    q_huber: jax.Array      # (R,)
    q_valid: jax.Array      # (R,) bool

    @property
    def node_cap(self) -> int:
        return self.poses.shape[0]

    @property
    def edge_cap(self) -> int:
        return self.e_i.shape[0]

    @property
    def plane_cap(self) -> int:
        return self.planes.shape[0]


def empty_graph(
    node_cap: int = 1024,
    edge_cap: int = 4096,
    prior_cap: int = 256,
    plane_cap: int = 8,
    sp_cap: int = 64,
    q_cap: int = 16,
) -> PoseGraph:
    """Host-side (numpy) graph arrays: graph *construction* is incremental
    host work (one write per factor); only `optimize_pose_graph` ships the
    arrays to device. Device-side .at[].set per edge would bake each slot
    index into a fresh executable — pathological through a remote TPU link."""
    import numpy as _np

    default_plane = _np.zeros((plane_cap, 4), _np.float32)
    default_plane[:, 2] = 1.0  # z=0 floor, the only plane the flagship uses
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
        node_fixed=_np.zeros((node_cap,), bool),
        planes=default_plane,
        plane_valid=_np.zeros((plane_cap,), bool),
        plane_fixed=_np.zeros((plane_cap,), bool),
        sp_i=_np.zeros((sp_cap,), _np.int32),
        sp_plane=_np.zeros((sp_cap,), _np.int32),
        sp_meas=default_plane[:1].repeat(sp_cap, axis=0).copy(),
        sp_info=_np.tile(_np.eye(3, dtype=_np.float32), (sp_cap, 1, 1)),
        sp_huber=_np.zeros((sp_cap,), _np.float32),
        sp_valid=_np.zeros((sp_cap,), bool),
        q_i=_np.zeros((q_cap,), _np.int32),
        q_j=_np.zeros((q_cap,), _np.int32),
        q_type=_np.zeros((q_cap,), _np.int32),
        q_meas=_np.zeros((q_cap, 4), _np.float32),
        q_info=_np.tile(_np.eye(4, dtype=_np.float32), (q_cap, 1, 1)),
        q_huber=_np.zeros((q_cap,), _np.float32),
        q_valid=_np.zeros((q_cap,), bool),
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


def _sp_res_jac(t_i, plane, meas):
    """EdgeSE3Plane residual (3,) + Jacobians (3,6) se3 / (3,3) plane."""

    def res(d_t, d_p):
        return factors.se3_plane_shared_residual(
            se3.exp_se3(d_t) @ t_i, factors.plane_oplus(plane, d_p), meas
        )

    z6 = jnp.zeros(6, t_i.dtype)
    z3 = jnp.zeros(3, t_i.dtype)
    r = res(z6, z3)
    j_t = jax.jacfwd(res, argnums=0)(z6, z3)
    j_p = jax.jacfwd(res, argnums=1)(z6, z3)
    return r, j_t, j_p


def _q_res_jac(p1, p2, q_type, meas):
    """Typed plane-plane / plane-prior residual padded to (4,) + Jacobians
    (4,3),(4,3). Branchless for the same vmap/shard_map reasons as priors."""

    def res(d1, d2):
        a = factors.plane_oplus(p1, d1)
        b = factors.plane_oplus(p2, d2)
        r = jnp.stack(
            [
                factors.plane_identity_residual(a, b, meas),
                jnp.pad(factors.plane_parallel_residual(a, b, meas[:3]), (0, 1)),
                jnp.pad(factors.plane_perpendicular_residual(a, b), (0, 3)),
                jnp.pad(factors.plane_prior_normal_residual(a, meas[:3]), (0, 1)),
                jnp.pad(factors.plane_prior_distance_residual(a, meas[0]), (0, 3)),
            ]
        )
        onehot = (jnp.arange(5) == q_type).astype(p1.dtype)
        return onehot @ r

    z3 = jnp.zeros(3, p1.dtype)
    r = res(z3, z3)
    j1 = jax.jacfwd(res, argnums=0)(z3, z3)
    j2 = jax.jacfwd(res, argnums=1)(z3, z3)
    return r, j1, j2


# ---------------------------------------------------------------------------
# normal equations
# ---------------------------------------------------------------------------


def _chi2_and_normal(graph: PoseGraph, poses: jax.Array, planes: jax.Array, build: bool):
    """chi2 (+ dense normal system when build=True) over the state
    [6K se(3) dofs | 3Q plane tangent dofs]."""
    k = graph.node_cap
    qn = graph.plane_cap
    n = 6 * k + 3 * qn

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

    # SE3<->plane edges (shared floor vertex etc.)
    t_sp = poses[graph.sp_i]
    pl_sp = planes[graph.sp_plane]
    rs, js_t, js_p = jax.vmap(_sp_res_jac)(t_sp, pl_sp, graph.sp_meas)
    omega_rs = jnp.einsum("sab,sb->sa", graph.sp_info, rs)
    chi2_s = jnp.sum(rs * omega_rs, axis=1)
    chi_s = jnp.sqrt(jnp.maximum(chi2_s, 0.0))
    ws_rob = jnp.where(graph.sp_huber > 0, factors.huber_weight(chi_s, graph.sp_huber), 1.0)
    ws = jnp.where(graph.sp_valid, ws_rob, 0.0)
    chi2 = chi2 + jnp.sum(jnp.where(graph.sp_valid, chi2_s, 0.0))

    # plane-plane / plane-prior edges
    q1 = planes[graph.q_i]
    q2 = planes[graph.q_j]
    rq, jq1, jq2 = jax.vmap(_q_res_jac)(q1, q2, graph.q_type, graph.q_meas)
    omega_rq = jnp.einsum("qab,qb->qa", graph.q_info, rq)
    chi2_q = jnp.sum(rq * omega_rq, axis=1)
    chi_q = jnp.sqrt(jnp.maximum(chi2_q, 0.0))
    wq_rob = jnp.where(graph.q_huber > 0, factors.huber_weight(chi_q, graph.q_huber), 1.0)
    wq = jnp.where(graph.q_valid, wq_rob, 0.0)
    chi2 = chi2 + jnp.sum(jnp.where(graph.q_valid, chi2_q, 0.0))

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

    # SE3<->plane blocks: couple se3 dofs [6i..6i+6) with plane dofs
    # [6K + 3p .. 6K + 3p + 3)
    js = jnp.concatenate([js_t, js_p], axis=2)               # (S,3,9)
    ws_info = ws[:, None, None] * graph.sp_info
    hs_blk = jnp.einsum("sra,src,scb->sab", js, ws_info, js)  # (S,9,9)
    bs_blk = jnp.einsum("sra,src,sc->sa", js, ws_info, rs)
    sidx = jnp.concatenate(
        [
            graph.sp_i[:, None] * 6 + jnp.arange(6),
            6 * k + graph.sp_plane[:, None] * 3 + jnp.arange(3),
        ],
        axis=1,
    )  # (S,9)
    h = h.at[sidx[:, :, None], sidx[:, None, :]].add(hs_blk)
    b = b.at[sidx].add(bs_blk)

    # plane-plane blocks
    jq = jnp.concatenate([jq1, jq2], axis=2)                 # (R,4,6)
    wq_info = wq[:, None, None] * graph.q_info
    hq_blk = jnp.einsum("qra,qrc,qcb->qab", jq, wq_info, jq)  # (R,6,6)
    bq_blk = jnp.einsum("qra,qrc,qc->qa", jq, wq_info, rq)
    qidx = jnp.concatenate(
        [
            6 * k + graph.q_i[:, None] * 3 + jnp.arange(3),
            6 * k + graph.q_j[:, None] * 3 + jnp.arange(3),
        ],
        axis=1,
    )  # (R,6)
    h = h.at[qidx[:, :, None], qidx[:, None, :]].add(hq_blk)
    b = b.at[qidx].add(bq_blk)
    return chi2, h, b


def _apply_gauge(h: jax.Array, b: jax.Array, graph: PoseGraph):
    """Fix node 0 + flagged nodes/planes, regularize invalid dofs."""
    k = graph.node_cap
    free = graph.node_valid & ~graph.node_fixed & (jnp.arange(k) > 0)
    free_pl = graph.plane_valid & ~graph.plane_fixed
    freed = jnp.concatenate([jnp.repeat(free, 6), jnp.repeat(free_pl, 3)])
    h = jnp.where(freed[:, None] & freed[None, :], h, 0.0)
    h = h + jnp.diag(jnp.where(freed, 0.0, 1.0))
    b = jnp.where(freed, b, 0.0)
    return h, b


class OptimizeResult(NamedTuple):
    poses: jax.Array
    chi2_before: jax.Array
    chi2_after: jax.Array
    iterations: jax.Array
    planes: jax.Array


@functools.partial(jax.jit, static_argnums=(1,))
def optimize_pose_graph(graph: PoseGraph, num_iterations: int = 128) -> OptimizeResult:
    """LM loop; returns re-anchored poses (keyframe 0 at its prior pose)."""

    k = graph.node_cap
    chi2_0, _, _ = _chi2_and_normal(graph, graph.poses, graph.planes, build=False)

    def cond(state):
        return ~state[-1]

    def body(state):
        poses, planes, lam, chi2, it, _ = state
        _, h, b = _chi2_and_normal(graph, poses, planes, build=True)
        h, b = _apply_gauge(h, b, graph)
        damped = h + lam * jnp.diag(jnp.maximum(jnp.diag(h), 1e-6))
        delta = jax.scipy.linalg.solve(damped, -b, assume_a="pos")
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        step = delta[: 6 * k].reshape(k, 6)
        new_poses = jax.vmap(lambda d, t: se3.exp_se3(d) @ t)(step, poses)
        step_pl = delta[6 * k :].reshape(graph.plane_cap, 3)
        new_planes = jax.vmap(factors.plane_oplus)(planes, step_pl)
        new_chi2, _, _ = _chi2_and_normal(graph, new_poses, new_planes, build=False)
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

    init = (graph.poses, graph.planes, jnp.float32(1e-4), chi2_0, jnp.int32(0), jnp.bool_(False))
    poses, planes, _, chi2_after, it, _ = jax.lax.while_loop(cond, body, init)

    # re-anchor to node 0 (`global_graph_nodelet.cpp:710-715`)
    anchor = graph.poses[0] @ se3.inverse(poses[0])
    poses = jnp.einsum("ij,njk->nik", anchor, poses)
    return OptimizeResult(
        poses=poses, chi2_before=chi2_0, chi2_after=chi2_after, iterations=it, planes=planes
    )


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


def add_plane_node(graph: PoseGraph, idx: int, coeffs, fixed: bool = False) -> PoseGraph:
    """`GraphSLAM::add_plane_node` (`graph_slam.cpp:116-124`); the floor node
    is added fixed (`global_graph_nodelet.cpp:601-604`)."""
    import numpy as _np

    c = _np.asarray(coeffs, _np.float64)
    c = c / max(float(_np.linalg.norm(c[:3])), 1e-9)
    graph.planes[idx] = c.astype(_np.float32)
    graph.plane_valid[idx] = True
    graph.plane_fixed[idx] = fixed
    return graph


def set_node_fixed(graph: PoseGraph, idx: int, fixed: bool = True) -> PoseGraph:
    graph.node_fixed[idx] = fixed
    return graph


def add_se3_plane_edge(
    graph: PoseGraph, slot: int, node: int, plane: int, meas_coeffs, info3, huber: float = 0.0
) -> PoseGraph:
    """`GraphSLAM::add_se3_plane_edge` (`graph_slam.cpp:149-160`)."""
    import numpy as _np

    c = _np.asarray(meas_coeffs, _np.float64)
    c = c / max(float(_np.linalg.norm(c[:3])), 1e-9)
    graph.sp_i[slot] = node
    graph.sp_plane[slot] = plane
    graph.sp_meas[slot] = c.astype(_np.float32)
    graph.sp_info[slot] = _np.asarray(info3, _np.float32)
    graph.sp_huber[slot] = huber
    graph.sp_valid[slot] = True
    return graph


def add_plane_edge(
    graph: PoseGraph, slot: int, i: int, j: int, q_type: int, meas, info, huber: float = 0.0
) -> PoseGraph:
    """Typed plane-plane/prior factor (`GraphSLAM::add_plane_identity_edge/
    add_plane_parallel_edge/add_plane_perpendicular_edge/
    add_plane_normal_prior_edge/add_plane_distance_prior_edge`,
    `graph_slam.cpp:162-276`). For the unary prior types pass j == i."""
    import numpy as _np

    meas = _np.asarray(meas, _np.float32).reshape(-1)
    info = _np.asarray(info, _np.float32)
    graph.q_i[slot] = i
    graph.q_j[slot] = j
    graph.q_type[slot] = q_type
    graph.q_meas[slot] = 0.0
    graph.q_meas[slot, : meas.shape[0]] = meas
    graph.q_info[slot] = 0.0
    graph.q_info[slot, : info.shape[0], : info.shape[1]] = info
    graph.q_huber[slot] = huber
    graph.q_valid[slot] = True
    return graph


PRIOR_XYZ, PRIOR_XY, PRIOR_QUAT, PRIOR_VEC, PRIOR_PLANE = range(5)
(
    PLANE_IDENTITY,
    PLANE_PARALLEL,
    PLANE_PERPENDICULAR,
    PLANE_PRIOR_NORMAL,
    PLANE_PRIOR_DISTANCE,
) = range(5)
