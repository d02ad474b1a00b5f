import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.core import se3
from lv_slam_tpu.graph import factors, g2o_io, pose_graph as pg


def _chain_graph(rng, n=12, drift=0.03, with_loop=True, huber=0.0, node_cap=32, edge_cap=64):
    """Ground truth: a circle. Odometry edges with drift noise; optional
    perfect loop edge closing last->first."""
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    radius = 10.0
    gt = []
    for a in angles:
        yaw = a + np.pi / 2
        c, s = np.cos(yaw), np.sin(yaw)
        pose = np.eye(4)
        pose[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        pose[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0]
        gt.append(pose)
    gt = np.stack(gt)

    graph = pg.empty_graph(node_cap, edge_cap, 16)
    info = np.eye(6) * 10.0
    # initial estimates: integrate noisy odometry
    est = [gt[0]]
    slot = 0
    for i in range(1, n):
        rel_true = np.linalg.inv(gt[i - 1]) @ gt[i]
        noise = np.asarray(
            se3.exp_se3(jnp.asarray(rng.normal(0, drift, 6) * [1, 1, 0.2, 0.05, 0.05, 1], jnp.float32))
        )
        rel_noisy = rel_true @ noise
        est.append(est[-1] @ rel_noisy)
        # edge convention: meas = T_i^-1 T_j with i=new, j=prev
        graph = pg.add_se3_edge(
            graph, slot, i, i - 1, np.linalg.inv(rel_noisy), info, huber=huber
        )
        slot += 1
    for i, pose in enumerate(est):
        graph = pg.add_node(graph, i, pose)
    if with_loop:
        rel = np.linalg.inv(gt[n - 1]) @ gt[0]
        graph = pg.add_se3_edge(graph, slot, n - 1, 0, rel, info * 10, huber=huber)
        slot += 1
    return graph, gt, np.stack(est)


def test_loop_closure_reduces_error(rng):
    graph, gt, est = _chain_graph(rng, with_loop=True)
    before = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])
    result = pg.optimize_pose_graph(graph, 64)
    poses = np.asarray(result.poses)
    after = np.linalg.norm(poses[11][:3, 3] - gt[11][:3, 3])
    assert float(result.chi2_after) < float(result.chi2_before)
    assert after < before * 0.5, (before, after)
    # anchored at node 0
    np.testing.assert_allclose(poses[0], gt[0], atol=1e-4)


def test_no_loop_stays_on_odometry(rng):
    graph, gt, est = _chain_graph(rng, with_loop=False)
    result = pg.optimize_pose_graph(graph, 32)
    poses = np.asarray(result.poses)
    # odometry-only chain is already the optimum: poses barely move
    np.testing.assert_allclose(poses[:12, :3, 3], est[:12, :3, 3], atol=0.05)


def test_huber_rejects_outlier_loop(rng):
    graph, gt, est = _chain_graph(rng, with_loop=True, huber=1.0)
    # add a grossly wrong second loop edge
    bad = np.eye(4)
    bad[:3, 3] = [30.0, -20.0, 5.0]
    graph = pg.add_se3_edge(graph, 12, 6, 0, bad, np.eye(6) * 10, huber=1.0)
    result = pg.optimize_pose_graph(graph, 64)
    poses = np.asarray(result.poses)
    err = np.linalg.norm(poses[11][:3, 3] - gt[11][:3, 3])
    assert err < 1.0, err  # the outlier must not rip the circle apart


def test_gps_prior(rng):
    graph, gt, est = _chain_graph(rng, with_loop=False)
    # strong GPS priors at ground-truth positions on every 3rd node
    slot = 0
    for i in range(0, 12, 3):
        graph = pg.add_prior(graph, slot, i, pg.PRIOR_XYZ, gt[i][:3, 3], np.eye(3) * 100.0)
        slot += 1
    result = pg.optimize_pose_graph(graph, 64)
    poses = np.asarray(result.poses)
    for i in range(0, 12, 3):
        assert np.linalg.norm(poses[i][:3, 3] - gt[i][:3, 3]) < 0.3


def test_quat_and_plane_priors(rng):
    graph, gt, est = _chain_graph(rng, with_loop=False, drift=0.05)
    q = np.array([1.0, 0.0, 0.0, 0.0])
    graph = pg.add_prior(graph, 0, 6, pg.PRIOR_QUAT, se_quat(gt[6]), np.eye(3) * 50.0)
    graph = pg.add_prior(graph, 1, 6, pg.PRIOR_PLANE, np.array([0.0, 0.0, 1.0, gt[6][2, 3]]), np.eye(4) * 50.0)
    result = pg.optimize_pose_graph(graph, 64)
    assert float(result.chi2_after) <= float(result.chi2_before) + 1e-3


def se_quat(pose):
    q = np.asarray(se3.quat_from_matrix(jnp.asarray(pose[:3, :3], jnp.float32)))
    return q


def test_g2o_roundtrip(rng, tmp_path):
    graph, _, _ = _chain_graph(rng, with_loop=True, huber=1.0)
    path = str(tmp_path / "graph.g2o")
    g2o_io.save_graph(path, graph)
    assert (tmp_path / "graph.g2o.kernels").exists()
    loaded = g2o_io.load_graph(path, node_cap=32, edge_cap=64)
    r1 = pg.optimize_pose_graph(graph, 32)
    r2 = pg.optimize_pose_graph(loaded, 32)
    np.testing.assert_allclose(
        float(r1.chi2_before), float(r2.chi2_before), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(r1.poses)[:12], np.asarray(r2.poses)[:12], atol=1e-2
    )


def test_shared_floor_plane_node(rng):
    """Multiple keyframes constrained through ONE fixed floor plane vertex
    (the reference's factorization, `global_graph_nodelet.cpp:598-612`):
    z drift must be pulled back to the ground truth plane."""
    graph, gt, est = _chain_graph(rng, with_loop=False, drift=0.0)
    # inject pure z drift into the estimates
    for i in range(12):
        bad = est[i].copy()
        bad[2, 3] += 0.15 * i
        graph = pg.add_node(graph, i, bad)
    graph = pg.add_plane_node(graph, 0, [0.0, 0.0, 1.0, 0.0], fixed=True)
    # measured local floor coeffs from the TRUE poses (z = 0 plane)
    floor = jnp.asarray([0.0, 0.0, 1.0, 0.0], jnp.float32)
    for i in range(12):
        meas = np.asarray(factors.plane_transform(jnp.asarray(gt[i], jnp.float32), floor))
        graph = pg.add_se3_plane_edge(graph, i, i, 0, meas, np.eye(3) * 100.0)
    result = pg.optimize_pose_graph(graph, 64)
    poses = np.asarray(result.poses)
    assert float(result.chi2_after) < float(result.chi2_before) * 0.05
    # all z estimates pulled back to the ground-truth plane
    assert np.abs(poses[:12, 2, 3] - gt[:12, 2, 3]).max() < 0.05
    # the fixed floor vertex did not move
    np.testing.assert_allclose(
        np.asarray(result.planes)[0], [0.0, 0.0, 1.0, 0.0], atol=1e-6
    )


def test_plane_plane_factors(rng):
    """identity / parallel / perpendicular / prior edges between plane nodes
    (`include/g2o/edge_plane_{identity,parallel,prior}.hpp`)."""
    graph = pg.empty_graph(4, 8, 4, plane_cap=4, sp_cap=8, q_cap=8)
    graph = pg.add_node(graph, 0, np.eye(4))
    # p0 fixed reference plane; p1 starts tilted + offset
    graph = pg.add_plane_node(graph, 0, [0.0, 0.0, 1.0, 0.0], fixed=True)
    tilted = np.array([0.2, -0.1, 0.97, 0.5])
    graph = pg.add_plane_node(graph, 1, tilted)
    graph = pg.add_plane_edge(
        graph, 0, 1, 0, pg.PLANE_IDENTITY, np.zeros(4), np.eye(4) * 100.0
    )
    result = pg.optimize_pose_graph(graph, 64)
    planes = np.asarray(result.planes)
    # identity edge pulls p1 onto p0
    np.testing.assert_allclose(planes[1], [0.0, 0.0, 1.0, 0.0], atol=1e-3)

    # parallel edge: normals align, distance free
    graph2 = pg.empty_graph(4, 8, 4, plane_cap=4, sp_cap=8, q_cap=8)
    graph2 = pg.add_node(graph2, 0, np.eye(4))
    graph2 = pg.add_plane_node(graph2, 0, [0.0, 0.0, 1.0, 0.0], fixed=True)
    graph2 = pg.add_plane_node(graph2, 1, tilted)
    graph2 = pg.add_plane_edge(
        graph2, 0, 1, 0, pg.PLANE_PARALLEL, np.zeros(3), np.eye(3) * 100.0
    )
    # pin the distance with a distance prior (reference: EdgePlanePriorDistance)
    graph2 = pg.add_plane_edge(
        graph2, 1, 1, 1, pg.PLANE_PRIOR_DISTANCE, [2.0], np.eye(1) * 100.0
    )
    r2 = pg.optimize_pose_graph(graph2, 64)
    planes2 = np.asarray(r2.planes)
    np.testing.assert_allclose(planes2[1][:3], [0.0, 0.0, 1.0], atol=1e-3)
    np.testing.assert_allclose(planes2[1][3], 2.0, atol=1e-3)

    # normal prior pulls the normal to a target direction
    graph3 = pg.empty_graph(4, 8, 4, plane_cap=4, sp_cap=8, q_cap=8)
    graph3 = pg.add_node(graph3, 0, np.eye(4))
    graph3 = pg.add_plane_node(graph3, 0, tilted)
    graph3 = pg.add_plane_edge(
        graph3, 0, 0, 0, pg.PLANE_PRIOR_NORMAL, [1.0, 0.0, 0.0], np.eye(3) * 100.0
    )
    r3 = pg.optimize_pose_graph(graph3, 64)
    assert float(r3.chi2_after) < float(r3.chi2_before) * 0.05


def test_g2o_format_golden(tmp_path):
    """The serialized g2o line layout is a stable external format (the
    reference's offline tooling consumes it) — pin it exactly."""
    graph = pg.empty_graph(4, 4, 4, plane_cap=2, sp_cap=4, q_cap=4)
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    graph = pg.add_node(graph, 0, np.eye(4))
    graph = pg.add_node(graph, 1, pose)
    rel = np.eye(4)
    rel[0, 3] = -1.0
    graph = pg.add_se3_edge(graph, 0, 1, 0, rel, np.eye(6) * 2.0, huber=1.0)
    graph = pg.add_prior(graph, 0, 1, pg.PRIOR_XYZ, [1.0, 2.0, 3.0], np.eye(3) * 4.0)
    graph = pg.add_plane_node(graph, 0, [0.0, 0.0, 1.0, 0.0], fixed=True)
    graph = pg.add_se3_plane_edge(graph, 0, 1, 0, [0.0, 0.0, 1.0, 0.5], np.eye(3))
    path = str(tmp_path / "g.g2o")
    g2o_io.save_graph(path, graph)
    lines = open(path).read().splitlines()
    assert lines[0] == "VERTEX_SE3:QUAT 0 0 0 0 0 0 0 1"
    assert lines[1] == "VERTEX_SE3:QUAT 1 1 2 3 0 0 0 1"
    assert lines[2] == "VERTEX_PLANE 1000000 0 0 1 0"
    assert lines[3] == "FIX 0"
    assert lines[4] == "FIX 1000000"
    assert lines[5].startswith("EDGE_SE3:QUAT 1 0 -1 0 0 0 0 0 1 2 0 0 0 0 0 2 0")
    assert lines[6].startswith("EDGE_SE3_PRIORXYZ 1 1 2 3 4 0 0 4 0 4")
    assert lines[7].startswith("EDGE_SE3_PLANE 1 1000000 0 0 1 0.5 1 0 0 1 0 1")
    kernels = open(path + ".kernels").read().splitlines()
    assert kernels == ["2 1 0 Huber 1"]


def test_g2o_roundtrip_with_priors_and_planes(rng, tmp_path):
    """Round-trip a graph carrying EVERY factor family (the reference saves
    all registered types, `graph_slam.cpp:333-341`) and assert the reloaded
    factor set produces the identical chi2."""
    graph, gt, _ = _chain_graph(rng, with_loop=True, huber=1.0)
    # unary priors of each SE3 flavor
    graph = pg.add_prior(graph, 0, 3, pg.PRIOR_XYZ, gt[3][:3, 3], np.eye(3) * 10.0, huber=0.5)
    graph = pg.add_prior(graph, 1, 5, pg.PRIOR_XY, gt[5][:2, 3], np.eye(2) * 4.0)
    graph = pg.add_prior(graph, 2, 7, pg.PRIOR_QUAT, se_quat(gt[7]), np.eye(3) * 25.0)
    graph = pg.add_prior(
        graph, 3, 9, pg.PRIOR_VEC,
        np.array([0.0, 0.0, 1.0, 0.0, 0.0, 1.0]), np.eye(3) * 2.0,
    )
    # shared floor vertex + SE3-plane edges + plane-plane factors
    graph = pg.add_plane_node(graph, 0, [0.0, 0.0, 1.0, 0.0], fixed=True)
    graph = pg.add_plane_node(graph, 1, [0.05, 0.0, 1.0, 0.3])
    graph = pg.add_se3_plane_edge(graph, 0, 2, 0, [0.0, 0.0, 1.0, 0.1], np.eye(3) * 8.0, huber=1.0)
    graph = pg.add_se3_plane_edge(graph, 1, 4, 0, [0.01, 0.0, 1.0, -0.05], np.eye(3) * 8.0)
    graph = pg.add_plane_edge(graph, 0, 1, 0, pg.PLANE_IDENTITY, np.zeros(4), np.eye(4) * 5.0)
    graph = pg.add_plane_edge(graph, 1, 1, 0, pg.PLANE_PARALLEL, np.zeros(3), np.eye(3) * 5.0)
    graph = pg.add_plane_edge(graph, 2, 1, 0, pg.PLANE_PERPENDICULAR, np.zeros(3), np.eye(1) * 0.1)
    graph = pg.add_plane_edge(graph, 3, 1, 1, pg.PLANE_PRIOR_NORMAL, [0.0, 0.0, 1.0], np.eye(3) * 3.0)
    graph = pg.add_plane_edge(graph, 4, 1, 1, pg.PLANE_PRIOR_DISTANCE, [0.2], np.eye(1) * 3.0)

    path = str(tmp_path / "graph.g2o")
    g2o_io.save_graph(path, graph)
    text = open(path).read()
    for tag in (
        "VERTEX_PLANE", "EDGE_SE3_PLANE", "EDGE_SE3_PRIORXYZ", "EDGE_SE3_PRIORXY ",
        "EDGE_SE3_PRIORQUAT", "EDGE_SE3_PRIORVEC", "EDGE_PLANE_IDENTITY",
        "EDGE_PLANE_PARALLEL", "EDGE_PLANE_PAERPENDICULAR",
        "EDGE_PLANE_PRIOR_NORMAL", "EDGE_PLANE_PRIOR_DISTANCE",
    ):
        assert tag in text, f"missing {tag} in g2o dump"
    loaded = g2o_io.load_graph(path, node_cap=32, edge_cap=64)
    # identical factor sets -> identical chi2 at the saved estimates
    c1, _, _ = pg._chi2_and_normal(graph, jnp.asarray(graph.poses), jnp.asarray(graph.planes), False)
    c2, _, _ = pg._chi2_and_normal(loaded, jnp.asarray(loaded.poses), jnp.asarray(loaded.planes), False)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-4)
    # prior Huber widths survived the sidecar
    assert loaded.p_huber[0] > 0
    assert loaded.plane_fixed[0] and not loaded.plane_fixed[1]
    r1 = pg.optimize_pose_graph(graph, 32)
    r2 = pg.optimize_pose_graph(loaded, 32)
    np.testing.assert_allclose(np.asarray(r1.poses)[:12], np.asarray(r2.poses)[:12], atol=1e-2)
    np.testing.assert_allclose(np.asarray(r1.planes)[:2], np.asarray(r2.planes)[:2], atol=1e-3)
