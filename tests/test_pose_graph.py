import jax.numpy as jnp
import numpy as np

from lv_slam_tpu.core import se3
from lv_slam_tpu.graph import g2o_io, pose_graph as pg


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
