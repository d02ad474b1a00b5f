import numpy as np
import pytest

from lv_slam_tpu.graph import pose_graph as pg
from lv_slam_tpu.parallel import mesh as pmesh
from tests.test_pose_graph import _chain_graph


@pytest.mark.slow
def test_sharded_pose_graph_matches_single(rng):
    graph, gt, est = _chain_graph(rng, n=12, with_loop=True, huber=1.0)
    single = pg.optimize_pose_graph(graph, 32)

    m = pmesh.make_mesh(n_batch=2, n_point=4)
    sharded = pmesh.optimize_pose_graph_sharded(m, graph, 32)

    np.testing.assert_allclose(
        float(single.chi2_before), float(sharded.chi2_before), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(single.poses)[:12, :3, 3],
        np.asarray(sharded.poses)[:12, :3, 3],
        atol=5e-3,
    )
    assert float(sharded.chi2_after) <= float(sharded.chi2_before)
