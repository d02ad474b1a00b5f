"""Live monitoring server (utils/live_viz.py — the RViz-analog surface,
reference `global_graph_nodelet.cpp:771-971` markers + `/map_points`)."""

import json
import urllib.error
import urllib.request

import numpy as np

from lv_slam_tpu.utils.live_viz import LiveViz


def _get(port, path):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
            return r.status, r.read()
    except urllib.error.HTTPError as e:  # urlopen raises on 4xx
        return e.code, b""


def test_live_viz_serves_state_and_map():
    viz = LiveViz(map_point_cap=100)
    port = viz.start()
    try:
        # publish a small graph state: 4x4 trajectory poses, loop edge, map
        traj = np.stack([np.eye(4)] * 5)
        traj[:, 0, 3] = np.arange(5.0)
        viz.publish(
            trajectory=traj, keyframes=traj[::2], loop_edges=[(0, 2)],
            map_points=np.random.default_rng(0).uniform(-10, 10, (1000, 3)),
            stats={"keyframes": 3, "loops": 1},
        )

        status, body = _get(port, "/state.json")
        assert status == 200
        st = json.loads(body)
        assert [p[0] for p in st["trajectory"]] == [0.0, 1.0, 2.0, 3.0, 4.0]
        assert st["loop_edges"] == [[0, 2]]
        assert st["stats"] == {"keyframes": 3, "loops": 1}
        # the 1000-point map is subsampled to the 100-point cap
        assert len(st["map_points"]) <= 100

        status, page = _get(port, "/")
        assert status == 200 and b"<canvas" in page

        status, ply = _get(port, "/map.ply")
        assert status == 200
        header = ply.decode().splitlines()
        n = int([l for l in header if l.startswith("element vertex")][0].split()[-1])
        assert n <= 100 and n > 0
        assert len(header) == header.index("end_header") + 1 + n

        status, _ = _get(port, "/nope")
        assert status == 404
    finally:
        viz.stop()


def test_live_viz_publish_backend():
    """publish_backend maps GlobalGraph keyframes/loops to indexed edges."""
    from types import SimpleNamespace

    kf = [
        SimpleNamespace(estimate=None, odom=np.eye(4) + 0.0) for _ in range(4)
    ]
    for i, k in enumerate(kf):
        k.odom = np.eye(4)
        k.odom[0, 3] = float(i)
    backend = SimpleNamespace(
        keyframes=kf,
        loops=[SimpleNamespace(key1=kf[3], key2=kf[0])],
    )
    viz = LiveViz()
    port = viz.start()
    try:
        viz.publish_backend(backend)
        _, body = _get(port, "/state.json")
        st = json.loads(body)
        assert st["loop_edges"] == [[3, 0]]
        assert len(st["keyframes"]) == 4
        assert st["stats"]["loops"] == 1
    finally:
        viz.stop()
