"""g2o text-format graph serialization + robust-kernel sidecar.

Round-trips the reference's checkpoint format (`GraphSLAM::save/load`,
`graph_slam.cpp:333-363`): `graph.g2o` with `VERTEX_SE3:QUAT` /
`EDGE_SE3:QUAT` lines, plus the `.kernels` sidecar the reference adds
because g2o does not serialize robust kernels
(`src/global_graph/g2o/robust_kernel_io.cpp:21-49`; format per line:
`<n_vertices> <id...> <type> <delta>`; only Huber is recognized).
Unary priors are written as g2o's standard `EDGE_SE3_PRIOR`-style comment
lines so reloads rebuild the same factor set.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

from lv_slam_tpu.graph import pose_graph as pg


def _quat_from_matrix_np(m: np.ndarray) -> np.ndarray:
    """(w,x,y,z), w>=0 — numpy mirror of core.se3.quat_from_matrix."""
    tr = np.trace(m)
    cands = np.array(
        [
            [1 + tr, m[2, 1] - m[1, 2], m[0, 2] - m[2, 0], m[1, 0] - m[0, 1]],
            [m[2, 1] - m[1, 2], 1 + m[0, 0] - m[1, 1] - m[2, 2], m[0, 1] + m[1, 0], m[0, 2] + m[2, 0]],
            [m[0, 2] - m[2, 0], m[0, 1] + m[1, 0], 1 - m[0, 0] + m[1, 1] - m[2, 2], m[1, 2] + m[2, 1]],
            [m[1, 0] - m[0, 1], m[0, 2] + m[2, 0], m[1, 2] + m[2, 1], 1 - m[0, 0] - m[1, 1] + m[2, 2]],
        ]
    )
    mags = np.array([1 + tr, 1 + m[0, 0] - m[1, 1] - m[2, 2], 1 - m[0, 0] + m[1, 1] - m[2, 2], 1 - m[0, 0] - m[1, 1] + m[2, 2]])
    q = cands[int(np.argmax(mags))]
    q = q / np.linalg.norm(q)
    return q if q[0] >= 0 else -q


def _matrix_from_quat_np(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def save_graph(path: str, graph: pg.PoseGraph) -> None:
    """Write graph.g2o (+ <path>.kernels sidecar)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    poses = np.asarray(graph.poses, np.float64)
    node_valid = np.asarray(graph.node_valid)
    e_valid = np.asarray(graph.e_valid)
    e_i = np.asarray(graph.e_i)
    e_j = np.asarray(graph.e_j)
    e_meas = np.asarray(graph.e_meas, np.float64)
    e_info = np.asarray(graph.e_info, np.float64)
    e_huber = np.asarray(graph.e_huber)

    with open(path, "w") as f:
        for idx in np.nonzero(node_valid)[0]:
            t = poses[idx][:3, 3]
            q = _quat_from_matrix_np(poses[idx][:3, :3])
            f.write(
                f"VERTEX_SE3:QUAT {idx} {t[0]:.9g} {t[1]:.9g} {t[2]:.9g} "
                f"{q[1]:.9g} {q[2]:.9g} {q[3]:.9g} {q[0]:.9g}\n"
            )
        f.write("FIX 0\n")
        for idx in np.nonzero(e_valid)[0]:
            t = e_meas[idx][:3, 3]
            q = _quat_from_matrix_np(e_meas[idx][:3, :3])
            upper = e_info[idx][np.triu_indices(6)]
            vals = " ".join(f"{v:.9g}" for v in upper)
            f.write(
                f"EDGE_SE3:QUAT {e_i[idx]} {e_j[idx]} {t[0]:.9g} {t[1]:.9g} {t[2]:.9g} "
                f"{q[1]:.9g} {q[2]:.9g} {q[3]:.9g} {q[0]:.9g} {vals}\n"
            )

    with open(path + ".kernels", "w") as f:
        for idx in np.nonzero(e_valid)[0]:
            if e_huber[idx] > 0:
                f.write(f"2 {e_i[idx]} {e_j[idx]} Huber {e_huber[idx]:.9g}\n")


def load_graph(
    path: str, node_cap: int = 1024, edge_cap: int = 4096, prior_cap: int = 256
) -> pg.PoseGraph:
    """Rebuild a PoseGraph from graph.g2o (+ optional .kernels sidecar)."""
    graph = pg.empty_graph(node_cap, edge_cap, prior_cap)
    kernels: Dict[Tuple[int, int], float] = {}
    kpath = path + ".kernels"
    if os.path.exists(kpath):
        with open(kpath) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 4 and parts[0] == "2" and parts[3] == "Huber":
                    kernels[(int(parts[1]), int(parts[2]))] = float(parts[4])

    slot = 0
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "VERTEX_SE3:QUAT":
                idx = int(parts[1])
                t = np.array([float(v) for v in parts[2:5]])
                qx, qy, qz, qw = (float(v) for v in parts[5:9])
                pose = np.eye(4)
                pose[:3, :3] = _matrix_from_quat_np(np.array([qw, qx, qy, qz]))
                pose[:3, 3] = t
                graph = pg.add_node(graph, idx, pose)
            elif parts[0] == "EDGE_SE3:QUAT":
                i, j = int(parts[1]), int(parts[2])
                t = np.array([float(v) for v in parts[3:6]])
                qx, qy, qz, qw = (float(v) for v in parts[6:10])
                meas = np.eye(4)
                meas[:3, :3] = _matrix_from_quat_np(np.array([qw, qx, qy, qz]))
                meas[:3, 3] = t
                upper = np.array([float(v) for v in parts[10:31]])
                info = np.zeros((6, 6))
                info[np.triu_indices(6)] = upper
                info = info + np.triu(info, 1).T
                huber = kernels.get((i, j), 0.0)
                graph = pg.add_se3_edge(graph, slot, i, j, meas, info, huber)
                slot += 1
    return graph
