"""Visualization exports (the reference's RViz marker surface).

`GlobalGraphNodelet::create_marker_array` (`global_graph_nodelet.cpp:771-971`)
publishes trajectory spheres, edge lines colored by type, and the
loop-detection radius. Without ROS, the same content is exported as PLY
(points + colored edges; viewable in CloudCompare/MeshLab) and, optionally,
a self-contained HTML/three.js-free SVG top-down view.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

# edge-type colors (rgb): odometry=white-ish, loop=red, prior=green
_COLORS = {"odometry": (200, 200, 200), "loop": (255, 40, 40), "prior": (40, 220, 40)}


def export_graph_ply(
    path: str,
    node_positions: np.ndarray,
    edges: Sequence[Tuple[int, int, str]],
) -> None:
    """PLY with one vertex per graph node and colored edges."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(node_positions)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element edge {len(edges)}\n")
        f.write("property int vertex1\nproperty int vertex2\n")
        f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for p in node_positions:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
        for i, j, kind in edges:
            r, g, b = _COLORS.get(kind, (128, 128, 128))
            f.write(f"{i} {j} {r} {g} {b}\n")


def export_backend_graph(backend, path: str) -> None:
    """Dump the current pose graph (nodes + odometry/loop edges) as PLY."""
    kfs = backend.keyframes
    if not kfs:
        return
    positions = np.stack(
        [(kf.estimate if kf.estimate is not None else kf.odom)[:3, 3] for kf in kfs]
    )
    edges: List[Tuple[int, int, str]] = [
        (i - 1, i, "odometry") for i in range(1, len(kfs))
    ]
    for loop in backend.loops:
        edges.append((loop.key1.node_id, loop.key2.node_id, "loop"))
    export_graph_ply(path, positions, edges)


def export_trajectory_svg(
    path: str,
    est: np.ndarray,
    gt: Optional[np.ndarray] = None,
    size: int = 800,
) -> None:
    """Top-down (x,y) SVG of the trajectory, optional ground-truth overlay."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pts = est[:, :2, 3] if est.ndim == 3 else est[:, :2]
    all_pts = pts if gt is None else np.concatenate([pts, gt[:, :2, 3] if gt.ndim == 3 else gt[:, :2]])
    lo, hi = all_pts.min(0) - 5, all_pts.max(0) + 5
    scale = (size - 20) / max(hi - lo)

    def to_px(p):
        q = (p - lo) * scale + 10
        return q[0], size - q[1]

    def polyline(arr, color):
        coords = " ".join(f"{x:.1f},{y:.1f}" for x, y in (to_px(p) for p in arr))
        return f'<polyline points="{coords}" fill="none" stroke="{color}" stroke-width="2"/>'

    body = [polyline(pts, "#1f6feb")]
    if gt is not None:
        body.insert(0, polyline(gt[:, :2, 3] if gt.ndim == 3 else gt[:, :2], "#bbbbbb"))
    with open(path, "w") as f:
        f.write(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{size}" height="{size}" '
            f'style="background:#ffffff">{"".join(body)}</svg>'
        )
