"""DLG (digital line graph) extraction from a floor-level scan.

Rebuild of the reference's `dlg_segmentation` tool
(`test/dlg_segmentation.cpp`, `include/dlg/dlg_segmentation.h:35-212`,
`include/dlg/PolylineMesh.h:97-148`): preprocess a scan with a z pass-band
(-0.10..0.20 by default) + outlier removal, iteratively extract 2D line
segments with RANSAC, and export the endpoint polyline graph as an OBJ file
(`saveOBJFile2` semantics: `v x y z` vertices + `l i j` polyline elements).

Vectorized RANSAC: every hypothesis is scored against all remaining points in
one batched pass per iteration (host loop only over extracted segments).
"""

from __future__ import annotations

import dataclasses
import os
from typing import List

import numpy as np


@dataclasses.dataclass
class LineSegment:
    p0: np.ndarray  # (2,)
    p1: np.ndarray  # (2,)
    n_inliers: int


def preprocess(points: np.ndarray, z_min: float = -0.10, z_max: float = 0.20) -> np.ndarray:
    """Keep the floor-level band and project to 2D (reference preprocess)."""
    pts = np.asarray(points, np.float32)
    keep = (pts[:, 2] > z_min) & (pts[:, 2] < z_max)
    return pts[keep][:, :2]


def extract_lines(
    points_2d: np.ndarray,
    distance_thresh: float = 0.05,
    min_inliers: int = 30,
    max_lines: int = 50,
    n_hypotheses: int = 512,
    seed: int = 0,
) -> List[LineSegment]:
    """Iterative RANSAC line segmentation on 2D points."""
    rng = np.random.default_rng(seed)
    pts = np.asarray(points_2d, np.float64)
    lines: List[LineSegment] = []
    active = np.ones(len(pts), bool)

    for _ in range(max_lines):
        n_active = int(active.sum())
        if n_active < min_inliers:
            break
        idx_pool = np.nonzero(active)[0]
        pairs = rng.choice(idx_pool, size=(n_hypotheses, 2))
        a, b = pts[pairs[:, 0]], pts[pairs[:, 1]]
        d = b - a
        norm = np.linalg.norm(d, axis=1)
        ok = norm > 0.2
        d = d / np.maximum(norm, 1e-9)[:, None]
        normal = np.stack([-d[:, 1], d[:, 0]], 1)  # (H,2)
        offs = np.sum(normal * a, axis=1)          # (H,)
        dist = np.abs(pts @ normal.T - offs[None, :])  # (N,H)
        inlier = (dist < distance_thresh) & active[:, None]
        counts = inlier.sum(0)
        counts[~ok] = 0
        best = int(np.argmax(counts))
        if counts[best] < min_inliers:
            break
        mask = inlier[:, best]
        # refit with PCA and clip to the inlier extent
        sel = pts[mask]
        mu = sel.mean(0)
        u, s, vt = np.linalg.svd(sel - mu)
        direction = vt[0]
        proj = (sel - mu) @ direction
        # split at gaps: keep the largest contiguous run (segment semantics)
        order = np.argsort(proj)
        sorted_proj = proj[order]
        gaps = np.nonzero(np.diff(sorted_proj) > 1.0)[0]
        starts = np.concatenate([[0], gaps + 1])
        ends = np.concatenate([gaps, [len(sorted_proj) - 1]])
        seg = int(np.argmax(ends - starts))
        lo, hi = sorted_proj[starts[seg]], sorted_proj[ends[seg]]
        run_count = int(ends[seg] - starts[seg] + 1)
        if run_count < min_inliers:
            # drop these points to avoid re-picking a fragmented line
            active[mask] = False
            continue
        p0, p1 = mu + lo * direction, mu + hi * direction
        lines.append(LineSegment(p0=p0, p1=p1, n_inliers=run_count))
        # remove only the points in the kept run's span
        in_run = mask.copy()
        span = (pts[mask] - mu) @ direction
        keep_in_run = (span >= lo - 0.5) & (span <= hi + 0.5)
        in_run[np.nonzero(mask)[0][~keep_in_run]] = False
        active[in_run] = False
    return lines


def save_obj(path: str, lines: List[LineSegment], z: float = 0.0) -> None:
    """OBJ polyline export (PolylineMesh::saveOBJFile2 format)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("# DLG polyline graph (lv_slam_tpu)\n")
        for seg in lines:
            f.write(f"v {seg.p0[0]:.6f} {seg.p0[1]:.6f} {z:.6f}\n")
            f.write(f"v {seg.p1[0]:.6f} {seg.p1[1]:.6f} {z:.6f}\n")
        for i in range(len(lines)):
            f.write(f"l {2 * i + 1} {2 * i + 2}\n")


def dlg_segmentation(points: np.ndarray, obj_path: str | None = None, **kwargs) -> List[LineSegment]:
    """Full tool: preprocess -> extract -> (optional) OBJ export."""
    pts2d = preprocess(points)
    lines = extract_lines(pts2d, **kwargs)
    if obj_path:
        save_obj(obj_path, lines)
    return lines
