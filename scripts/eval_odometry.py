#!/usr/bin/env python
"""Trajectory evaluation: KITTI devkit relative errors + per-axis error plots.

Equivalent of the reference's evaluation harness
(`scripts/lidar_odom_kitti.sh` -> evo_traj + `evaluate_odometry_seq`, and
`scripts/error_odom_png.py`'s per-axis absolute and scan-to-scan error plots).

Usage:
    python scripts/eval_odometry.py EST.txt GT.txt [--png out.png]
"""

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("est", help="estimated KITTI pose file (12 values/row)")
    ap.add_argument("gt", help="ground-truth KITTI pose file")
    ap.add_argument("--png", default=None, help="write per-axis error plot")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from lv_slam_tpu.io import kitti

    est = kitti.read_pose_file(args.est)
    gt = kitti.read_pose_file(args.gt)
    n = min(len(est), len(gt))
    est, gt = est[:n], gt[:n]

    t_err, r_err = kitti.kitti_seq_error(gt, est)
    ate = np.linalg.norm(est[:, :3, 3] - gt[:, :3, 3], axis=1)
    rel_t = []
    for i in range(1, n):
        rg = np.linalg.inv(gt[i - 1]) @ gt[i]
        re = np.linalg.inv(est[i - 1]) @ est[i]
        rel_t.append(np.linalg.norm((np.linalg.inv(re) @ rg)[:3, 3]))
    rel_t = np.asarray(rel_t)

    print(f"frames:          {n}")
    print(f"devkit t_err:    {t_err:.6f}")
    print(f"devkit r_err:    {r_err:.6f}")
    print(f"ATE   mean/max:  {ate.mean():.4f} / {ate.max():.4f} m")
    print(f"scan-to-scan te: {rel_t.mean():.4f} m mean, {rel_t.max():.4f} m max")

    if args.png:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        axes_err = est[:, :3, 3] - gt[:, :3, 3]
        fig, axs = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
        for k, name in enumerate("xyz"):
            axs[0].plot(axes_err[:, k], label=name)
        axs[0].set_ylabel("abs err [m]")
        axs[0].legend()
        axs[1].plot(ate)
        axs[1].set_ylabel("ATE [m]")
        axs[2].plot(rel_t)
        axs[2].set_ylabel("scan-to-scan err [m]")
        axs[2].set_xlabel("frame")
        fig.suptitle(f"devkit t={t_err:.5f} r={r_err:.6f}")
        fig.savefig(args.png, dpi=120)
        print(f"wrote {args.png}")


if __name__ == "__main__":
    main()
