#!/usr/bin/env python
"""Trajectory analysis CLI — the reference's result_analysis.py analog.

Compares an estimated TUM trajectory against ground truth (EuRoC
state_groundtruth_estimate0 CSV or another TUM file), reports mean
absolute error / std (the reference's numbers, result_analysis.py:171-192)
and Umeyama-aligned RMSE, optionally writes per-axis plots.

Usage:
  python -m orbslam2_tpu.evaluation.analyze EST.txt GT.(csv|txt) [--plot out.png]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .ate import associate_by_time, ate_mean_abs, ate_rmse, load_tum_trajectory


def load_ground_truth(path: str) -> np.ndarray:
    """EuRoC ground-truth CSV (ns timestamps) or TUM txt -> [N,8]."""
    if path.endswith(".csv"):
        rows = []
        with open(path) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                v = line.strip().split(",")
                if len(v) >= 8:
                    # t[ns], p_xyz, q_wxyz -> TUM t, xyz, q_xyzw
                    rows.append(
                        [float(v[0]) / 1e9, float(v[1]), float(v[2]), float(v[3]),
                         float(v[5]), float(v[6]), float(v[7]), float(v[4])]
                    )
        return np.array(rows)
    return load_tum_trajectory(path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("estimate")
    ap.add_argument("ground_truth")
    ap.add_argument("--plot", default=None)
    ap.add_argument("--max-dt", type=float, default=0.02)
    args = ap.parse_args(argv)

    est = load_tum_trajectory(args.estimate)
    gt = load_ground_truth(args.ground_truth)
    ia, ib = associate_by_time(est[:, 0], gt[:, 0], args.max_dt)
    if len(ia) < 10:
        print(f"only {len(ia)} associated poses — check timestamps")
        return 1
    e = est[ia, 1:4]
    g = gt[ib, 1:4]
    mean_abs, std = ate_mean_abs(e, g)
    rmse = ate_rmse(e, g)
    print(f"associated poses: {len(ia)}")
    print(f"mean abs trajectory error: {mean_abs:.4f} m (std {std:.4f})")
    print(f"ATE RMSE (Umeyama-aligned): {rmse:.4f} m")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from .ate import umeyama_alignment

        R, t, _ = umeyama_alignment(e, g)
        ea = (R @ e.T).T + t
        fig, axes = plt.subplots(3, 1, figsize=(10, 8), sharex=True)
        for k, name in enumerate("xyz"):
            axes[k].plot(gt[ib, 0], g[:, k], "k-", lw=0.8, label="ground truth")
            axes[k].plot(gt[ib, 0], ea[:, k], "r-", lw=0.8, label="estimate")
            axes[k].set_ylabel(f"{name} [m]")
        axes[0].legend()
        axes[2].set_xlabel("t [s]")
        fig.savefig(args.plot, dpi=110, bbox_inches="tight")
        print(f"plot: {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
