#!/usr/bin/env python
"""Repeated-run EuRoC evaluation harness.

Equivalent of the reference's bash harness
`/root/reference/Examples/ROS/ORB_VIO/dataProcessingForEuRoCSingleSequence.sh:36-86`:
run the full mono-VI system N times on one EuRoC sequence, evaluate each
run's keyframe trajectory against ground truth with BOTH alignment
variants the reference uses —

  - auto-scale     (Sim3 Umeyama alignment; `evaluate_ate_autoScale...py`)
  - estimated-scale (SE3 alignment, trusting the VIO-estimated metric
                     scale; `evaluate_ate_estimatedScale...py`)

— then aggregate mean / median / std / min / max over the runs and write
`ate_summary.txt` plus per-run trajectories under <out>/run_<i>/.

Usage:
    python tools/eval_sequence.py <mav_root> [--runs N] [--config cfg.yaml]
                                  [--out outdir] [--gt groundtruth.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import viorb_tpu  # noqa: E402
from viorb_tpu.io import euroc  # noqa: E402
from viorb_tpu.io.evaluate import ate_rmse  # noqa: E402


def run_once(root: str, cfg_path: str | None, out_dir: str) -> dict:
    """One full mono-VI run; returns trajectory file paths + wall time."""
    if cfg_path:
        cfg = viorb_tpu.config_from_yaml(cfg_path)
    else:
        cfg = viorb_tpu.SystemConfig()
        cfg.running_mode = 1
    slam = viorb_tpu.System(cfg, sensor=viorb_tpu.MONO_VI)

    t0 = time.perf_counter()
    n = 0
    for sample in euroc.vi_stream(
        root,
        image_delay=cfg.camera.delay_to_imu,
        discard_time=cfg.discard_time,
    ):
        img = euroc.load_image(sample.image_path)
        slam.track_mono_vi(img, sample.imu, sample.timestamp)
        n += 1
    wall = time.perf_counter() - t0

    os.makedirs(out_dir, exist_ok=True)
    kf_path = os.path.join(out_dir, "KeyFrameTrajectory.txt")
    ns_path = os.path.join(out_dir, "KeyFrameNavStateTrajectory.txt")
    slam.save_keyframe_trajectory_tum(kf_path)
    slam.save_keyframe_trajectory_navstate(ns_path)
    return {"kf_traj": kf_path, "frames": n, "wall_s": wall}


def load_tum(path: str):
    data = np.loadtxt(path)
    if data.ndim == 1:
        data = data[None]
    return data[:, 0], data[:, 1:4]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="EuRoC mav root (contains mav0/)")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--config", default=None)
    ap.add_argument("--out", default="eval_out")
    ap.add_argument(
        "--gt", default=None,
        help="TUM-format groundtruth.txt (default: converted from "
        "mav0/state_groundtruth_estimate0/data.csv)")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    gt_path = args.gt
    if gt_path is None:
        gt_path = os.path.join(args.out, "groundtruth.txt")
        euroc.groundtruth_to_tum(args.root, gt_path)
    ts_gt, p_gt = load_tum(gt_path)

    rows = []
    for i in range(args.runs):
        run_dir = os.path.join(args.out, f"run_{i}")
        info = run_once(args.root, args.config, run_dir)
        ts_e, p_e = load_tum(info["kf_traj"])
        auto_rmse, auto_s, _ = ate_rmse(ts_e, p_e, ts_gt, p_gt, with_scale=True)
        est_rmse, _, _ = ate_rmse(ts_e, p_e, ts_gt, p_gt, with_scale=False)
        row = {
            "run": i,
            "ate_autoscale_m": auto_rmse,
            "ate_estscale_m": est_rmse,
            "align_scale": round(auto_s, 4),
            "n_kfs": int(len(ts_e)),
            "frames": info["frames"],
            "wall_s": round(info["wall_s"], 1),
        }
        rows.append(row)
        print(json.dumps(row))

    def agg(key):
        v = np.array([r[key] for r in rows])
        return dict(mean=float(v.mean()), median=float(np.median(v)),
                    std=float(v.std()), min=float(v.min()), max=float(v.max()))

    summary = {
        "sequence": args.root,
        "runs": args.runs,
        "ate_autoscale_m": agg("ate_autoscale_m"),
        "ate_estscale_m": agg("ate_estscale_m"),
        "per_run": rows,
    }
    with open(os.path.join(args.out, "ate_summary.txt"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: summary[k] for k in
                      ("ate_autoscale_m", "ate_estscale_m")}, indent=2))


if __name__ == "__main__":
    main()
