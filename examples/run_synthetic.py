#!/usr/bin/env python
"""Full VI-SLAM pipeline on a synthetic sequence — the standard smoke/drive
workload (no dataset download needed; runs on TPU or CPU).

Renders nothing: landmarks carry stable random descriptors and are
projected analytically (the same feature-level simulation the e2e tests
use), driven through the REAL system facade including IMU pairing, VIO
initialization, VI tracking, local BA and loop closing. Prints per-stage
timing and the final ATE.

Usage:
    python examples/run_synthetic.py [--mode mono|vi] [--duration 10]
"""

import argparse
import sys
import time

import numpy as np


import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_ROOT, _os.path.join(_ROOT, "tests")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)
import viorb_tpu
from viorb_tpu.io import evaluate, synthetic


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="vi", choices=["mono", "vi"])
    ap.add_argument("--duration", type=float, default=10.0)
    args = ap.parse_args()

    from test_mono_e2e import CAM, FeatureSim, N_FEAT, W, H

    cfg = viorb_tpu.SystemConfig()
    cfg.camera.fx, cfg.camera.fy = CAM.fx, CAM.fy
    cfg.camera.cx, cfg.camera.cy = CAM.cx, CAM.cy
    cfg.camera.width, cfg.camera.height = W, H
    cfg.orb.n_features = N_FEAT
    cfg.max_keyframes = 64
    cfg.max_landmarks = 4096
    cfg.estimate_extrinsics = False
    cfg.running_mode = 1 if args.mode == "vi" else 0
    cfg.imu.Tbc[:3, :3] = synthetic.euroc_like_extrinsics().Rbc
    cfg.imu.Tbc[:3, 3] = 0.0

    sensor = viorb_tpu.MONO_VI if args.mode == "vi" else viorb_tpu.MONOCULAR
    slam = viorb_tpu.System(cfg, sensor=sensor)

    traj = synthetic.circle_trajectory(duration=args.duration, imu_rate=200.0)
    noisy = synthetic.add_imu_noise(traj, np.random.default_rng(7))
    sim = FeatureSim()
    stride = 10
    t0 = time.perf_counter()
    n = 0
    for k in range(0, len(traj.t) - stride, stride):
        ts = float(traj.t[k])
        fd = sim.frame(traj.p[k], traj.Rwb[k])
        if args.mode == "vi":
            lo, hi = max(k - stride, 0), k
            dts = np.diff(traj.t[lo : hi + 1])
            chunk = np.concatenate(
                [noisy.gyro[lo:hi], noisy.acc[lo:hi], dts[:, None]], -1
            )
            st = slam.track_mono_vi_features(fd, chunk, ts)
        else:
            st = slam._timed_track(lambda: slam.pipeline.track_features(fd, ts))
        n += 1
        if n % 40 == 0:
            print(f"frame {n}: {st}")
    wall = time.perf_counter() - t0

    ftraj = slam.pipeline.frame_trajectory()
    est_ts = np.array([t for t, _, _ in ftraj])
    est_c = np.array([(-R.T @ t) for _, R, t in ftraj])
    rmse, scale, _ = evaluate.ate_rmse(est_ts, est_c, traj.t, traj.p)
    print(f"\n{n} frames in {wall:.1f}s ({n / wall:.1f} fps)")
    print(f"ATE RMSE (Sim3-aligned): {rmse:.4f} m   sim3 scale: {scale:.3f}")
    print(f"kfs={slam.map_changed_counters[0]} lms={slam.map_changed_counters[1]}",
          f"vins_inited={slam.vins_inited()}")
    print(slam.shutdown())


if __name__ == "__main__":
    main()
