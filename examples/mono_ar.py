#!/usr/bin/env python
"""Headless AR demo: SLAM-tracked virtual cube on a detected map plane.

The TPU-native equivalent of the reference AR demo
(`Examples/ROS/ORB_VIO/src/AR/ros_mono_ar.cc` + `ViewerAR.{h,cc}`): run
monocular SLAM on a synthetic sequence, RANSAC-detect the dominant plane in
the well-observed map points, and render a virtual cube + grid through the
live camera pose. Instead of a Pangolin window, frames are composited
headlessly (viorb_tpu.ar) and written as PNGs.

Usage:
    python examples/mono_ar.py [--duration 8] [--out /tmp/ar_frames] [--every 20]
"""

import argparse
import os
import sys

import numpy as np


import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_ROOT, _os.path.join(_ROOT, "tests")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)
import viorb_tpu
from viorb_tpu import ar
from viorb_tpu.io import synthetic
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=8.0)
    ap.add_argument("--out", default="/tmp/ar_frames")
    ap.add_argument("--every", type=int, default=20)
    args = ap.parse_args()

    from test_mono_e2e import CAM, FeatureSim, N_FEAT, W, H

    cfg = viorb_tpu.SystemConfig()
    cfg.camera.fx, cfg.camera.fy = CAM.fx, CAM.fy
    cfg.camera.cx, cfg.camera.cy = CAM.cx, CAM.cy
    cfg.camera.width, cfg.camera.height = W, H
    cfg.orb.n_features = N_FEAT
    cfg.max_keyframes = 64
    cfg.max_landmarks = 4096
    cfg.running_mode = 0
    slam = viorb_tpu.System(cfg, sensor=viorb_tpu.MONOCULAR)

    drawer = ar.ARFrameDrawer(CAM.fx, CAM.fy, CAM.cx, CAM.cy,
                              cube_size=0.1, ngrid=4, grid_size=0.1)
    os.makedirs(args.out, exist_ok=True)

    traj = synthetic.circle_trajectory(duration=args.duration, imu_rate=200.0)
    sim = FeatureSim()
    stride = 10
    n_saved = 0
    for n, k in enumerate(range(0, len(traj.t) - stride, stride)):
        ts = float(traj.t[k])
        fd = sim.frame(traj.p[k], traj.Rwb[k])
        st = slam._timed_track(lambda: slam.pipeline.track_features(fd, ts))
        status = {"OK": "ok", "LOST": "lost"}.get(
            str(slam.tracking_state), "not_initialized")
        if n % args.every:
            continue
        img = np.full((H, W), 90, np.uint8)  # synthetic frames carry no pixels
        if status == "ok" and slam.pipeline.last is not None:
            m = slam.pipeline.map
            valid = np.asarray(m.lms.valid)
            out, txt = drawer.update(
                img, "ok",
                np.asarray(slam.pipeline.last["Rcw"]),
                np.asarray(slam.pipeline.last["tcw"]),
                np.asarray(m.lms.pos)[valid], np.asarray(m.lms.n_obs)[valid])
        else:
            out, txt = drawer.update(img, status, np.eye(3), np.zeros(3))
        path = os.path.join(args.out, f"ar_{n:04d}.png")
        Image.fromarray(out).save(path)
        n_saved += 1
        print(f"frame {n:4d}  [{txt}]  -> {path}")

    print(f"\nsaved {n_saved} AR frames to {args.out}; "
          f"plane detected: {drawer.plane is not None}")
    if drawer.plane is not None:
        print(f"plane origin {np.round(drawer.plane.o, 3)} "
              f"normal {np.round(drawer.plane.n, 3)} "
              f"({len(drawer.plane.points)} inlier points)")


if __name__ == "__main__":
    main()
