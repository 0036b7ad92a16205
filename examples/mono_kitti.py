#!/usr/bin/env python
"""Offline monocular KITTI odometry run.

Equivalent of `/root/reference/Examples/Monocular/mono_kitti.cc`:
times.txt + image_0 list, optional real-time pacing, KITTI-format
trajectory at the end.

Usage:
    python examples/mono_kitti.py <sequence_root> [config.yaml] [out_dir] [--realtime]
"""

import sys
import time

import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_ROOT, _os.path.join(_ROOT, "tests")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)
import viorb_tpu
from viorb_tpu.io import kitti


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args or "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__.strip())
        sys.exit(0 if args or len(sys.argv) > 1 else 1)
    realtime = "--realtime" in sys.argv
    root = args[0]
    cfg_path = args[1] if len(args) > 1 else None
    out_dir = args[2] if len(args) > 2 else "."

    cfg = viorb_tpu.config_from_yaml(cfg_path) if cfg_path else viorb_tpu.SystemConfig()
    cfg.running_mode = 0
    slam = viorb_tpu.System(cfg, sensor=viorb_tpu.MONOCULAR)

    prev_t = None
    n = 0
    for path, ts in kitti.mono_stream(root):
        img = kitti.load_image(path)
        t0 = time.perf_counter()
        st = slam.track_monocular(img, ts)
        n += 1
        if realtime and prev_t is not None:
            sleep = (ts - prev_t) - (time.perf_counter() - t0)
            if sleep > 0:
                time.sleep(sleep)
        prev_t = ts
        if n % 100 == 0:
            print(f"frame {n}: {st}")

    slam.save_trajectory_kitti(f"{out_dir}/CameraTrajectory.txt")
    slam.save_keyframe_trajectory_tum(f"{out_dir}/KeyFrameTrajectory.txt")
    print(slam.shutdown())


if __name__ == "__main__":
    main()
