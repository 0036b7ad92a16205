#!/usr/bin/env python
"""Offline stereo KITTI odometry run.

Equivalent of `/root/reference/Examples/Stereo/stereo_kitti.cc`: left and
right image lists via times.txt, KITTI-format camera trajectory at the end.

Usage:
    python examples/stereo_kitti.py <sequence_root> [config.yaml] [out_dir] [--realtime]
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
    slam = viorb_tpu.System(cfg, sensor=viorb_tpu.STEREO)

    prev_t = None
    n = 0
    for lp, rp, ts in kitti.stereo_stream(root):
        iml, imr = kitti.load_image(lp), kitti.load_image(rp)
        t0 = time.perf_counter()
        st = slam.track_stereo(iml, imr, ts)
        n += 1
        if realtime and prev_t is not None:
            sleep = (ts - prev_t) - (time.perf_counter() - t0)
            if sleep > 0:
                time.sleep(sleep)
        prev_t = ts
        if n % 100 == 0:
            print(f"frame {n}: {st}")

    slam.save_trajectory_kitti(f"{out_dir}/CameraTrajectory.txt")
    print(slam.shutdown())


if __name__ == "__main__":
    main()
