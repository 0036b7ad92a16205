#!/usr/bin/env python
"""Offline RGB-D TUM run.

Equivalent of `/root/reference/Examples/RGB-D/rgbd_tum.cc`: associations
file (or direct rgb.txt/depth.txt pairing), CameraTrajectory.txt +
KeyFrameTrajectory.txt at the end.

Usage:
    python examples/rgbd_tum.py <sequence_root> [associations.txt] [config.yaml] [out_dir]
"""

import sys

import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_ROOT, _os.path.join(_ROOT, "tests")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)
import viorb_tpu
from viorb_tpu.io import tum


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args or "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__.strip())
        sys.exit(0 if args or len(sys.argv) > 1 else 1)
    root = args[0]
    assoc = args[1] if len(args) > 1 else None
    cfg_path = args[2] if len(args) > 2 else None
    out_dir = args[3] if len(args) > 3 else "."

    cfg = viorb_tpu.config_from_yaml(cfg_path) if cfg_path else viorb_tpu.SystemConfig()
    slam = viorb_tpu.System(cfg, sensor=viorb_tpu.RGBD)

    n = 0
    for rgb_p, dep_p, ts in tum.rgbd_stream(root, assoc):
        img = tum.load_image(rgb_p)
        depth = tum.load_depth(dep_p)
        st = slam.track_rgbd(img, depth, ts)
        n += 1
        if n % 100 == 0:
            print(f"frame {n}: {st}")

    slam.save_trajectory_tum(f"{out_dir}/CameraTrajectory.txt")
    slam.save_keyframe_trajectory_tum(f"{out_dir}/KeyFrameTrajectory.txt")
    print(slam.shutdown())


if __name__ == "__main__":
    main()
