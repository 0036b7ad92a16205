#!/usr/bin/env python
"""Camera calibration CLI (Zhang planar method).

Equivalent of the reference's chessboard calibration node
(`/root/reference/Examples/ROS/ORB_SLAM2/src/ros_mono_calib.cc`, a
cv::calibrateCamera wrapper). Input is an .npz with detected corners
(corner detection happens upstream — any detector works):

    board_xy:  (N, 2) planar board coordinates in meters (z = 0)
    image_uvs: (V, N, 2) pixel corners, one row per view

Output: fx fy cx cy k1 k2 + per-view extrinsics, printed and optionally
written as a reference-format YAML snippet.

Usage:
    python tools/calibrate_camera.py corners.npz [--yaml out.yaml]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

# calibration is an offline host-side solve: run it in double precision on
# CPU (the reference's cv::calibrateCamera is double too)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from viorb_tpu.ops import calibration  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("corners", help=".npz with board_xy and image_uvs")
    ap.add_argument("--yaml", help="write a Camera.* YAML snippet here")
    args = ap.parse_args(argv)

    data = np.load(args.corners)
    res = calibration.calibrate_camera(data["board_xy"], data["image_uvs"])
    print(f"fx={res.fx:.3f} fy={res.fy:.3f} cx={res.cx:.3f} cy={res.cy:.3f}")
    print(f"k1={res.k1:.5f} k2={res.k2:.5f}  rms={res.rms_px:.3f}px "
          f"({len(res.ts)} views)")
    if args.yaml:
        with open(args.yaml, "w") as f:
            f.write("%YAML:1.0\n")
            for k, v in [("fx", res.fx), ("fy", res.fy), ("cx", res.cx),
                         ("cy", res.cy), ("k1", res.k1), ("k2", res.k2)]:
                f.write(f"Camera.{k}: {v:.6f}\n")
        print(f"wrote {args.yaml}")


if __name__ == "__main__":
    main()
