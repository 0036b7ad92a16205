#!/usr/bin/env python
"""Monocular visual-inertial EuRoC run — THE VI entry point.

Equivalent of `/root/reference/Examples/ROS/ORB_VIO/src/ros_vio_readrosbag.cc`
(the deterministic offline driver used by testeuroc.launch): replays the
mav0 image+IMU stream through the MsgSynchronizer pairing, tracks with
TrackMonoVI, and dumps KeyFrameTrajectory.txt, KeyFrameNavStateTrajectory.txt
and the timing statistics at shutdown (ros_vio.cc:202-272).

Usage:
    python examples/vio_euroc.py <mav_root> [config.yaml] [out_dir]
"""

import sys
import time

import numpy as np

import os as _os, sys as _sys
_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
for _p in (_ROOT, _os.path.join(_ROOT, "tests")):
    if _p not in _sys.path:
        _sys.path.insert(0, _p)
import viorb_tpu
from viorb_tpu.io import euroc


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__.strip())
        sys.exit(0 if len(sys.argv) > 1 else 1)
    root = sys.argv[1]
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else None
    out_dir = sys.argv[3] if len(sys.argv) > 3 else "."

    if cfg_path:
        cfg = viorb_tpu.config_from_yaml(cfg_path)
    else:
        cfg = viorb_tpu.SystemConfig()
        cfg.running_mode = 1
    slam = viorb_tpu.System(cfg, sensor=viorb_tpu.MONO_VI)

    t_start = time.perf_counter()
    n = 0
    for sample in euroc.vi_stream(
        root, image_delay=cfg.camera.delay_to_imu,
        discard_time=cfg.discard_time,
    ):
        img = euroc.load_image(sample.image_path)
        st = slam.track_mono_vi(img, sample.imu, sample.timestamp)
        n += 1
        if n % 100 == 0:
            print(
                f"frame {n}: state={st.get('state')} kfs={st.get('n_kfs')} "
                f"lms={st.get('n_lms')} vins={slam.vins_inited()}"
            )
    wall = time.perf_counter() - t_start

    slam.save_keyframe_trajectory_tum(f"{out_dir}/KeyFrameTrajectory.txt")
    slam.save_trajectory_tum(f"{out_dir}/FrameTrajectory.txt")
    slam.save_keyframe_trajectory_navstate(
        f"{out_dir}/KeyFrameNavStateTrajectory.txt"
    )
    print(f"\n{n} frames in {wall:.1f}s ({n / max(wall, 1e-9):.1f} fps)")
    print(slam.shutdown())


if __name__ == "__main__":
    main()
