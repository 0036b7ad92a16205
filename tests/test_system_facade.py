"""System facade, config loading, synchronizer, and trajectory/map IO.

Covers the reference's System public API surface (include/System.h:74-193),
ConfigParam YAML semantics (src/IMU/configparam.cc), and MsgSynchronizer
(Examples/ROS/ORB_VIO/src/MsgSync/MsgSynchronizer.cc).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import viorb_tpu
from viorb_tpu.io import synthetic
from viorb_tpu.io.sync import MsgSynchronizer
from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline.system import OK
from viorb_tpu.pipeline.vi_system import ViMonoSystem

from test_mono_e2e import CAM, FeatureSim, N_FEAT, W, H

REF_YAML = "/root/reference/Examples/ROS/ORB_VIO/Config/EuRoC.yaml"


def test_config_from_reference_yaml():
    """The reference's own EuRoC.yaml must parse with identical values."""
    cfg = viorb_tpu.config_from_yaml(REF_YAML)
    assert cfg.camera.fx == pytest.approx(458.654)
    assert cfg.camera.cy == pytest.approx(248.375)
    assert cfg.orb.n_features == 1000
    assert cfg.orb.n_levels == 8
    assert cfg.imu.rate == 200
    assert cfg.imu.sigma_g == pytest.approx(1.6968e-4)
    assert cfg.imu.sigma_aw == pytest.approx(3.0e-3)
    assert cfg.running_mode == 1
    assert not cfg.deactive_loop_closure
    assert cfg.estimate_extrinsics
    assert cfg.local_window_size == 10
    # Tbc from the yaml, orthonormalized
    R = cfg.Rbc
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-9)
    assert cfg.pbc[1] == pytest.approx(-0.064676986768)
    # build a system from it (mono-VI per runningMode)
    cfg.max_keyframes = 16
    cfg.max_landmarks = 512
    cfg.orb.n_features = 128
    sys_ = viorb_tpu.build_system(cfg)
    assert isinstance(sys_, ViMonoSystem)
    assert sys_.estimate_extrinsics


def test_msg_synchronizer():
    sync = MsgSynchronizer(image_delay=0.0)
    # imu at 100 Hz, images at 10 Hz
    out = []
    for k in range(100):
        t = k * 0.01
        sync.add_imu(t, (0.0, 0.0, 0.1), (0.0, 0.0, 9.8))
        if k % 10 == 5:
            sync.add_image(f"img{k}", t)
        f = sync.get_recent()
        if f:
            out.append(f)
    assert len(out) >= 8
    # every frame's IMU rows cover the gap to the previous frame
    for f in out[1:]:
        assert f.imu.shape[1] == 7
        assert abs(f.imu[:, 6].sum() - 0.1) < 1e-6  # 10 Hz spacing
    # discontinuity clears the queues
    sync.add_imu(100.0, (0, 0, 0), (0, 0, 9.8))
    assert len(sync._imu) <= 1


def test_facade_mono_roundtrip(tmp_path):
    """Drive the facade in feature mode, save all trajectory formats + the
    map checkpoint, reload it, and keep tracking."""
    cfg = viorb_tpu.SystemConfig()
    cfg.camera.fx, cfg.camera.fy = CAM.fx, CAM.fy
    cfg.camera.cx, cfg.camera.cy = CAM.cx, CAM.cy
    cfg.camera.width, cfg.camera.height = W, H
    cfg.orb.n_features = N_FEAT
    cfg.max_keyframes = 24
    cfg.max_landmarks = 2048
    cfg.running_mode = 0
    slam = viorb_tpu.System(cfg, sensor=viorb_tpu.MONOCULAR)

    traj = synthetic.circle_trajectory(duration=4.0, imu_rate=200.0)
    sim = FeatureSim()
    for k in range(0, 800, 10):
        fd = sim.frame(traj.p[k], traj.Rwb[k])
        slam._timed_track(lambda: slam.pipeline.track_features(fd, float(traj.t[k])))
    assert slam.tracking_state == OK
    n_kfs, n_lms = slam.map_changed_counters
    assert n_kfs >= 2 and n_lms >= 100

    # trajectory savers
    p1 = tmp_path / "kf.txt"
    p2 = tmp_path / "frames.txt"
    p3 = tmp_path / "kitti.txt"
    p4 = tmp_path / "navstate.txt"
    slam.save_keyframe_trajectory_tum(str(p1))
    slam.save_trajectory_tum(str(p2))
    slam.save_trajectory_kitti(str(p3))
    slam.save_keyframe_trajectory_navstate(str(p4))
    kf_rows = np.loadtxt(p1)
    assert kf_rows.shape == (n_kfs, 8)
    fr_rows = np.loadtxt(p2)
    assert fr_rows.shape[1] == 8 and len(fr_rows) >= 70
    ki_rows = np.loadtxt(p3)
    assert ki_rows.shape[1] == 12
    ns_rows = np.loadtxt(p4)
    assert ns_rows.shape == (n_kfs, 17)
    # quaternions normalized in TUM output
    assert np.allclose(np.linalg.norm(kf_rows[:, 4:8], axis=1), 1.0, atol=1e-5)

    # timing report covers the tracked stages
    rep = slam.shutdown()
    assert "track_total" in rep
    assert slam.get_time_of("track_total") > 0

    # map checkpoint / resume (reference TODO System.h:185-187)
    mp = tmp_path / "map.npz"
    slam.save_map(str(mp))
    before = np.asarray(slam.pipeline.map.lms.pos)
    slam.pipeline.map = ma.empty_map(slam.pipeline.cap)
    slam.load_map(str(mp))
    after = np.asarray(slam.pipeline.map.lms.pos)
    assert np.array_equal(before, after)
    assert slam.map_changed_counters == (n_kfs, n_lms)

    # tracking continues on the restored map
    fd = sim.frame(traj.p[800], traj.Rwb[800])
    st = slam._timed_track(lambda: slam.pipeline.track_features(fd, float(traj.t[800])))
    assert st["state"] == OK
