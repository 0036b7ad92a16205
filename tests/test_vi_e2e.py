"""End-to-end monocular visual-inertial SLAM on a synthetic sequence:
vision bootstrap -> VIO initialization (scale/gravity/bias) -> NavState
tracking with IMU + VI local BA. Metric-scale trajectory accuracy checked
WITHOUT scale alignment (the point of VI over mono)."""

import numpy as np

from tests.test_mono_e2e import CAM, H, N_FEAT, W, FeatureSim
from viorb_tpu.io import evaluate, synthetic
from viorb_tpu.map import arrays as ma
from viorb_tpu.ops import imu as imu_ops
from viorb_tpu.pipeline.system import OK
from viorb_tpu.pipeline.vi_system import ViMonoSystem

BG = np.array([0.003, -0.002, 0.004])
BA = np.array([-0.02, 0.03, 0.04])


def test_vi_e2e_known_extrinsics():
    rng = np.random.default_rng(7)
    traj = synthetic.circle_trajectory(duration=12.0, imu_rate=200.0,
                                       pitch_amp=0.3, roll_amp=0.25)
    traj = synthetic.add_imu_noise(traj, rng, bg=BG, ba=BA)
    sim = FeatureSim()
    ext = sim.ext  # Rbc euroc-like, pbc = 0

    cap = ma.Capacities(max_kfs=64, max_lms=2048, n_feat=N_FEAT)
    sys_ = ViMonoSystem(
        CAM, W, H, cap=cap,
        noise=imu_ops.ImuNoise.from_sigmas(**imu_ops.EUROC_NOISE),
        Rbc=ext.Rbc, pbc=ext.pbc,
        estimate_extrinsics=False,
        min_init_kfs=8,
        force_init_after_s=5.0,
        local_window=5, fixed_window=6,
    )

    stride = 10  # 20 Hz camera
    dt = 1.0 / 200.0
    n = len(traj.gyro)
    inited_at = None
    for k in range(0, n, stride):
        ts = float(traj.t[k])
        fd = sim.frame(traj.p[k], traj.Rwb[k])
        lo = max(k - stride, 0)
        chunk = np.concatenate(
            [traj.gyro[lo:k], traj.acc[lo:k], np.full((k - lo, 1), dt)], axis=1
        ) if k > 0 else np.zeros((0, 7))
        st = sys_.track(fd, chunk, ts)
        assert sys_.state != "LOST", (k, st)
        if sys_.vins_inited and inited_at is None:
            inited_at = ts

    assert sys_.vins_inited, "VIO never initialized"
    assert sys_.state == OK

    # scale recovered: the sim's vision map was normalized to median depth 1
    # at bootstrap; after UpdateScale the map must be metric. Check by
    # comparing estimated camera centers to ground truth WITHOUT scale
    # alignment (rigid alignment only).
    ftraj = sys_.frame_trajectory()
    sel = [(t, R, tt) for (t, R, tt) in ftraj if t >= (inited_at or 0)]
    est_ts = np.array([t for t, _, _ in sel])
    est_c = np.array([(-R.T @ t) for _, R, t in sel])
    rmse, scale, _ = evaluate.ate_rmse(
        est_ts, est_c, np.asarray(traj.t), np.asarray(traj.p), with_scale=False
    )
    assert abs(sys_.scale) > 0
    assert rmse < 0.15, (rmse, sys_.scale)

    # gravity: the map world frame is the first keyframe's camera frame, so
    # only the magnitude is frame-independent
    g = np.asarray(sys_.gravity)
    assert abs(np.linalg.norm(g) - 9.81) < 0.05, g
    # biases
    np.testing.assert_allclose(np.asarray(sys_.bg), BG, atol=1e-3)
    np.testing.assert_allclose(np.asarray(sys_.ba_), BA, atol=0.05)
