"""The tracking fallback ladder (round-2 VERDICT items 3/8).

- Vision: when motion-model matching collapses, TrackReferenceKeyFrame
  (Tracking.cc:1141, :1921-1982) rescues the frame via BoW matching against
  the reference keyframe's landmarks.
- VI: frames between keyframes run the frame-to-frame VI pose optimization
  with the 15-dim marginalization prior (Tracking.cc:1049-1062
  bMapUpdated=false branch, Optimizer.cc:600-977) — the prior machinery is
  live, not dead code; and the WithIMU ref-KF rung rescues sabotaged
  motion-model matching.
"""

import numpy as np

import jax.numpy as jnp

from tests.test_mono_e2e import CAM, H, N_FEAT, W, FeatureSim
from viorb_tpu.io import synthetic
from viorb_tpu.map import arrays as ma
from viorb_tpu.ops import imu as imu_ops
from viorb_tpu.pipeline.system import LOST, OK, MonoSystem
from viorb_tpu.pipeline.vi_system import ViMonoSystem


def _run_mono(n_frames=60, seed=0):
    traj = synthetic.circle_trajectory(duration=6.0, imu_rate=200.0)
    sim = FeatureSim(seed=seed)
    cap = ma.Capacities(max_kfs=32, max_lms=2048, n_feat=N_FEAT)
    sys_ = MonoSystem(
        CAM, W, H, cap=cap, local_window=5, fixed_window=6,
        enable_loop_closing=False,
    )
    k = 0
    for k in range(0, n_frames * 10, 10):
        sys_.track_features(sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k]))
        if sys_.state == OK and int(sys_.map.n_kfs) >= 4:
            break
    assert sys_.state == OK
    return sys_, sim, traj, k + 10


def test_vision_ref_kf_rung_rescues_tracking():
    sys_, sim, traj, k = _run_mono()
    # sabotage the motion-model rung: wipe the last frame's associations so
    # the projection search has zero queries
    sys_.last["assoc"] = jnp.full_like(sys_.last["assoc"], -1)
    st = sys_.track_features(
        sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k])
    )
    assert st.get("ref_kf_rung") is True, st
    assert sys_.state == OK, st
    assert st["n_inliers"] >= 10, st
    # and tracking continues normally afterwards
    st2 = sys_.track_features(
        sim.frame(traj.p[k + 10], traj.Rwb[k + 10]), float(traj.t[k + 10])
    )
    assert sys_.state == OK and st2.get("ref_kf_rung") is False, st2


def test_vision_ladder_exhausted_goes_lost():
    """With motion model AND ref-KF matching sabotaged (junk frame), the
    ladder runs out and the state machine goes LOST (not a crash)."""
    sys_, sim, traj, k = _run_mono(seed=1)
    rng = np.random.default_rng(99)
    junk = sim.frame(traj.p[k] + 50.0, traj.Rwb[k])  # far off-map pose
    # junk frame sees nothing from the map: randomize its descriptors
    f = junk.feats
    pm1 = jnp.asarray(
        np.where(rng.integers(0, 2, (N_FEAT, 256)), 1, -1), jnp.int8
    )
    junk = junk._replace(feats=f._replace(desc_pm1=pm1))
    sys_.track_features(junk, float(traj.t[k]))
    assert sys_.state == LOST


BG = np.array([0.003, -0.002, 0.004])
BA = np.array([-0.02, 0.03, 0.04])


def _run_vi(duration=12.0, seed=7):
    rng = np.random.default_rng(seed)
    traj = synthetic.circle_trajectory(
        duration=duration, imu_rate=200.0, pitch_amp=0.3, roll_amp=0.25
    )
    traj = synthetic.add_imu_noise(traj, rng, bg=BG, ba=BA)
    sim = FeatureSim()
    cap = ma.Capacities(max_kfs=64, max_lms=2048, n_feat=N_FEAT)
    sys_ = ViMonoSystem(
        CAM, W, H, cap=cap,
        noise=imu_ops.ImuNoise.from_sigmas(**imu_ops.EUROC_NOISE),
        Rbc=sim.ext.Rbc, pbc=sim.ext.pbc,
        estimate_extrinsics=False, min_init_kfs=8,
        force_init_after_s=5.0, local_window=5, fixed_window=6,
    )
    return sys_, sim, traj


def test_vi_frame_prior_path_live():
    """Between keyframes the VI tracker takes the frame-to-frame branch
    with the marginalization prior (vs_kf=False) and stays accurate."""
    sys_, sim, traj = _run_vi()
    stride, dt = 10, 1.0 / 200.0
    n = len(traj.gyro)
    vs_kf_flags = []
    for k in range(0, n, stride):
        ts = float(traj.t[k])
        fd = sim.frame(traj.p[k], traj.Rwb[k])
        lo = max(k - stride, 0)
        chunk = np.concatenate(
            [traj.gyro[lo:k], traj.acc[lo:k], np.full((k - lo, 1), dt)], 1
        ) if k > 0 else np.zeros((0, 7))
        st = sys_.track(fd, chunk, ts)
        assert sys_.state != LOST, (k, st)
        if sys_.vins_inited and "vs_kf" in st:
            vs_kf_flags.append(bool(st["vs_kf"]))
    assert sys_.vins_inited
    # the prior path must have actually run: some frames tracked vs the
    # last FRAME (map unchanged), some vs the last KEYFRAME (map updated)
    assert any(not f for f in vs_kf_flags), "frame-prior branch never taken"
    assert any(vs_kf_flags), "vs-keyframe branch never taken"
    # prior information is populated and positive semidefinite-ish
    info = np.asarray(sys_.prior_info)
    assert np.isfinite(info).all() and np.trace(info) > 0


def test_vi_ref_kf_rung_rescues_tracking():
    sys_, sim, traj = _run_vi()
    stride, dt = 10, 1.0 / 200.0
    n = len(traj.gyro)
    k_inited = None
    for k in range(0, n, stride):
        ts = float(traj.t[k])
        fd = sim.frame(traj.p[k], traj.Rwb[k])
        lo = max(k - stride, 0)
        chunk = np.concatenate(
            [traj.gyro[lo:k], traj.acc[lo:k], np.full((k - lo, 1), dt)], 1
        ) if k > 0 else np.zeros((0, 7))
        sys_.track(fd, chunk, ts)
        if sys_.vins_inited:
            k_inited = k
            break
    assert k_inited is not None
    # sabotage the motion-model rung for the next frame
    sys_.last["assoc"] = jnp.full_like(sys_.last["assoc"], -1)
    k = k_inited + stride
    chunk = np.concatenate(
        [traj.gyro[k - stride:k], traj.acc[k - stride:k],
         np.full((stride, 1), dt)], 1
    )
    st = sys_.track(sim.frame(traj.p[k], traj.Rwb[k]), chunk, float(traj.t[k]))
    assert st.get("ref_kf_rung") is True, st
    assert sys_.state == OK, st
