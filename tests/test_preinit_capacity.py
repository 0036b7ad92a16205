"""Pre-init keyframe capacity under pressure (round-4 VERDICT #8).

The reference's keyframe store is unbounded (`Map::AddKeyFrame`,
/root/reference/src/Map.cc:32-35); ours is a fixed table with culling +
compaction + a pressure-gated pre-init cull (`vi_system._may_cull`). This
test drives a LONG pre-init phase (online calibration never force-inits)
into a deliberately small table and asserts:

1. insertion never stops (no keyframe-table overflow),
2. the pressure culling's IMU-interval merging keeps the preintegration
   chain consistent enough that the online Rbc/pbc calibration STILL
   converges to the true extrinsics — the failure mode of round 4, where
   table starvation (HEAD~1) or cull-time interval merging (HEAD) killed
   the headline feature end to end.
"""

import numpy as np

from tests.test_mono_e2e import CAM, H, N_FEAT, W, FeatureSim
from viorb_tpu.io import synthetic
from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline import vio_init
from viorb_tpu.pipeline.vi_system import ViMonoSystem

PBC_TRUE = np.array([0.02, -0.06, 0.01])


def test_preinit_capacity_calibration_converges():
    traj = synthetic.circle_trajectory(
        duration=16.0, imu_rate=200.0,
        pitch_amp=0.3, roll_amp=0.25, yaw_amp=0.35,
    )
    sim = FeatureSim(seed=5)
    # nonzero lever arm so the pbc estimate is a real recovery, not a zero
    sim.ext = synthetic.Extrinsics(Rbc=sim.ext.Rbc, pbc=PBC_TRUE.copy())

    # 20 slots vs ~160 insertion opportunities (0.1 s cadence over 16 s):
    # sustained table pressure for the whole pre-init phase
    cap = ma.Capacities(max_kfs=20, max_lms=2048, n_feat=N_FEAT)
    sys_ = ViMonoSystem(
        CAM, W, H, cap=cap,
        Rbc=None, pbc=None, estimate_extrinsics=True,
        min_init_kfs=8, local_window=5, fixed_window=6,
        enable_loop_closing=False,
        min_kf_gap_s=0.1,
    )

    stride = 10
    dt = 1.0 / 200.0
    n = len(traj.gyro)
    for k in range(0, n, stride):
        ts = float(traj.t[k])
        fd = sim.frame(traj.p[k], traj.Rwb[k])
        lo = max(k - stride, 0)
        chunk = (
            np.concatenate(
                [traj.gyro[lo:k], traj.acc[lo:k], np.full((k - lo, 1), dt)],
                axis=1,
            )
            if k > 0
            else np.zeros((0, 7))
        )
        sys_.track(fd, chunk, ts)
        assert sys_.state != "LOST", (k, ts)
    sys_.finish()

    # 1. capacity policy held: insertion never stopped
    assert sys_.kf_overflows == 0
    # the pressure actually happened (culling + slot recycling engaged)
    assert sys_.n_compactions >= 1, sys_.n_compactions
    assert sys_.n_kf_insertions > cap.max_kfs, sys_.n_kf_insertions

    # 2. the calibration converged under the reference's own gating
    assert sys_.vins_inited, "calibration starved by table pressure"
    Rbc_est = np.asarray(sys_.Rcb).T
    pbc_est = -Rbc_est @ np.asarray(sys_.pcb)
    R_err = Rbc_est.T @ np.asarray(sim.ext.Rbc)
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 1.0, f"Rbc error {ang:.3f} deg"
    assert np.abs(pbc_est - PBC_TRUE).max() < 0.03, pbc_est

    # 3. interval-merge consistency: stored preintegration dt's between
    # consecutive live keyframes must match their timestamp gaps (the
    # reference's own runtime assertion, LocalMapping.cc:1079-1089)
    live = np.where(sys_._kf_valid_cache[: sys_._n_kfs_cache])[0]
    dts = np.asarray(sys_.pre.dt)
    ts_cache = sys_._kf_ts_cache
    for a, b in zip(live[:-1], live[1:]):
        gap = ts_cache[b] - ts_cache[a]
        assert abs(float(dts[b]) - gap) < 1e-3, (a, b, float(dts[b]), gap)
