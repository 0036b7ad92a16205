"""Localization-only tracking mode (round-3 VERDICT missing #1).

Reference: `System::ActivateLocalizationMode` pauses LocalMapping and sets
`Tracking::mbOnlyTracking` (`/root/reference/include/System.h:150-152`,
`src/Tracking.cc:1017-1118`); the mbVO sub-mode keeps odometric tracking
alive when map matches collapse and tries to relocalize per frame
(`src/Tracking.cc:1246-1350`).
"""

import numpy as np
import pytest

from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline.system import MonoSystem, OK
from viorb_tpu.solver.ba import Camera

from test_mono_e2e import CAM, FeatureSim, H, N_FEAT, W
from viorb_tpu.io import evaluate, synthetic


@pytest.fixture(scope="module")
def built_map_system():
    """A MonoSystem with a map built over the full orbit, then revisited
    (same landmarks, later timestamps) in localization-only mode."""
    traj = synthetic.circle_trajectory(duration=10.0, imu_rate=200.0)
    sim = FeatureSim()
    cap = ma.Capacities(max_kfs=48, max_lms=2048, n_feat=N_FEAT)
    sys_ = MonoSystem(CAM, W, H, cap=cap, local_window=5, fixed_window=6)
    stride = 10
    for k in range(0, 2000, stride):
        sys_.track_features(sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k]))
    sys_.finish()
    assert sys_.state == OK
    return sys_, sim, traj, stride


def test_localization_mode_freezes_map(built_map_system):
    sys_, sim, traj, stride = built_map_system
    sys_.activate_localization_mode()
    n_ins0 = sys_.n_kf_insertions
    n_kfs0 = sys_._n_kfs_cache
    lms0 = np.asarray(sys_.map.lms.valid).sum()

    # revisit the first part of the orbit: same poses, shifted timestamps.
    # The end-of-build pose is ~a fraction of a revolution away from the
    # revisit start, so the first frames legitimately go through
    # relocalization against the FROZEN map — the reference's
    # load-then-localize flow (Tracking.cc:1031-1042).
    t_shift = float(traj.t[-1]) + 0.05
    states = []
    for k in range(0, 700, stride):
        st = sys_.track_features(
            sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k]) + t_shift
        )
        states.append(st["state"])
    sys_.finish()
    first_ok = states.index(OK)
    assert first_ok <= 10, states[:12]
    assert all(s == OK for s in states[first_ok:]), states

    # the map is frozen: no keyframes, no landmarks inserted
    assert sys_.n_kf_insertions == n_ins0
    assert sys_._n_kfs_cache == n_kfs0
    assert np.asarray(sys_.map.lms.valid).sum() == lms0

    # localization is accurate: Sim3-aligned ATE over the only-tracking
    # revisit segment stays small
    ft = [x for x in sys_.frame_trajectory() if x[0] >= t_shift]
    assert len(ft) >= 50
    p_est = np.stack([-np.asarray(R).T @ np.asarray(t) for _, R, t in ft])
    ts_est = np.array([x[0] for x in ft]) - t_shift
    rmse, _, _ = evaluate.ate_rmse(ts_est, p_est, traj.t, traj.p)
    assert rmse < 0.05, rmse

    sys_.deactivate_localization_mode()
    assert not sys_.only_tracking


def test_vo_submode_keeps_odometry_and_relocalizes(monkeypatch):
    """mbVO: map matches below 10 but >= 20 motion-model matches ->
    pose kept, vo_mode set, relocalization attempted on the newest
    pending frame; a later good frame clears vo_mode."""
    cap = ma.Capacities(max_kfs=8, max_lms=256, n_feat=64)
    sys_ = MonoSystem(CAM, W, H, cap=cap, enable_loop_closing=False)
    sys_.state = OK
    sys_.only_tracking = True

    reloc_calls = []
    monkeypatch.setattr(
        MonoSystem, "_vo_relocalize",
        lambda self, p: reloc_calls.append(p["ts"]) or False,
    )

    class Out:
        def __init__(self, scalars):
            self.scalars = np.asarray(scalars, np.int32)

    def pend_entry(ts, scalars):
        sys_.trajectory.append((ts, np.eye(3), np.zeros(3)))
        sys_.rel_trajectory.append((ts, 0, np.eye(3), np.zeros(3)))
        return dict(
            frame=None, ts=ts, out=Out(scalars),
            traj_idx=len(sys_.trajectory) - 1,
            rel_idx=len(sys_.rel_trajectory) - 1,
        )

    # map-match collapse with live odometry -> VO mode, trajectory kept
    sys_._pending = [pend_entry(1.0, [5, 30, 0, 0])]
    st = sys_._flush_decisions()
    assert st["state"] == OK and sys_.vo_mode and st.get("vo")
    assert reloc_calls == [1.0]
    assert len(sys_.trajectory) == 1  # odometric pose NOT truncated

    # map tracking resumes -> VO mode clears, still no keyframe inserted
    sys_._pending = [pend_entry(2.0, [80, 90, 0, 100])]
    st = sys_._flush_decisions()
    assert st["state"] == OK and not sys_.vo_mode
    assert not st.get("kf") and sys_.n_kf_insertions == 0

    # odometry collapse too -> LOST (and the garbage pose is dropped)
    sys_._pending = [pend_entry(3.0, [5, 8, 0, 0])]
    st = sys_._flush_decisions()
    assert st["state"] == "LOST"
    assert len(sys_.trajectory) == 2
