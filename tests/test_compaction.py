"""Keyframe-slot compaction: culled slots are reclaimed so a fixed-capacity
table supports unbounded insertions (round-2 VERDICT item 7 — the array-map
analog of the reference's unbounded Map::AddKeyFrame + KeyFrame::SetBadFlag
erasure, src/LocalMapping.cc:2692, src/KeyFrame.cc:1070-1110).

Checks: device-table renumbering, host mirrors, frame-trajectory
re-anchoring through culled references, and continued tracking + insertion
after compaction.
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_mono_e2e import CAM, H, N_FEAT, W, FeatureSim
from viorb_tpu.io import evaluate, synthetic
from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline.system import OK, MonoSystem


def _run(sys_, sim, traj, lo, hi, stride=10):
    for k in range(lo, hi, stride):
        sys_.track_features(sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k]))
    sys_.finish()


def test_compaction_preserves_trajectory_and_keeps_inserting():
    traj = synthetic.circle_trajectory(duration=10.0, imu_rate=200.0)
    sim = FeatureSim()
    cap = ma.Capacities(max_kfs=24, max_lms=2048, n_feat=N_FEAT)
    sys_ = MonoSystem(
        CAM, W, H, cap=cap, local_window=5, fixed_window=6,
        enable_loop_closing=False,
    )
    _run(sys_, sim, traj, 0, 1000)
    assert sys_.state == OK
    n_before = sys_._n_kfs_cache
    assert n_before >= 6

    # manufacture holes: cull two mid-sequence keyframes the way
    # KeyFrameCulling would (never the origin or the newest)
    for k in (2, 4):
        sys_.map = sys_._k.cull_kf(sys_.map, jnp.asarray(k, jnp.int32))
        sys_._kf_valid_cache[k] = False

    traj_before = [
        (t, R.copy(), p.copy())
        for t, R, p in [
            (t, np.asarray(R), np.asarray(tt))
            for t, R, tt in sys_.frame_trajectory()
        ]
    ]

    n_live_expected = int(sys_._kf_valid_cache[:n_before].sum())
    assert sys_._compact_keyframes()
    n_live = sys_._n_kfs_cache
    assert n_live == n_live_expected
    assert n_live <= n_before - 2
    valid = np.asarray(sys_.map.kfs.valid)
    assert valid[:n_live].all() and not valid[n_live:].any()
    assert int(sys_.map.n_kfs) == n_live

    # the composed frame trajectory is unchanged by renumbering: frames
    # whose reference was culled re-anchored exactly
    traj_after = sys_.frame_trajectory()
    assert len(traj_after) == len(traj_before)
    for (t0, R0, p0), (t1, R1, p1) in zip(traj_before, traj_after):
        assert t0 == t1
        np.testing.assert_allclose(np.asarray(R1), R0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(p1), p0, atol=1e-4)

    # tracking continues and new keyframes land in recycled slots
    ins_before = sys_.n_kf_insertions
    _run(sys_, sim, traj, 1000, 2000)
    assert sys_.state == OK
    assert sys_.n_kf_insertions > ins_before
    assert sys_._n_kfs_cache <= cap.max_kfs

    ft = sys_.frame_trajectory()
    est_ts = np.array([t for t, _, _ in ft])
    est_c = np.array([(-np.asarray(R).T @ np.asarray(t)) for _, R, t in ft])
    rmse, _, _ = evaluate.ate_rmse(
        est_ts, est_c, np.asarray(traj.t), np.asarray(traj.p)
    )
    assert rmse < 0.08, rmse


def test_capacity_overflow_triggers_compaction():
    """At the table cap, _check_kf_capacity compacts instead of refusing:
    300+ insertions fit a small table as long as culling keeps the live
    count bounded."""
    traj = synthetic.circle_trajectory(duration=10.0, imu_rate=200.0)
    sim = FeatureSim(seed=5)
    cap = ma.Capacities(max_kfs=24, max_lms=2048, n_feat=N_FEAT)
    sys_ = MonoSystem(
        CAM, W, H, cap=cap, local_window=5, fixed_window=6,
        enable_loop_closing=False,
    )
    _run(sys_, sim, traj, 0, 1200)
    assert sys_.state == OK
    # fill the table artificially: mark half the keyframes culled, then
    # push the append cursor to the cap and ask for capacity
    n = sys_._n_kfs_cache
    for k in range(2, n - 2, 2):
        sys_.map = sys_._k.cull_kf(sys_.map, jnp.asarray(k, jnp.int32))
        sys_._kf_valid_cache[k] = False
    sys_._n_kfs_cache = cap.max_kfs - 1  # simulate a full cursor
    sys_.map = sys_.map._replace(n_kfs=jnp.asarray(cap.max_kfs - 1, jnp.int32))
    assert sys_._check_kf_capacity()  # compaction made room
    assert sys_.n_compactions == 1
    assert sys_._n_kfs_cache < cap.max_kfs - 1
