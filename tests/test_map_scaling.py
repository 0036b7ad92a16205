"""Map capacity strategy (round-2 VERDICT item 5): landmark slot reuse
after culling, loud overflow, and large-map (512-KF-scale) graph ops that
previously used O(K^2 L) host temps."""

import logging

import numpy as np

import jax.numpy as jnp

from tests.test_mono_e2e import CAM, H, N_FEAT, W, FeatureSim
from viorb_tpu.io import synthetic
from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline import local_mapping, loop_closing
from viorb_tpu.pipeline.system import OK, MonoSystem


def test_landmark_slot_reuse():
    """Culled landmark slots are recycled by add_landmarks."""
    cap = ma.Capacities(max_kfs=4, max_lms=64, n_feat=16)
    m = ma.empty_map(cap)
    T = 16

    def add(m, ok_mask):
        return ma.add_landmarks(
            m,
            pos=jnp.ones((T, 3)) * 2.0,
            pm1=jnp.ones((T, 256), jnp.int8),
            normal=jnp.ones((T, 3)) / np.sqrt(3.0),
            dist_min=jnp.ones((T,)),
            dist_max=jnp.full((T,), 4.0),
            kf_a=jnp.asarray(0),
            kf_b=jnp.asarray(1),
            feat_a=jnp.arange(T),
            feat_b=jnp.arange(T),
            ok=jnp.asarray(ok_mask),
        )

    m = add(m, np.ones(T, bool))
    assert int(m.lms.valid.sum()) == 16
    # cull slots 3..8 (simulating MapPointCulling)
    valid = np.array(m.lms.valid)
    valid[3:9] = False
    m = m._replace(lms=m.lms._replace(valid=jnp.asarray(valid)))
    m = add(m, np.ones(T, bool))
    # 16 - 6 + 16 = 26 valid; 6 candidates reuse slots 3..8, the other 10
    # take fresh slots 16..25 -> high-water mark 26 (NOT 32: reuse does
    # not grow the table)
    assert int(m.lms.valid.sum()) == 26
    assert int(m.n_lms) == 26
    # reused slots carry the NEW data
    assert float(m.lms.pos[3, 0]) == 2.0 and bool(m.lms.valid[3])


def test_overflow_is_loud(caplog):
    """Filling the landmark table logs an error instead of silently
    dropping triangulations; the KF gate logs too."""
    traj = synthetic.circle_trajectory(duration=6.0, imu_rate=200.0)
    sim = FeatureSim(seed=3)
    # tiny capacities force both overflows quickly
    cap = ma.Capacities(max_kfs=6, max_lms=512, n_feat=N_FEAT)
    sys_ = MonoSystem(
        CAM, W, H, cap=cap, local_window=3, fixed_window=3,
        enable_loop_closing=False,
    )
    with caplog.at_level(logging.ERROR, logger="viorb_tpu"):
        for k in range(0, 1200, 10):
            sys_.track_features(
                sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k])
            )
            if sys_.state == "LOST":
                break
    assert sys_.kf_overflows > 0
    assert any("keyframe table full" in r.message for r in caplog.records)


def test_assoc_references_stay_valid():
    """Invariant required for safe slot reuse: every assoc entry >= 0
    points at a valid landmark (culls clear their references)."""
    traj = synthetic.circle_trajectory(duration=8.0, imu_rate=200.0)
    sim = FeatureSim(seed=5)
    cap = ma.Capacities(max_kfs=32, max_lms=1024, n_feat=N_FEAT)
    sys_ = MonoSystem(
        CAM, W, H, cap=cap, local_window=4, fixed_window=4,
        enable_loop_closing=False,
    )
    for k in range(0, 1600, 10):
        sys_.track_features(sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k]))
        assert sys_.state != "LOST"
    assert sys_.state == OK
    m = sys_.map
    assoc = np.asarray(m.assoc)
    lm_valid = np.asarray(m.lms.valid)
    kf_valid = np.asarray(m.kfs.valid)
    refs = assoc[kf_valid]
    refs = refs[refs >= 0]
    assert lm_valid[refs].all(), "stale assoc entry at a culled landmark"


def test_large_map_graph_ops():
    """512-KF / 64k-landmark map: covisibility matrix, redundancy,
    dedup+recount and essential-graph construction complete with bounded
    memory (the MXU-matmul path; no (K,K,L) temps)."""
    K, L, N = 512, 65536, 64
    rng = np.random.default_rng(0)
    cap = ma.Capacities(max_kfs=K, max_lms=L, n_feat=N)
    m = ma.empty_map(cap)
    # chain covisibility: KF k observes landmarks [32k, 32k+64)
    assoc = (np.arange(K)[:, None] * 32 + np.arange(N)[None, :]).astype(np.int32)
    assoc = np.minimum(assoc, L - 2)
    m = m._replace(
        assoc=jnp.asarray(assoc),
        kfs=m.kfs._replace(
            valid=jnp.ones((K,), bool),
            feat_valid=jnp.ones((K, N), bool),
            Rcw=m.kfs.Rcw,
            tcw=jnp.asarray(
                rng.normal(0, 1, (K, 3)).astype(np.float32)
            ),
        ),
        lms=m.lms._replace(valid=jnp.ones((L,), bool)),
        n_kfs=jnp.asarray(K, jnp.int32),
        n_lms=jnp.asarray(L, jnp.int32),
    )
    cv = np.asarray(ma.covisibility_matrix(m))
    assert cv.shape == (K, K)
    assert cv[0, 0] == 64 and cv[0, 1] == 32 and cv[0, 3] == 0

    m2 = local_mapping.dedup_and_recount(m)
    # every landmark in [0, 32*511+64) observed; shared ones have 2 obs
    assert int(m2.lms.n_obs[32]) == 2
    red = np.asarray(local_mapping.keyframe_redundancy(m2))
    assert red.shape == (K,)

    graph = loop_closing.build_essential_graph(
        m2, K, [(K - 1, 0, np.eye(3), np.zeros(3), 1.0)], covis_threshold=40
    )
    assert int(graph.i_idx.shape[0]) >= K  # temporal chain + loop edge
    assert np.isfinite(np.asarray(graph.t_ij)).all()
