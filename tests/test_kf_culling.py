"""Keyframe culling (LocalMapping::KeyFrameCulling semantics, array form):
redundancy detection (>= 90% of landmarks seen by >= 3 other keyframes at
same-or-finer octave) and slot release."""

import jax.numpy as jnp
import numpy as np

from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline import local_mapping as lm


def tiny_map(n_kfs=5, n_lms=40, n_feat=50):
    cap = ma.Capacities(max_kfs=n_kfs + 2, max_lms=n_lms + 8, n_feat=n_feat)
    m = ma.empty_map(cap)
    return m, cap


def with_obs(m, obs):
    """obs: dict kf -> list of (feat_slot, lm_id, octave)."""
    assoc = np.full(m.assoc.shape, -1, np.int32)
    feat_valid = np.zeros(m.kfs.feat_valid.shape, bool)
    octave = np.zeros(m.kfs.feat_octave.shape, np.int32)
    kf_valid = np.zeros(m.kfs.valid.shape, bool)
    n_obs = np.zeros(m.lms.n_obs.shape, np.int32)
    lm_valid = np.zeros(m.lms.valid.shape, bool)
    n_kfs = 0
    for k, rows in obs.items():
        kf_valid[k] = True
        n_kfs = max(n_kfs, k + 1)
        for f, l, o in rows:
            assoc[k, f] = l
            feat_valid[k, f] = True
            octave[k, f] = o
            n_obs[l] += 1
            lm_valid[l] = True
    return m._replace(
        assoc=jnp.asarray(assoc),
        kfs=m.kfs._replace(
            feat_valid=jnp.asarray(feat_valid),
            feat_octave=jnp.asarray(octave),
            valid=jnp.asarray(kf_valid),
        ),
        lms=m.lms._replace(
            n_obs=jnp.asarray(n_obs), valid=jnp.asarray(lm_valid)
        ),
        n_kfs=jnp.asarray(n_kfs, jnp.int32),
    )


def test_redundant_kf_detected():
    m, _ = tiny_map()
    # landmarks 0..9 seen by KFs 0,1,2 (octave 0) and by KF 3 (octave 0):
    # KF 3 is fully redundant; KF 4 sees unique landmarks 20..29
    obs = {
        0: [(i, i, 0) for i in range(10)],
        1: [(i, i, 0) for i in range(10)],
        2: [(i, i, 0) for i in range(10)],
        3: [(i, i, 0) for i in range(10)],
        4: [(i, 20 + i, 0) for i in range(10)],
    }
    m = with_obs(m, obs)
    red = np.asarray(lm.keyframe_redundancy(m))
    assert red[:4].all()  # 0..3 mutually redundant (each has 3 supporters)
    assert not red[4]


def test_octave_gate_blocks_coarser_supporters():
    m, _ = tiny_map()
    # KF 3 observes at octave 0; supporters see the same landmarks only at
    # octave 2 (coarser than 0+1) -> they do NOT count (scale condition)
    obs = {
        0: [(i, i, 2) for i in range(10)],
        1: [(i, i, 2) for i in range(10)],
        2: [(i, i, 2) for i in range(10)],
        3: [(i, i, 0) for i in range(10)],
    }
    m = with_obs(m, obs)
    red = np.asarray(lm.keyframe_redundancy(m))
    assert not red[3]
    # KFs 0..2 observe at octave 2; KF 3's octave-0 observation supports
    # them (0 <= 2+1), but that's only 1+2 = 3 supporters each -> redundant
    assert red[:3].all()


def test_cull_keyframe_releases_slot():
    # Three observers: culling one leaves >= 2 observations per landmark,
    # so the landmarks survive and stay visible to covisibility queries.
    m, _ = tiny_map()
    obs = {
        0: [(i, i, 0) for i in range(10)],
        1: [(i, i, 0) for i in range(10)],
        2: [(i, i, 0) for i in range(10)],
    }
    m = with_obs(m, obs)
    n_obs_before = np.asarray(m.lms.n_obs)[:10]
    m2 = lm.cull_keyframe(m, 1)
    assert not bool(m2.kfs.valid[1])
    assert (np.asarray(m2.assoc[1]) == -1).all()
    np.testing.assert_array_equal(
        np.asarray(m2.lms.n_obs)[:10], n_obs_before - 1
    )
    assert np.asarray(m2.lms.valid)[:10].all()
    # covisibility queries no longer see the culled keyframe
    lm_mask = np.zeros(m2.lms.pos.shape[0], bool)
    lm_mask[:10] = True
    counts = np.asarray(ma.covisible_kf_counts(m2, jnp.asarray(lm_mask)))
    assert counts[1] == 0 and counts[0] == 10 and counts[2] == 10


def test_cull_keyframe_starves_two_observer_landmarks():
    # Two observers: culling one starves the landmarks (< 2 observations
    # left -> MapPoint::EraseObservation's nObs guard invalidates them and
    # erases them from the surviving keyframe, returning their slots to
    # the landmark free list).
    m, _ = tiny_map()
    obs = {
        0: [(i, i, 0) for i in range(10)],
        1: [(i, i, 0) for i in range(10)],
    }
    m = with_obs(m, obs)
    m2 = lm.cull_keyframe(m, 1)
    assert not np.asarray(m2.lms.valid)[:10].any()
    assert (np.asarray(m2.assoc[0]) == -1).all()
    lm_mask = np.zeros(m2.lms.pos.shape[0], bool)
    lm_mask[:10] = True
    counts = np.asarray(ma.covisible_kf_counts(m2, jnp.asarray(lm_mask)))
    assert counts[0] == 0 and counts[1] == 0


def test_redundancy_ignores_culled_supporters():
    m, _ = tiny_map()
    obs = {
        0: [(i, i, 0) for i in range(10)],
        1: [(i, i, 0) for i in range(10)],
        2: [(i, i, 0) for i in range(10)],
        3: [(i, i, 0) for i in range(10)],
    }
    m = with_obs(m, obs)
    assert np.asarray(lm.keyframe_redundancy(m))[3]
    m = lm.cull_keyframe(m, 0)
    # only 2 other observers remain -> no longer redundant
    assert not np.asarray(lm.keyframe_redundancy(m))[3]
