"""SearchInNeighbors / ORBmatcher::Fuse + distinctive descriptors
(round-2 VERDICT item 4): duplicate landmarks created by triangulating
against multiple neighbors collapse to one, and landmark descriptors are
refreshed to the min-median-Hamming observation."""

import numpy as np

import jax.numpy as jnp

from tests.test_mono_e2e import CAM, H, N_FEAT, W, FeatureSim
from viorb_tpu.io import synthetic
from viorb_tpu.map import arrays as ma
from viorb_tpu.ops.orb import OrbFeatures
from viorb_tpu.pipeline import local_mapping
from viorb_tpu.pipeline.system import OK, MonoSystem


def _mini_map(n_feat=64, max_lms=128, n_kfs=3):
    """Two keyframes observing the same 3D points; landmark table holds a
    DUPLICATE pair for point 0 (one seen by KF0, one by KF1)."""
    rng = np.random.default_rng(0)
    cap = ma.Capacities(max_kfs=n_kfs + 1, max_lms=max_lms, n_feat=n_feat)
    m = ma.empty_map(cap)

    # 8 points in front of both cameras
    P = np.stack(
        [rng.uniform(-1, 1, 8), rng.uniform(-1, 1, 8), rng.uniform(4, 6, 8)], -1
    )
    bits = rng.integers(0, 2, (8, 256)).astype(bool)
    pm1 = np.where(bits, 1, -1).astype(np.int8)

    def make_kf(m, Rcw, tcw, assoc_row):
        Pc = P @ Rcw.T + tcw
        uv = np.stack(
            [CAM.fx * Pc[:, 0] / Pc[:, 2] + CAM.cx,
             CAM.fy * Pc[:, 1] / Pc[:, 2] + CAM.cy], -1
        )
        xy = np.zeros((n_feat, 2), np.float32)
        xy[:8] = uv
        d = np.zeros((n_feat, 256), np.int8)
        d[:8] = pm1
        valid = np.zeros(n_feat, bool)
        valid[:8] = True
        feats = OrbFeatures(
            xy=jnp.asarray(xy), response=jnp.asarray(valid, jnp.float32),
            octave=jnp.zeros(n_feat, jnp.int32),
            angle=jnp.zeros(n_feat, jnp.float32),
            sigma2=jnp.ones(n_feat, jnp.float32),
            desc=jnp.zeros((n_feat, 32), jnp.uint8),
            desc_pm1=jnp.asarray(d),
            valid=jnp.asarray(valid),
        )
        return ma.add_keyframe(
            m, jnp.asarray(Rcw, jnp.float32), jnp.asarray(tcw, jnp.float32),
            feats, feats.xy, 0.0, jnp.asarray(assoc_row, jnp.int32),
        )

    # landmarks: ids 0..7 = the true points (created from KF0); id 8 = a
    # DUPLICATE of point 0 registered only in KF1's row
    a0 = np.full(n_feat, -1, np.int32)
    a0[:8] = np.arange(8)
    m = make_kf(m, np.eye(3), np.zeros(3), a0)
    R1 = np.eye(3)
    t1 = np.array([0.3, 0.0, 0.0])
    a1 = np.full(n_feat, -1, np.int32)
    a1[1:8] = np.arange(1, 8)
    a1[0] = 8  # the duplicate
    m = make_kf(m, R1, t1, a1)

    lms = m.lms
    pos9 = np.vstack([P, P[0:1] + 0.01])
    pm9 = np.vstack([pm1, pm1[0:1]])
    d0 = np.linalg.norm(pos9, axis=-1)
    lms = lms._replace(
        pos=lms.pos.at[:9].set(jnp.asarray(pos9, jnp.float32)),
        pm1=lms.pm1.at[:9].set(jnp.asarray(pm9)),
        normal=lms.normal.at[:9].set(
            jnp.asarray(pos9 / d0[:, None], jnp.float32)
        ),
        # MapPoint-ctor convention (level-0 first sight): dmax = d * 1.2^0
        dist_min=lms.dist_min.at[:9].set(jnp.asarray(d0 / 1.2**7, jnp.float32)),
        dist_max=lms.dist_max.at[:9].set(jnp.asarray(d0, jnp.float32)),
        n_obs=lms.n_obs.at[:9].set(
            jnp.asarray([2, 2, 2, 2, 2, 2, 2, 2, 1], jnp.int32)
        ),
        valid=lms.valid.at[:9].set(True),
    )
    return m._replace(lms=lms, n_lms=jnp.asarray(9, jnp.int32))


def test_fuse_collapses_duplicate():
    m = _mini_map()
    # fuse candidates seen by KF1 into KF0: the duplicate (id 8, observed
    # only by KF1) projects onto KF0's feature 0, which holds landmark 0
    cand = ma.landmarks_of_keyframes(m, jnp.asarray([1, -1], jnp.int32))
    m2 = local_mapping.fuse_into_keyframe(
        m, jnp.asarray(0, jnp.int32), cand, CAM, float(W), float(H)
    )
    m2 = local_mapping.dedup_and_recount(m2)

    valid = np.asarray(m2.lms.valid)
    assert not valid[8], "duplicate landmark must be invalidated"
    assert valid[0], "winner (more observations) must survive"
    # KF1's feature 0 now points at the surviving landmark
    assert int(m2.assoc[1, 0]) == 0
    # observation counts recounted: landmark 0 observed by both keyframes
    assert int(m2.lms.n_obs[0]) == 2
    # no keyframe row contains a landmark twice
    for k in range(2):
        row = np.asarray(m2.assoc[k])
        row = row[row >= 0]
        assert len(row) == len(set(row.tolist())), k


def test_fuse_adds_missing_observation():
    m = _mini_map()
    # remove KF0's observation of landmark 3: fusing KF1's landmarks into
    # KF0 must re-add it (the free-feature arm of Fuse)
    assoc = np.array(m.assoc)
    assoc[0, 3] = -1
    m = m._replace(assoc=jnp.asarray(assoc))
    m = local_mapping.dedup_and_recount(m)
    assert int(m.lms.n_obs[3]) == 1
    cand = ma.landmarks_of_keyframes(m, jnp.asarray([1, -1], jnp.int32))
    m2 = local_mapping.fuse_into_keyframe(
        m, jnp.asarray(0, jnp.int32), cand, CAM, float(W), float(H)
    )
    m2 = local_mapping.dedup_and_recount(m2)
    assert int(m2.assoc[0, 3]) == 3
    assert int(m2.lms.n_obs[3]) == 2


def test_distinctive_descriptor_refresh():
    """A landmark whose stored descriptor is stale moves to the
    min-median-Hamming observation (MapPoint.cc:257)."""
    m = _mini_map()
    # corrupt the stored descriptor of landmark 2 (as if frozen at a bad
    # creation view); both observations still carry the true descriptor
    rng = np.random.default_rng(3)
    junk = np.where(rng.integers(0, 2, 256), 1, -1).astype(np.int8)
    true_desc = np.asarray(m.kfs.feat_pm1[0, 2])
    m = m._replace(lms=m.lms._replace(pm1=m.lms.pm1.at[2].set(jnp.asarray(junk))))
    m2 = local_mapping.compute_distinctive_descriptors(m)
    new = np.asarray(m2.lms.pm1[2])
    assert (new == true_desc).all(), "descriptor must be refreshed"
    # untouched landmark keeps a descriptor equal to its observations
    assert (np.asarray(m2.lms.pm1[1]) == np.asarray(m.kfs.feat_pm1[0, 1])).all()


def test_e2e_duplicates_stay_bounded():
    """Over a mono run with fuse active, no keyframe row holds the same
    landmark twice, and near-identical landmark pairs (same descriptor,
    < 2 cm apart) stay rare."""
    traj = synthetic.circle_trajectory(duration=8.0, imu_rate=200.0)
    sim = FeatureSim(seed=2)
    cap = ma.Capacities(max_kfs=48, max_lms=2048, n_feat=N_FEAT)
    sys_ = MonoSystem(
        CAM, W, H, cap=cap, local_window=5, fixed_window=6,
        enable_loop_closing=False,
    )
    for k in range(0, 1600, 10):
        sys_.track_features(sim.frame(traj.p[k], traj.Rwb[k]), float(traj.t[k]))
        assert sys_.state != "LOST"
    assert sys_.state == OK
    m = sys_.map
    n = int(m.n_kfs)
    for k in range(n):
        row = np.asarray(m.assoc[k])
        row = row[row >= 0]
        assert len(row) == len(set(row.tolist())), f"dup obs in KF {k}"

    valid = np.asarray(m.lms.valid)
    pos = np.asarray(m.lms.pos)[valid]
    pm1 = np.asarray(m.lms.pm1)[valid].astype(np.int32)
    if len(pos) > 1:
        # same-descriptor, same-place pairs = unfused duplicates
        ham = (256 - pm1 @ pm1.T) // 2
        d2 = ((pos[:, None] - pos[None, :]) ** 2).sum(-1)
        dup = (ham < 20) & (d2 < 0.02**2)
        np.fill_diagonal(dup, False)
        frac = dup.any(1).mean()
        assert frac < 0.02, f"{frac:.3f} of landmarks have a near-duplicate"
