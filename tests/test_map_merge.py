"""Multi-session map merging (pipeline/map_merge.py): overlap detection,
cross-session Sim3, whole-session alignment, fusion, and joint global BA
(single-chip and landmark-sharded over a device mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.map import arrays as ma
from viorb_tpu.pipeline import map_merge as mm
from viorb_tpu.solver.ba import Camera
from viorb_tpu.utils import lie

CAM = Camera(fx=400.0, fy=400.0, cx=320.0, cy=240.0)
W, H = 640, 480


def _pose_of(a, radius=6.0):
    c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
    z = -c / np.linalg.norm(c)
    x = np.cross(np.array([0.0, 0.0, 1.0]), z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    Rcw = np.stack([x, y, z], 1).T
    return Rcw, -Rcw @ c


def build_session(angles, cloud, pm1_lm, world_R, world_t, world_s,
                  n_feat=160, seed=0):
    """MapArrays for keyframes at `angles` looking at the shared cloud;
    the session's private world frame is p_sess = s R p_true + t, with
    poses consistent with that frame."""
    rng = np.random.default_rng(seed)
    n_kfs = len(angles)
    L0 = len(cloud)
    cap = ma.Capacities(max_kfs=n_kfs + 2, max_lms=L0 + 8, n_feat=n_feat)
    m = ma.empty_map(cap)

    sess_cloud = world_s * cloud @ world_R.T + world_t
    assoc = np.full((cap.max_kfs, n_feat), -1, np.int32)
    feat_xy = np.zeros((cap.max_kfs, n_feat, 2), np.float32)
    feat_pm1 = np.zeros((cap.max_kfs, n_feat, 256), np.int8)
    feat_valid = np.zeros((cap.max_kfs, n_feat), bool)
    Rcw_all = np.zeros((n_kfs, 3, 3))
    tcw_all = np.zeros((n_kfs, 3))
    seen = np.zeros(L0, bool)

    for k, a in enumerate(angles):
        Rcw, tcw = _pose_of(a)
        # session-frame pose: x_cam = Rcw p_true + tcw
        #                          = Rcw (1/s R^T (p_sess - t)) + tcw
        R_e = Rcw @ world_R.T
        t_e = world_s * tcw - R_e @ world_t
        # (x_cam scaled by s — projection direction unchanged)
        Rcw_all[k], tcw_all[k] = R_e, t_e

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
        assoc[k, :n] = sel
        seen[sel] = True

    kfs = m.kfs._replace(
        Rcw=m.kfs.Rcw.at[:n_kfs].set(jnp.asarray(Rcw_all, jnp.float32)),
        tcw=m.kfs.tcw.at[:n_kfs].set(jnp.asarray(tcw_all, jnp.float32)),
        timestamp=m.kfs.timestamp.at[:n_kfs].set(
            jnp.arange(n_kfs, dtype=jnp.float32)),
        feat_xy=jnp.asarray(feat_xy),
        feat_pm1=jnp.asarray(feat_pm1),
        feat_valid=jnp.asarray(feat_valid),
        valid=jnp.zeros((cap.max_kfs,), bool).at[:n_kfs].set(True),
    )
    pos = np.zeros((cap.max_lms, 3), np.float32)
    pm1 = np.zeros((cap.max_lms, 256), np.int8)
    valid_lm = np.zeros(cap.max_lms, bool)
    pos[:L0] = sess_cloud
    pm1[:L0] = pm1_lm
    valid_lm[:L0] = seen
    lms = m.lms._replace(
        pos=jnp.asarray(pos), pm1=jnp.asarray(pm1),
        valid=jnp.asarray(valid_lm),
        n_obs=jnp.asarray(valid_lm, jnp.int32) * 3,
    )
    return m._replace(
        kfs=kfs, lms=lms, assoc=jnp.asarray(assoc),
        n_kfs=jnp.asarray(n_kfs, jnp.int32),
        n_lms=jnp.asarray(L0, jnp.int32),
    )


@pytest.fixture(scope="module")
def two_sessions():
    rng = np.random.default_rng(7)
    L0 = 300
    cloud = rng.normal(0, 1.2, (L0, 3))
    cloud[:, 2] *= 0.5
    pm1_lm = np.where(rng.integers(0, 2, (L0, 256)), 1, -1).astype(np.int8)

    # session 1 in the true world
    ang1 = np.linspace(0, np.pi, 7)
    m1 = build_session(ang1, cloud, pm1_lm, np.eye(3), np.zeros(3), 1.0,
                       seed=1)
    # session 2 in a private similarity-transformed world
    Rd = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.12, 0.4])))
    td = np.array([0.8, -0.4, 0.3])
    sd = 1.35
    ang2 = np.linspace(0.85 * np.pi, 1.9 * np.pi, 7)
    m2 = build_session(ang2, cloud, pm1_lm, Rd, td, sd, seed=2)
    return m1, m2, dict(Rd=Rd, td=td, sd=sd, cloud=cloud)


def test_detect_overlap_finds_pairs(two_sessions):
    m1, m2, _ = two_sessions
    pairs = mm.detect_overlap(m1, m2)
    assert pairs, "no overlap candidates found"
    k2, k1 = pairs[0]
    assert 0 <= k1 < int(m1.n_kfs) and 0 <= k2 < int(m2.n_kfs)


def test_cross_sim3_recovers_world_similarity(two_sessions):
    m1, m2, truth = two_sessions
    pairs = mm.detect_overlap(m1, m2)
    cross = None
    key = jax.random.PRNGKey(0)
    for k2, k1 in pairs:
        key, sub = jax.random.split(key)
        cross = mm.compute_cross_sim3(m1, m2, k1, k2, CAM, sub)
        if cross is not None:
            break
    assert cross is not None
    # S_w1<-w2 must invert the session-2 world map: s = 1/sd, R = Rd^T
    assert cross.s == pytest.approx(1.0 / truth["sd"], rel=0.03)
    R_err = np.degrees(np.linalg.norm(np.asarray(
        lie.so3_log(jnp.asarray(cross.R @ truth["Rd"])))))
    assert R_err < 1.5, R_err
    t_expect = -(1.0 / truth["sd"]) * truth["Rd"].T @ truth["td"]
    np.testing.assert_allclose(cross.t, t_expect, atol=0.08)


def test_merge_sessions_end_to_end(two_sessions):
    m1, m2, truth = two_sessions
    res = mm.merge_sessions(m1, m2, CAM, jax.random.PRNGKey(1))
    assert res is not None
    merged = res.map
    n1, n2 = int(m1.n_kfs), int(m2.n_kfs)
    assert int(merged.n_kfs) == n1 + n2
    assert res.n_fused >= 20

    # session-2 keyframes should now sit at their true-world poses:
    # camera centers of merged KFs n1.. match _pose_of ground truth
    ang2 = np.linspace(0.85 * np.pi, 1.9 * np.pi, 7)
    Rm = np.asarray(merged.kfs.Rcw[n1:n1 + n2])
    tm = np.asarray(merged.kfs.tcw[n1:n1 + n2])
    C = -np.einsum("kji,kj->ki", Rm, tm)
    C_true = np.stack([-_pose_of(a)[0].T @ _pose_of(a)[1] for a in ang2])
    err = np.linalg.norm(C - C_true, axis=1)
    assert err.max() < 0.15, err

    # fused duplicates are gone from the association table
    dup_ids = np.arange(int(m1.n_lms), int(m1.n_lms) + int(m2.n_lms))
    lut_hit = np.isin(np.asarray(merged.assoc), dup_ids[
        ~np.asarray(merged.lms.valid)[dup_ids]])
    assert not lut_hit.any()


def test_merge_distributed_ba_matches_single_chip(two_sessions):
    m1, m2, _ = two_sessions
    devs = jax.devices()[:8]
    mesh = jax.sharding.Mesh(np.array(devs), ("lm",))
    res_d = mm.merge_sessions(
        m1, m2, CAM, jax.random.PRNGKey(1), mesh=mesh
    )
    res_s = mm.merge_sessions(m1, m2, CAM, jax.random.PRNGKey(1))
    assert res_d is not None and res_s is not None
    td = np.asarray(res_d.map.kfs.tcw[: int(res_d.map.n_kfs)])
    ts = np.asarray(res_s.map.kfs.tcw[: int(res_s.map.n_kfs)])
    assert np.isfinite(td).all()
    # both converge to the same optimum (independent solvers, same problem)
    np.testing.assert_allclose(td, ts, atol=0.05)
