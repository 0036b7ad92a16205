"""Sim3 solver (Horn + RANSAC + LM refine), essential-graph optimization,
and the bag-of-binary-codes place recognizer."""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.ops import bow
from viorb_tpu.solver import sim3 as s3
from viorb_tpu.solver.ba import Camera
from viorb_tpu.utils import lie

CAM = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)


def rand_rot(rng):
    v = rng.normal(0, 0.5, 3)
    return np.asarray(lie.so3_exp(jnp.asarray(v)))


def test_horn_sim3_exact():
    rng = np.random.default_rng(0)
    R = rand_rot(rng)
    t = rng.normal(0, 1, 3)
    s = 1.7
    P2 = rng.normal(0, 2, (3, 3)) + np.array([0, 0, 5])
    P1 = s * P2 @ R.T + t
    Re, te, se = s3.horn_sim3(jnp.asarray(P1), jnp.asarray(P2))
    np.testing.assert_allclose(np.asarray(Re), R, atol=1e-5)
    np.testing.assert_allclose(float(se), s, atol=1e-5)
    np.testing.assert_allclose(np.asarray(te), t, atol=1e-4)


def test_sim3_ransac_with_outliers():
    rng = np.random.default_rng(1)
    R = rand_rot(rng)
    t = rng.normal(0, 0.5, 3)
    s = 2.2
    N = 60
    X2 = rng.normal(0, 1.5, (N, 3)) + np.array([0, 0, 6])
    X1 = s * X2 @ R.T + t + rng.normal(0, 0.003, (N, 3))
    # 30% outliers
    out = rng.random(N) < 0.3
    X1[out] += rng.normal(0, 2.0, (out.sum(), 3))
    res = s3.sim3_ransac(
        jnp.asarray(X1), jnp.asarray(X2), jnp.ones(N, bool),
        jnp.ones(N), jnp.ones(N), CAM, jax.random.PRNGKey(0), n_hyp=256,
    )
    assert int(res.n_inliers) >= 0.9 * (N - out.sum()), int(res.n_inliers)
    np.testing.assert_allclose(float(res.s12), s, rtol=0.05)

    # LM refinement tightens the estimate
    Rr, tr, sr, inl, n = s3.optimize_sim3(
        res.R12, res.t12, res.s12,
        jnp.asarray(X1), jnp.asarray(X2), res.inliers,
        jnp.ones(N), jnp.ones(N), CAM,
    )
    np.testing.assert_allclose(float(sr), s, rtol=0.02)
    err = np.degrees(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(np.asarray(Rr) @ R.T)))))
    assert err < 1.0, err


def test_essential_graph_closes_loop():
    """Chain of keyframes with accumulated drift; one loop edge snaps the
    end back — pose-graph optimization should distribute the correction."""
    rng = np.random.default_rng(2)
    K = 12
    # ground-truth poses on a line
    R_gt = np.stack([rand_rot(rng) * 0 + np.eye(3) for _ in range(K)])
    t_gt = np.stack([np.array([0.5 * k, 0.0, 0.0]) for k in range(K)])
    s_gt = np.ones(K)

    # drifted estimates: growing error; node 0 (the gauge anchor) exact
    drift = np.cumsum(rng.normal(0, 0.03, (K, 3)), axis=0)
    drift -= drift[0]
    s_drift = np.cumprod(1 + rng.normal(0, 0.01, K))
    s_drift /= s_drift[0]
    R_est = R_gt.copy()
    t_est = t_gt + drift
    s_est = s_drift

    # edges: sequential chain with DRIFTED relative measurements would keep
    # drift; instead use true relatives (odometry is locally accurate)
    edges_i, edges_j = [], []
    Rij, tij, sij, w = [], [], [], []
    def rel(i, j, Rs, ts, ss):
        Ri, ti_, si = Rs[i], ts[i], ss[i]
        Rj, tj_, sj = Rs[j], ts[j], ss[j]
        Rj_inv, tj_inv, sj_inv = lie.sim3_inv(jnp.asarray(Rj), jnp.asarray(tj_), jnp.asarray(sj))
        return lie.sim3_mul(jnp.asarray(Ri), jnp.asarray(ti_), jnp.asarray(si), Rj_inv, tj_inv, sj_inv)

    for k in range(K - 1):
        Rr, tr, sr = rel(k, k + 1, R_gt, t_gt, s_gt)
        edges_i.append(k); edges_j.append(k + 1)
        Rij.append(np.asarray(Rr)); tij.append(np.asarray(tr)); sij.append(float(sr)); w.append(1.0)
    # loop edge between 0 and K-1 with the TRUE relative
    Rr, tr, sr = rel(0, K - 1, R_gt, t_gt, s_gt)
    edges_i.append(0); edges_j.append(K - 1)
    Rij.append(np.asarray(Rr)); tij.append(np.asarray(tr)); sij.append(float(sr)); w.append(5.0)

    graph = s3.Sim3Graph(
        i_idx=jnp.asarray(edges_i), j_idx=jnp.asarray(edges_j),
        R_ij=jnp.asarray(np.stack(Rij)), t_ij=jnp.asarray(np.stack(tij)),
        s_ij=jnp.asarray(sij), weight=jnp.asarray(w),
        valid=jnp.ones(len(w), bool),
    )
    fixed = jnp.zeros(K, bool).at[0].set(True)
    R_o, t_o, s_o = s3.optimize_essential_graph(
        jnp.asarray(R_est), jnp.asarray(t_est), jnp.asarray(s_est), graph, fixed
    )
    err_before = np.linalg.norm(t_est - t_gt, axis=-1).max()
    err_after = np.linalg.norm(np.asarray(t_o) - t_gt, axis=-1).max()
    assert err_after < 0.05 * err_before, (err_before, err_after)
    np.testing.assert_allclose(np.asarray(s_o), s_gt, atol=1e-3)


def test_bow_place_recognition():
    """Same-place keyframes (shared descriptors + noise) must outscore
    different-place keyframes."""
    rng = np.random.default_rng(3)
    n_desc = 150

    def make_kf(bits_base, flip=8):
        b = bits_base.copy()
        for _ in range(flip):
            i = rng.integers(0, n_desc)
            b[i, rng.integers(0, 256)] ^= True
        pm1 = np.where(b, 1, -1).astype(np.int8)
        return jnp.asarray(pm1), jnp.ones(n_desc, bool)

    places = [rng.integers(0, 2, (n_desc, 256)).astype(bool) for _ in range(5)]
    index = bow.DescriptorIndex(max_kfs=16)
    # kfs 0-4: five distinct places; kf 5: revisit of place 0
    for i, pb in enumerate(places):
        pm1, v = make_kf(pb)
        index.add(i, pm1, v)
    pm1, v = make_kf(places[0], flip=20)
    index.add(5, pm1, v)

    exclude = np.zeros(16, bool)
    exclude[5] = True
    exclude[4] = True  # pretend kf4 is covisible
    cands = index.query(5, exclude, min_score=0.0, top=3)
    assert len(cands) >= 1 and cands[0] == 0, cands

    v5 = index.vector(5)
    scores = np.asarray(bow.score_l1(v5, index.vectors[:6]))
    assert scores[0] > max(scores[1], scores[2], scores[3]) + 0.05, scores
