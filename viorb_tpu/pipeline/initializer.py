"""Monocular two-view bootstrap: parallel H/F RANSAC, model selection,
motion recovery, triangulation.

Replaces the reference `Initializer` (`/root/reference/src/Initializer.cc`,
`include/Initializer.h:38-72`). The reference runs two CPU threads (one per
model) with 200 sequential RANSAC iterations each; here all 200 hypotheses
of *both* models are built and scored as one batched program (the batched
SVDs and (I, M)-shaped transfer-error matrices are the parallel dimension).

Semantics preserved:
- normalized 8-point sets for both models;
- symmetric-transfer scoring with chi2 thresholds 5.991 (H) / 3.841 (F) and
  the reference's score accumulation (th - chi2, F uses 5.991 as the score
  base) — Initializer.cc CheckHomography/CheckFundamental;
- model selection RH = SH / (SH + SF) > 0.40;
- ReconstructF: E = K^T F K, 4 decompositions; ReconstructH: Faugeras 8
  solutions; winner by cheirality + parallax + reprojection voting with the
  reference's acceptance rules (clear winner, >=50 triangulated, parallax).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..solver.ba import Camera
from ..utils import lie

CHI2_H = 5.991
CHI2_F = 3.841
SCORE_BASE_F = 5.991  # reference uses thScore=5.991 when accumulating F score


def _normalize_pts(xy: jax.Array, valid: jax.Array):
    """Mean/abs-dev normalization (Initializer::Normalize)."""
    w = valid.astype(xy.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(xy * w[:, None], axis=0) / n
    dev = jnp.sum(jnp.abs(xy - mean) * w[:, None], axis=0) / n
    s = 1.0 / jnp.maximum(dev, 1e-9)
    xyn = (xy - mean) * s
    T = jnp.array(
        [[s[0], 0, -mean[0] * s[0]], [0, s[1], -mean[1] * s[1]], [0, 0, 1]], xy.dtype
    )
    return xyn, T


def _h_from_8(x1: jax.Array, x2: jax.Array):
    """Batched homography DLT. x1, x2: (I, 8, 2) -> (I, 3, 3)."""
    I, S, _ = x1.shape
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)  # (I, 16, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[:, -1].reshape(I, 3, 3)


def _f_from_8(x1: jax.Array, x2: jax.Array):
    """Batched normalized 8-point fundamental. (I, 8, 2) -> (I, 3, 3)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    o = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=-1)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[:, -1].reshape(-1, 3, 3)
    # rank-2 projection
    u, s, vt2 = jnp.linalg.svd(F)
    s = s.at[:, 2].set(0.0)
    return u @ (s[:, :, None] * vt2)


def _score_h(H21: jax.Array, xy1, xy2, valid, sigma2):
    """(I,) symmetric transfer score + (I, M) inlier mask."""
    H12 = jnp.linalg.inv(H21)
    ones = jnp.ones_like(xy1[:, :1])
    p1 = jnp.concatenate([xy1, ones], axis=-1)  # (M, 3)
    p2 = jnp.concatenate([xy2, ones], axis=-1)

    def transfer(H, src, dst):
        q = jnp.einsum("iab,mb->ima", H, src)
        q = q[..., :2] / q[..., 2:3]
        return jnp.sum((q - dst[None]) ** 2, axis=-1) / sigma2

    c1 = transfer(H12, p2, xy1)  # project 2 -> 1
    c2 = transfer(H21, p1, xy2)
    in1 = c1 <= CHI2_H
    in2 = c2 <= CHI2_H
    sc = jnp.where(in1, CHI2_H - c1, 0.0) + jnp.where(in2, CHI2_H - c2, 0.0)
    inlier = in1 & in2 & valid[None, :]
    return jnp.sum(sc * valid[None, :], axis=1), inlier


def _score_f(F21: jax.Array, xy1, xy2, valid, sigma2):
    ones = jnp.ones_like(xy1[:, :1])
    p1 = jnp.concatenate([xy1, ones], axis=-1)
    p2 = jnp.concatenate([xy2, ones], axis=-1)

    def epi(F, src, dst):
        l = jnp.einsum("iab,mb->ima", F, src)  # lines in dst image
        num = jnp.sum(l[..., :2] * dst[None, :, :2], axis=-1) + l[..., 2]
        den = jnp.sum(l[..., :2] ** 2, axis=-1)
        return num**2 / jnp.maximum(den, 1e-12) / sigma2

    c2 = epi(F21, p1, xy2)  # line of x1 in image 2
    c1 = epi(jnp.swapaxes(F21, -1, -2), p2, xy1)
    in1 = c1 <= CHI2_F
    in2 = c2 <= CHI2_F
    sc = jnp.where(in1, SCORE_BASE_F - c1, 0.0) + jnp.where(in2, SCORE_BASE_F - c2, 0.0)
    inlier = in1 & in2 & valid[None, :]
    return jnp.sum(sc * valid[None, :], axis=1), inlier


def triangulate(Rcw1, tcw1, Rcw2, tcw2, xy1_n, xy2_n):
    """Batched DLT triangulation in normalized camera coords.

    xy*_n: (M, 2) normalized (K^-1) image points. Returns (M, 3) world pts.
    (Initializer::Triangulate, batched SVD of the (M, 4, 4) systems.)
    """
    P1 = jnp.concatenate([Rcw1, tcw1[:, None]], axis=1)  # (3,4)
    P2 = jnp.concatenate([Rcw2, tcw2[:, None]], axis=1)
    rows = []
    for P, xy in ((P1, xy1_n), (P2, xy2_n)):
        rows.append(xy[:, 0:1] * P[2][None] - P[0][None])
        rows.append(xy[:, 1:2] * P[2][None] - P[1][None])
    A = jnp.stack(rows, axis=1)  # (M, 4, 4)
    _, _, vt = jnp.linalg.svd(A)
    X = vt[:, -1]
    return X[:, :3] / jnp.where(jnp.abs(X[:, 3:4]) < 1e-12, 1e-12, X[:, 3:4])


def _check_rt(R, t, xy1_n, xy2_n, inlier, sigma2_px, cam: Camera):
    """Vote a motion hypothesis: triangulate inliers, count good points.

    Mirrors Initializer::CheckRT: positive finite depth in both views,
    parallax, reprojection < 4 sigma^2 in both images. Returns
    (n_good, parallax_deg, points (M,3), good_mask).
    """
    eye = jnp.eye(3, dtype=R.dtype)
    z3 = jnp.zeros(3, R.dtype)
    X = triangulate(eye, z3, R, t, xy1_n, xy2_n)
    finite = jnp.all(jnp.isfinite(X), axis=-1)

    O1 = jnp.zeros(3, R.dtype)
    O2 = -R.T @ t
    n1 = X - O1
    n2 = X - O2
    d1 = jnp.linalg.norm(n1, axis=-1)
    d2 = jnp.linalg.norm(n2, axis=-1)
    cos_par = jnp.sum(n1 * n2, axis=-1) / jnp.maximum(d1 * d2, 1e-12)

    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    ok_depth = (z1 > 0) & (z2 > 0)

    # reprojection in pixels
    fx, fy = cam.fx, cam.fy
    e1 = (X[:, :2] / jnp.maximum(z1[:, None], 1e-12) - xy1_n) * jnp.array([fx, fy], R.dtype)
    e2 = (Xc2[:, :2] / jnp.maximum(z2[:, None], 1e-12) - xy2_n) * jnp.array([fx, fy], R.dtype)
    ok_rp = (jnp.sum(e1**2, -1) < 4 * sigma2_px) & (jnp.sum(e2**2, -1) < 4 * sigma2_px)

    good = inlier & finite & ok_depth & ok_rp & (cos_par < 0.99998)
    n_good = jnp.sum(good)
    # parallax of the 50th-best (reference takes min(50, size)-th)
    par = jnp.where(good, jnp.degrees(jnp.arccos(jnp.clip(cos_par, -1, 1))), 0.0)
    par_sorted = jnp.sort(par)[::-1]
    idx = jnp.minimum(49, jnp.maximum(n_good - 1, 0))
    parallax = par_sorted[idx]
    return n_good, parallax, X, good


def _decompose_e(E):
    """4 motion hypotheses from an essential matrix (R1,t),(R1,-t),(R2,t),(R2,-t)."""
    u, _, vt = jnp.linalg.svd(E)
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return jnp.stack([R1, R1, R2, R2]), jnp.stack([t, -t, t, -t])


def _decompose_h(H, cam: Camera):
    """Faugeras SVD decomposition of a homography into 8 (R, t) hypotheses.

    Follows Faugeras & Lustman '88 as implemented in Initializer::
    ReconstructH (the d' > d'' case with both signs), in calibrated coords.
    """
    Km = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], H.dtype)
    Kinv = jnp.linalg.inv(Km)
    A = Kinv @ H @ Km
    U, w, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0], H.dtype) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0], H.dtype) * aux3

    Rs, ts = [], []
    # case d' > 0
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, 1e-12
    )
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    st_signs = jnp.array([1.0, -1.0, -1.0, 1.0], H.dtype)
    for i in range(4):
        st = st_signs[i] * aux_st
        Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]], H.dtype)
        tp = jnp.array([x1s[i], 0.0, -x3s[i]], H.dtype) * (d1 - d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    # case d' < 0
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, 1e-12
    )
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sp_signs = jnp.array([1.0, -1.0, -1.0, 1.0], H.dtype)
    for i in range(4):
        sp = sp_signs[i] * aux_sp
        Rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]], H.dtype)
        tp = jnp.array([x1s[i], 0.0, x3s[i]], H.dtype) * (d1 + d3)
        R = s * U @ Rp @ Vt
        t = U @ tp
        Rs.append(R)
        ts.append(t / jnp.maximum(jnp.linalg.norm(t), 1e-12))
    return jnp.stack(Rs), jnp.stack(ts)


class InitResult(NamedTuple):
    success: jax.Array  # () bool
    Rcw2: jax.Array  # (3, 3) second camera pose (first is identity)
    tcw2: jax.Array  # (3,)
    points: jax.Array  # (M, 3) triangulated world points (slot per match)
    good: jax.Array  # (M,) bool triangulation validity
    used_h: jax.Array  # () bool which model won


def initialize_two_view(
    xy1: jax.Array,  # (M, 2) undistorted pixel coords in frame 1
    xy2: jax.Array,  # (M, 2) matched coords in frame 2 (index-aligned)
    valid: jax.Array,  # (M,) bool
    cam: Camera,
    key: jax.Array,
    n_iters: int = 200,
    sigma: float = 1.0,
    min_triangulated: int = 50,
    min_parallax_deg: float = 1.0,
) -> InitResult:
    """Full two-view bootstrap (Initializer::Initialize), one jitted program."""
    dtype = xy1.dtype
    M = xy1.shape[0]
    sigma2 = sigma * sigma

    # --- RANSAC sample sets (valid-biased: sample by priority of random
    # keys, invalid matches pushed to the end) ---
    def sample(key):
        r = jax.random.uniform(key, (M,)) + (~valid) * 10.0
        return jnp.argsort(r)[:8]

    idx = jax.vmap(sample)(jax.random.split(key, n_iters))  # (I, 8)
    x1s = xy1[idx]  # (I, 8, 2)
    x2s = xy2[idx]

    # --- normalized coordinates ---
    xy1n, T1 = _normalize_pts(xy1, valid)
    xy2n, T2 = _normalize_pts(xy2, valid)
    x1ns = xy1n[idx]
    x2ns = xy2n[idx]

    # --- homographies ---
    Hn = _h_from_8(x1ns, x2ns)
    H21 = jnp.linalg.inv(T2) @ Hn @ T1
    H21 = H21 / jnp.where(jnp.abs(H21[:, 2:3, 2:3]) < 1e-12, 1e-12, H21[:, 2:3, 2:3])
    sH, inH = _score_h(H21, xy1, xy2, valid, sigma2)
    iH = jnp.argmax(sH)
    SH, H_best, inlier_h = sH[iH], H21[iH], inH[iH]

    # --- fundamentals ---
    Fn = _f_from_8(x1ns, x2ns)
    F21 = T2.T @ Fn @ T1
    sF, inF = _score_f(F21, xy1, xy2, valid, sigma2)
    iF = jnp.argmax(sF)
    SF, F_best, inlier_f = sF[iF], F21[iF], inF[iF]

    use_h = SH / jnp.maximum(SH + SF, 1e-9) > 0.40

    # --- motion hypotheses: 8 from H, 4 from E; vote over a unified set ---
    Km = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], dtype)
    Kinv = jnp.linalg.inv(Km)
    xy1_c = (jnp.concatenate([xy1, jnp.ones((M, 1), dtype)], -1) @ Kinv.T)[:, :2]
    xy2_c = (jnp.concatenate([xy2, jnp.ones((M, 1), dtype)], -1) @ Kinv.T)[:, :2]

    E = Km.T @ F_best @ Km
    Rs_e, ts_e = _decompose_e(E)  # (4, ...)
    Rs_h, ts_h = _decompose_h(H_best, cam)  # (8, ...)
    Rs = jnp.concatenate([Rs_e, Rs_h])
    ts = jnp.concatenate([ts_e, ts_h])
    from_h = jnp.concatenate([jnp.zeros(4, bool), jnp.ones(8, bool)])
    hyp_live = jnp.where(use_h, from_h, ~from_h)
    inlier = jnp.where(use_h, inlier_h, inlier_f)

    n_good, par, X, good = jax.vmap(
        lambda R, t: _check_rt(R, t, xy1_c, xy2_c, inlier, 4.0 * sigma2, cam)
    )(Rs, ts)
    n_good = jnp.where(hyp_live, n_good, -1)

    best = jnp.argmax(n_good)
    n_best = n_good[best]
    n_second = jnp.sort(n_good)[-2]
    n_inliers = jnp.sum(inlier)

    # acceptance (Initializer::ReconstructF semantics): clear winner,
    # enough points, enough parallax
    ok = (
        (n_best >= jnp.maximum(min_triangulated, (0.9 * n_inliers).astype(jnp.int32)))
        & (par[best] > min_parallax_deg)
        & (n_second < 0.75 * n_best)
    )
    return InitResult(
        success=ok,
        Rcw2=Rs[best],
        tcw2=ts[best],
        points=X[best],
        good=good[best],
        used_h=use_h,
    )
