"""EPnP + RANSAC camera-pose-from-2D/3D solver (relocalization).

Replaces `PnPsolver` (`/root/reference/src/PnPsolver.cc`,
`include/PnPsolver.h:63-125`): EPnP (Lepetit et al., 4 control points,
barycentric coordinates) inside an adaptive RANSAC, used by
`Tracking::Relocalization` (Tracking.cc:2565-2727) with parameters
(0.99, 10, 300, 4, 0.5, 5.991) set at Tracking.cc:2611.

TPU design: the reference iterates hypotheses sequentially with early exit;
here ALL hypotheses are solved and scored in one batched program —
`epnp` is pure fixed-shape linear algebra (12x12 eigh + Horn alignment),
vmapped over the hypothesis axis, and inlier counting is one masked
reduction. The refinement the reference does per-candidate (EPnP on all
inliers, PnPsolver::Refine) is one more batched call on the best
hypothesis's inlier set.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie
from .ba import Camera


def epnp(
    Pw: jax.Array,  # (n, 3) world points
    uv: jax.Array,  # (n, 2) pixel observations
    w: jax.Array,  # (n,) weights in [0,1] (0 disables a row)
    cam: Camera,
):
    """Single EPnP solve (beta case N=1 + Horn alignment). Returns (R, t)
    with x_cam = R @ x_world + t. Batched via vmap over leading axes.

    With exact data and >= 4 non-coplanar points this recovers the pose to
    numerical precision; RANSAC + the later LM pose refinement absorb the
    approximation of skipping the N=2/3 beta cases (PnPsolver.cc solves
    all three and keeps the best; the minimal-set hypotheses here only
    need to rank inliers).
    """
    dtype = Pw.dtype
    wsum = jnp.maximum(w.sum(), 1e-9)
    wn = w / wsum

    # control points: centroid + principal axes (PnPsolver::choose_control_points)
    c0 = (Pw * wn[:, None]).sum(0)
    Q = (Pw - c0) * jnp.sqrt(wn)[:, None]
    C = Q.T @ Q  # (3, 3)
    eigval, eigvec = jnp.linalg.eigh(C)
    # scale axes so the control points are well-spread; guard tiny eigs
    ax = eigvec * jnp.sqrt(jnp.maximum(eigval, 1e-9))[None, :]
    cw = jnp.stack([c0, c0 + ax[:, 0], c0 + ax[:, 1], c0 + ax[:, 2]], 0)  # (4,3)

    # barycentric coordinates (PnPsolver::compute_barycentric_coordinates)
    inv_ax = jnp.linalg.solve(ax, jnp.eye(3, dtype=dtype))
    a123 = (Pw - c0) @ inv_ax.T  # (n, 3)
    alphas = jnp.concatenate([1.0 - a123.sum(-1, keepdims=True), a123], -1)  # (n,4)

    # M matrix (PnPsolver::fill_M): 2 rows per point, 12 cols (4 ctrl x 3)
    u, v = uv[:, 0], uv[:, 1]
    zeros = jnp.zeros_like(alphas)
    row_u = jnp.concatenate(
        [
            (alphas * cam.fx)[:, :, None],
            zeros[:, :, None],
            (alphas * (cam.cx - u[:, None]))[:, :, None],
        ],
        -1,
    ).reshape(-1, 12)
    row_v = jnp.concatenate(
        [
            zeros[:, :, None],
            (alphas * cam.fy)[:, :, None],
            (alphas * (cam.cy - v[:, None]))[:, :, None],
        ],
        -1,
    ).reshape(-1, 12)
    M = jnp.concatenate([row_u, row_v], 0)  # (2n, 12)
    wr = jnp.concatenate([w, w], 0)
    MtM = (M * wr[:, None]).T @ M  # (12, 12)

    _, vecs = jnp.linalg.eigh(MtM)

    # The true camera control points lie in the span of the smallest
    # kernel vectors; the reference solves the beta systems for kernel
    # dimensions 1..3 (PnPsolver::find_betas_approx_*). Here each of the 4
    # smallest vectors is tried as a 1-D kernel (beta by distance match),
    # and the candidate with the lowest weighted reprojection error wins —
    # same recovery envelope for >= 6-point sets, fully batched.
    ii, jj = jnp.triu_indices(4, k=1)
    dc = jnp.linalg.norm(cw[ii] - cw[jj], axis=-1)

    def candidate(col):
        vker = vecs[:, col].reshape(4, 3)
        dv = jnp.linalg.norm(vker[ii] - vker[jj], axis=-1)
        beta = jnp.sum(dv * dc) / jnp.maximum(jnp.sum(dv * dv), 1e-12)
        ccs = beta * vker
        pc = alphas @ ccs
        flip = jnp.sign(jnp.sum(pc[:, 2] * wn)) < 0
        pc = jnp.where(flip, -pc, pc)
        R, t, _ = _weighted_horn(pc, Pw, wn)
        # weighted reprojection error of this candidate
        pc2 = Pw @ R.T + t
        z = jnp.where(jnp.abs(pc2[:, 2]) < 1e-6, 1e-6, pc2[:, 2])
        pu = jnp.stack(
            [cam.fx * pc2[:, 0] / z + cam.cx, cam.fy * pc2[:, 1] / z + cam.cy],
            -1,
        )
        err = jnp.sum(wn * jnp.sum((pu - uv) ** 2, -1))
        err = err + 1e9 * (jnp.sum(wn * (pc2[:, 2] <= 0)) > 0.3)
        return R, t, err

    Rs, ts, errs = jax.vmap(candidate)(jnp.arange(4))
    b = jnp.argmin(errs)
    return Rs[b], ts[b]


def _weighted_horn(P1, P2, w):
    """Weighted closed-form SE3: P1 ~ R P2 + t."""
    c1 = (P1 * w[:, None]).sum(0)
    c2 = (P2 * w[:, None]).sum(0)
    Q1 = P1 - c1
    Q2 = P2 - c2
    M = jnp.einsum("ni,n,nj->ij", Q2, w, Q1)
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    Nm = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx]),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz]),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy]),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz]),
        ]
    )
    _, vq = jnp.linalg.eigh(Nm)
    q = vq[:, -1]
    q = jnp.where(q[0] < 0, -q, q)
    R = lie.quat_to_matrix(q)
    t = c1 - R @ c2
    return R, t, q


class PnPResult(NamedTuple):
    Rcw: jax.Array
    tcw: jax.Array
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array
    success: jax.Array  # bool


def pnp_ransac(
    Pw: jax.Array,  # (N, 3)
    uv: jax.Array,  # (N, 2)
    valid: jax.Array,  # (N,) bool
    sigma2: jax.Array,  # (N,) feature scale variance
    cam: Camera,
    key: jax.Array,
    n_hyp: int = 300,  # reference ransacMaxIterations=300 (Tracking.cc:2611)
    min_set: int = 6,  # reference uses 4 with full beta-case solves; the
    # batched single-kernel solve needs 6 for a well-determined M
    chi2_thr: float = 5.991,  # ransacEpsilon chi2 (Tracking.cc:2611)
    min_inliers: int = 10,  # ransacMinInliers=10
) -> PnPResult:
    """Batched-hypothesis EPnP RANSAC + all-inlier EPnP refinement
    (PnPsolver::iterate + PnPsolver::Refine)."""
    N = Pw.shape[0]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    idx = jax.random.randint(key, (n_hyp, min_set), 0, n_valid)
    order = jnp.argsort(~valid)  # valid first
    sample = order[idx]  # (n_hyp, min_set)

    def solve_one(sel):
        w = jnp.zeros((N,), Pw.dtype).at[sel].set(1.0)
        w = w * valid.astype(Pw.dtype)
        return epnp(Pw, uv, w, cam)

    R, t = jax.vmap(solve_one)(sample)  # (n_hyp, 3, 3), (n_hyp, 3)

    def score(R, t):
        pc = Pw @ R.T + t
        z = jnp.maximum(pc[:, 2], 1e-6)
        pu = jnp.stack(
            [cam.fx * pc[:, 0] / z + cam.cx, cam.fy * pc[:, 1] / z + cam.cy], -1
        )
        e2 = jnp.sum((pu - uv) ** 2, -1) / sigma2
        ok = valid & (e2 < chi2_thr) & (pc[:, 2] > 0)
        return ok, jnp.sum(ok)

    inl, n_inl = jax.vmap(score)(R, t)
    best = jnp.argmax(n_inl)
    R_b, t_b = R[best], t[best]
    inl_b = inl[best]

    # refine on all inliers (EPnP again with the inlier weights), then rescore
    w_ref = inl_b.astype(Pw.dtype)
    R_r, t_r = epnp(Pw, uv, w_ref, cam)
    inl_r, n_r = score(R_r, t_r)
    better = n_r >= n_inl[best]
    R_f = jnp.where(better, R_r, R_b)
    t_f = jnp.where(better, t_r, t_b)
    inl_f = jnp.where(better, inl_r, inl_b)
    n_f = jnp.where(better, n_r, n_inl[best])
    return PnPResult(
        Rcw=R_f, tcw=t_f, inliers=inl_f, n_inliers=n_f,
        success=n_f >= min_inliers,
    )
