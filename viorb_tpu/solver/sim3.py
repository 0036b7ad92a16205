"""Sim3 estimation and Sim3 pose-graph (essential graph) optimization.

Replaces:
- `Sim3Solver` (`/root/reference/src/Sim3Solver.cc`): closed-form Horn
  3-point similarity inside RANSAC, inliers by reprojection in both
  images -> here a fully batched hypothesis sweep (all RANSAC iterations
  scored in one fused program — no sequential hypothesis loop);
- `Optimizer::OptimizeSim3` (Optimizer.cc:3382): LM refinement of S12 over
  the inlier matches with bidirectional reprojection errors;
- `Optimizer::OptimizeEssentialGraph[ForMonoVI]` (Optimizer.cc:3105, 2068):
  Sim3 pose graph over all keyframes (loop / spanning-tree / covisibility
  edges), dense normal equations + Cholesky (7K dof is tiny on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie
from .ba import Camera


def horn_sim3(P1: jax.Array, P2: jax.Array, fix_scale: bool = False):
    """Closed-form similarity S12 (R, t, s) aligning two 3-point sets:
    P1 ~ s * R @ P2 + t (Horn 1987, as in Sim3Solver::ComputeSim3).

    P1, P2: (..., 3, 3) with point index in axis -2. Batched.
    """
    c1 = P1.mean(-2, keepdims=True)
    c2 = P2.mean(-2, keepdims=True)
    Q1 = P1 - c1
    Q2 = P2 - c2
    M = jnp.einsum("...ki,...kj->...ij", Q2, Q1)  # correlation sum Q2 Q1^T

    # quaternion method: largest eigenvector of the 4x4 N matrix
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        -2,
    )  # (..., 4, 4)
    w, v = jnp.linalg.eigh(N)
    q = v[..., -1]  # largest eigenvalue's vector, (w, x, y, z)
    q = jnp.where(q[..., :1] < 0, -q, q)
    R = lie.quat_to_matrix(q)

    RQ2 = jnp.einsum("...ij,...kj->...ki", R, Q2)
    if fix_scale:
        s = jnp.ones(P1.shape[:-2], P1.dtype)
    else:
        # Horn symmetric scale: sqrt(sum|Q1|^2 / sum|RQ2|^2) is asymmetric;
        # the reference uses s = trace(Q1^T R Q2) / sum|Q2|^2 (Sim3Solver)
        num = jnp.sum(Q1 * RQ2, (-1, -2))
        den = jnp.maximum(jnp.sum(Q2 * Q2, (-1, -2)), 1e-12)
        s = num / den
    t = c1[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, c2[..., 0, :])
    return R, t, s


class Sim3Result(NamedTuple):
    R12: jax.Array
    t12: jax.Array
    s12: jax.Array
    inliers: jax.Array  # (N,) bool
    n_inliers: jax.Array


def sim3_ransac(
    X1: jax.Array,  # (N, 3) matched points in camera-1 coords
    X2: jax.Array,  # (N, 3) same points in camera-2 coords
    valid: jax.Array,  # (N,) bool
    sigma2_1: jax.Array,  # (N,) octave sigma^2 of the feature in image 1
    sigma2_2: jax.Array,
    cam: Camera,
    key: jax.Array,
    n_hyp: int = 128,
    fix_scale: bool = False,
    chi2_thr: float = 9.210,
) -> Sim3Result:
    """Batched-hypothesis RANSAC for S12 (Sim3Solver::iterate).

    All `n_hyp` 3-point hypotheses are solved and scored in parallel;
    inliers by reprojection chi2 in BOTH images (Sim3Solver::CheckInliers).
    """
    N = X1.shape[0]
    idx = jax.random.randint(key, (n_hyp, 3), 0, jnp.maximum(jnp.sum(valid), 1))
    # map sampled ranks to actual valid indices
    order = jnp.argsort(~valid)  # valid first
    sample = order[idx]  # (n_hyp, 3)

    P1 = X1[sample]  # (n_hyp, 3, 3)
    P2 = X2[sample]
    R, t, s = horn_sim3(P1, P2, fix_scale)  # batched

    def count_inliers(R, t, s):
        # project X2 through S12 into camera 1 and X1 through S21 into cam 2
        X2in1 = s[..., None] * jnp.einsum("ij,nj->ni", R, X2) + t
        s21 = 1.0 / jnp.maximum(s, 1e-12)
        X1in2 = s21 * jnp.einsum("ji,nj->ni", R, X1 - t)
        e1 = _proj_err(X2in1, X1, cam) / sigma2_1
        e2 = _proj_err(X1in2, X2, cam) / sigma2_2
        ok = valid & (e1 < chi2_thr) & (e2 < chi2_thr)
        return ok, jnp.sum(ok)

    inl, n_inl = jax.vmap(count_inliers)(R, t, s)
    best = jnp.argmax(n_inl)
    return Sim3Result(
        R12=R[best], t12=t[best], s12=s[best],
        inliers=inl[best], n_inliers=n_inl[best],
    )


def _proj_err(Xa: jax.Array, Xb: jax.Array, cam: Camera) -> jax.Array:
    """Squared pixel distance between the projections of two 3D point sets
    in the same camera."""
    def proj(X):
        z = jnp.where(jnp.abs(X[:, 2]) < 1e-6, 1e-6, X[:, 2])
        return jnp.stack(
            [cam.fx * X[:, 0] / z + cam.cx, cam.fy * X[:, 1] / z + cam.cy], -1
        )

    d = proj(Xa) - proj(Xb)
    return jnp.sum(d * d, -1)


def optimize_sim3(
    R12, t12, s12,
    X1, X2, valid, sigma2_1, sigma2_2,
    cam: Camera,
    fix_scale: bool = False,
    n_iters: int = 15,
    chi2_thr: float = 10.0,
    lambda_init: float = 1e-4,
):
    """LM refinement of S12 over matched points with bidirectional
    reprojection residuals (Optimizer::OptimizeSim3, Huber sqrt(10)).

    Returns (R12, t12, s12, inliers, n_inliers)."""
    dtype = X1.dtype

    def residuals(x):
        # x = (7,) sim3 tangent update applied left-multiplicatively
        dR, dt, ds = lie.sim3_exp(x)
        R = dR @ R12_c[0]
        t = ds * dR @ t12_c[0] + dt
        s = ds * s12_c[0]
        X2in1 = s * jnp.einsum("ij,nj->ni", R, X2) + t
        X1in2 = (1.0 / s) * jnp.einsum("ji,nj->ni", R, X1 - t)
        e1 = (_p(X2in1) - _p(X1)) / jnp.sqrt(sigma2_1)[:, None]
        e2 = (_p(X1in2) - _p(X2)) / jnp.sqrt(sigma2_2)[:, None]
        return jnp.concatenate([e1, e2], 0)  # (2N, 2)

    def _p(X):
        z = jnp.where(jnp.abs(X[:, 2]) < 1e-6, 1e-6, X[:, 2])
        return jnp.stack(
            [cam.fx * X[:, 0] / z + cam.cx, cam.fy * X[:, 1] / z + cam.cy], -1
        )

    R12_c = [R12]
    t12_c = [t12]
    s12_c = [jnp.asarray(s12, dtype)]
    w_valid = jnp.concatenate([valid, valid], 0).astype(dtype)

    lam = jnp.asarray(lambda_init, dtype)
    for _ in range(n_iters):
        x0 = jnp.zeros(7, dtype)
        r = residuals(x0)
        chi2 = jnp.sum(r * r, -1)
        huber = jnp.where(chi2 <= chi2_thr, 1.0, jnp.sqrt(chi2_thr / jnp.maximum(chi2, 1e-12)))
        w = w_valid * huber
        J = jax.jacfwd(lambda x: residuals(x).reshape(-1))(x0).reshape(-1, 2, 7)
        H = jnp.einsum("nki,n,nkj->ij", J, w, J)
        b = jnp.einsum("nki,n,nk->i", J, w, -r)
        if fix_scale:
            H = H.at[6, 6].add(1e12)  # pin the scale dof
        dx = jnp.linalg.solve(H + lam * jnp.eye(7, dtype=dtype), b)
        cost0 = jnp.sum(w * chi2)
        dR, dt, ds = lie.sim3_exp(dx)
        Rn = dR @ R12_c[0]
        tn = ds * dR @ t12_c[0] + dt
        sn = ds * s12_c[0]
        # evaluate candidate cost
        R12_try, t12_try, s12_try = R12_c[0], t12_c[0], s12_c[0]
        R12_c[0], t12_c[0], s12_c[0] = Rn, tn, sn
        r_new = residuals(jnp.zeros(7, dtype))
        chi2n = jnp.sum(r_new * r_new, -1)
        cost1 = jnp.sum(w_valid * jnp.where(chi2n <= chi2_thr, chi2n,
                        2 * jnp.sqrt(chi2_thr * jnp.maximum(chi2n, 1e-12)) - chi2_thr))
        # traced accept/reject (the former host-side bool() blocked on the
        # device per iteration AND barred jitting the fused Sim3 program)
        accept = cost1 < cost0
        R12_c[0] = jnp.where(accept, Rn, R12_try)
        t12_c[0] = jnp.where(accept, tn, t12_try)
        s12_c[0] = jnp.where(accept, sn, s12_try)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)

    R12, t12, s12 = R12_c[0], t12_c[0], s12_c[0]
    r = residuals(jnp.zeros(7, dtype))
    chi2 = jnp.sum(r * r, -1).reshape(2, -1)
    inl = valid & (chi2[0] < chi2_thr) & (chi2[1] < chi2_thr)
    return R12, t12, s12, inl, jnp.sum(inl)


# ----------------------------------------------------------------------------
# Essential graph: Sim3 pose graph over all keyframes.
# ----------------------------------------------------------------------------


class Sim3Graph(NamedTuple):
    """Edges between keyframes with Sim3 measurements (padded to E)."""

    i_idx: jax.Array  # (E,)
    j_idx: jax.Array  # (E,)
    R_ij: jax.Array  # (E, 3, 3) measured S_ij = S_i * S_j^-1
    t_ij: jax.Array  # (E, 3)
    s_ij: jax.Array  # (E,)
    weight: jax.Array  # (E,) information scale (1 normal, higher for loop)
    valid: jax.Array  # (E,) bool


def optimize_essential_graph(
    R: jax.Array,  # (K, 3, 3) Siw rotations (world->kf)
    t: jax.Array,  # (K, 3)
    s: jax.Array,  # (K,)
    graph: Sim3Graph,
    fixed_mask: jax.Array,  # (K,) bool
    n_iters: int = 20,
    lambda_init: float = 1e-6,
):
    """Gauss-Newton/LM on the Sim3 pose graph (OptimizeEssentialGraph,
    Optimizer.cc:3105; 20 iterations). State: Siw per keyframe; residual
    per edge r = log(S_ij_meas^-1 * S_i * S_j^-1) (factors.sim3_graph).

    Dense (7K x 7K) normal equations — K <= a few hundred keyframes, so a
    single dense Cholesky per iteration is microseconds on the MXU.
    """
    from . import factors

    K = R.shape[0]
    dtype = t.dtype
    fixed_dof = jnp.repeat(fixed_mask, 7)

    def edge_residuals(R, t, s):
        Ri, ti, si = R[graph.i_idx], t[graph.i_idx], s[graph.i_idx]
        Rj, tj, sj = R[graph.j_idx], t[graph.j_idx], s[graph.j_idx]
        return jax.vmap(factors.sim3_graph_residual)(
            Ri, ti, si, Rj, tj, sj, graph.R_ij, graph.t_ij, graph.s_ij
        )  # (E, 7)

    def apply(R, t, s, dx):
        dR, dt, ds = jax.vmap(lie.sim3_exp)(dx)  # left-multiplicative
        Rn = dR @ R
        tn = ds[:, None] * jnp.einsum("kij,kj->ki", dR, t) + dt
        sn = ds * s
        return lie.normalize_rotation(Rn), tn, sn

    def linearize(R, t, s):
        E = graph.i_idx.shape[0]

        def one_edge(e):
            def r_of(xi, xj):
                Ri_, ti_, si_ = _apply_one(R[graph.i_idx[e]], t[graph.i_idx[e]], s[graph.i_idx[e]], xi)
                Rj_, tj_, sj_ = _apply_one(R[graph.j_idx[e]], t[graph.j_idx[e]], s[graph.j_idx[e]], xj)
                return factors.sim3_graph_residual(
                    Ri_, ti_, si_, Rj_, tj_, sj_,
                    graph.R_ij[e], graph.t_ij[e], graph.s_ij[e],
                )

            z = jnp.zeros(7, dtype)
            r = r_of(z, z)
            Ji = jax.jacfwd(lambda xi: r_of(xi, z))(z)
            Jj = jax.jacfwd(lambda xj: r_of(z, xj))(z)
            return r, Ji, Jj

        return jax.vmap(one_edge)(jnp.arange(E))

    def _apply_one(R0, t0, s0, x):
        dR, dt, ds = lie.sim3_exp(x)
        return dR @ R0, ds * (dR @ t0) + dt, ds * s0

    lam = jnp.asarray(lambda_init, dtype)
    w_edge = graph.weight * graph.valid.astype(dtype)
    cost = jnp.sum(w_edge * jnp.sum(edge_residuals(R, t, s) ** 2, -1))
    for _ in range(n_iters):
        r, Ji, Jj = linearize(R, t, s)
        H = jnp.zeros((K, 7, K, 7), dtype)
        b = jnp.zeros((K, 7), dtype)
        wJi = Ji * w_edge[:, None, None]
        H = H.at[graph.i_idx, :, graph.i_idx, :].add(jnp.einsum("eki,ekj->eij", wJi, Ji))
        H = H.at[graph.i_idx, :, graph.j_idx, :].add(jnp.einsum("eki,ekj->eij", wJi, Jj))
        H = H.at[graph.j_idx, :, graph.i_idx, :].add(
            jnp.einsum("eki,ekj->eij", Jj * w_edge[:, None, None], Ji))
        H = H.at[graph.j_idx, :, graph.j_idx, :].add(
            jnp.einsum("eki,ekj->eij", Jj * w_edge[:, None, None], Jj))
        b = b.at[graph.i_idx].add(jnp.einsum("eki,ek->ei", wJi, -r))
        b = b.at[graph.j_idx].add(jnp.einsum("eki,ek->ei", Jj * w_edge[:, None, None], -r))

        A = H.reshape(7 * K, 7 * K)
        rhs = b.reshape(7 * K)
        free = jnp.logical_not(fixed_dof).astype(dtype)
        A = A * free[:, None] * free[None, :] + jnp.diag(fixed_dof.astype(dtype))
        A = A + lam * jnp.eye(7 * K, dtype=dtype)
        rhs = rhs * free
        dx = jnp.linalg.solve(A, rhs).reshape(K, 7)
        Rn, tn, sn = apply(R, t, s, dx)
        new_cost = jnp.sum(w_edge * jnp.sum(edge_residuals(Rn, tn, sn) ** 2, -1))
        # traced accept/reject (the former host-side bool() forced a
        # blocking device sync per iteration AND barred jitting the whole
        # pose-graph program)
        accept = new_cost < cost
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        s = jnp.where(accept, sn, s)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
    return R, t, s
