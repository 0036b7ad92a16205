"""Per-frame pose optimization — the 20 Hz tracking hot path.

Replaces the reference's three `Optimizer::PoseOptimization` overloads:

- `pose_optimize_vision`    <- PoseOptimization(Frame)   (Optimizer.cc:2548)
  Single SE3 camera vs fixed landmarks; 4 rounds x 10 LM iterations with
  chi2-5.991 inlier re-classification between rounds, Huber kernel dropped
  after round 2.
- `pose_optimize_vi_kf`     <- PoseOptimization(Frame, KeyFrame, preint,
  gw, Tbc, bComputeMarg)  (Optimizer.cc:326-597)
  Frame NavState (PVR+bias) free, last keyframe fixed; IMU PVR edge + bias
  random-walk edge + unary VI reprojection edges; optional 15x15 marginal
  information for the next frame's prior (Optimizer.cc:567-582).
- `pose_optimize_vi_frame`  <- PoseOptimization(Frame, Frame, preint, gw,
  Tbc, bComputeMarg)  (Optimizer.cc:600-977)
  Both frames free; the last frame carries a 15-dim prior edge
  (EdgeNavStatePriorPVRBias) from its marginalization info; the current
  frame's marginal info is the Schur complement over the last frame.

All variants are fixed-shape jitted programs: observations padded to a
static O with a valid mask; rounds/iterations are static Python ints.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import imu as imu_ops
from ..utils import lie
from . import factors
from .ba import Camera


class PoseObs(NamedTuple):
    """Padded per-frame observations of (fixed) map points.

    u_right/has_right (optional) add the stereo residual row (u_r = u -
    bf/z, chi2 7.815) — g2o EdgeStereoSE3ProjectXYZOnlyPose
    (Optimizer.cc:2619-2650)."""

    pts: jax.Array  # (O, 3) world positions
    uv: jax.Array  # (O, 2)
    inv_sigma2: jax.Array  # (O,)
    valid: jax.Array  # (O,) bool
    u_right: jax.Array | None = None  # (O,)
    has_right: jax.Array | None = None  # (O,) bool


def _pose_chi2_delta(obs: PoseObs):
    if obs.u_right is None:
        return factors.CHI2_MONO
    return jnp.where(obs.has_right, factors.CHI2_STEREO, factors.CHI2_MONO)


# ----------------------------------------------------------------------------
# Vision-only pose optimization.
# ----------------------------------------------------------------------------


def _vision_linearize(Rcw, tcw, obs: PoseObs, cam: Camera, active, robust):
    if obs.u_right is None:
        err, Pc = factors.reproj_residual(
            Rcw, tcw, obs.pts, obs.uv, cam.fx, cam.fy, cam.cx, cam.cy
        )
        J_pose, _ = factors.reproj_jacobians(Rcw, Pc, cam.fx, cam.fy)
    else:
        obs3 = jnp.concatenate([obs.uv, obs.u_right[:, None]], -1)
        err, Pc = factors.reproj_stereo_residual(
            Rcw, tcw, obs.pts, obs3, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
        )
        J_pose, _ = factors.reproj_stereo_jacobians(Rcw, Pc, cam.fx, cam.fy, cam.bf)
        row = obs.has_right.astype(err.dtype)
        err = err.at[:, 2].multiply(row)
        J_pose = J_pose.at[:, 2].multiply(row[:, None])
    chi2 = obs.inv_sigma2 * jnp.sum(err * err, axis=-1)
    w = obs.inv_sigma2
    if robust:
        w = w * factors.huber_weights(chi2, _pose_chi2_delta(obs))
    good = active & (Pc[..., 2] > 1e-6)
    w = w * good.astype(w.dtype)
    return err, J_pose, w, chi2, good


def _robust_cost(chi2, good, robust, d2=factors.CHI2_MONO):
    if robust:
        rho = jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 1e-12)) - d2)
    else:
        rho = chi2
    return jnp.sum(rho * good.astype(chi2.dtype))


def pose_optimize_vision(
    Rcw: jax.Array,
    tcw: jax.Array,
    obs: PoseObs,
    cam: Camera,
    n_rounds: int = 4,
    n_iters: int = 10,
    lambda_init: float = 1e-3,
):
    """Returns (Rcw, tcw, inlier_mask, n_inliers).

    Schedule mirrors Optimizer.cc:2548: each round optimizes from the
    current estimate with outliers excluded, then re-classifies *all*
    observations by chi2 at the new pose; the Huber kernel is dropped for
    rounds >= 3 (reference `if(it==2) setRobustKernel(0)` before round 4).
    """
    dtype = tcw.dtype
    # depth-gate the starting active set so round-0 cost only covers
    # points in front of the initial pose
    _, Pc0 = factors.reproj_residual(Rcw, tcw, obs.pts, obs.uv, cam.fx, cam.fy, cam.cx, cam.cy)
    active = obs.valid & (Pc0[..., 2] > 1e-6)

    def lm_round(Rcw, tcw, active, robust):
        # early-exit LM (lax.while_loop): g2o's Levenberg terminates when
        # the gain drops below threshold; typical pose refinements
        # converge in a handful of iterations, and on this backend the
        # fused frame step's latency is dominated by the SERIAL kernel
        # chain of these loops (round-5 profiling: ~50 ms/frame blocked vs
        # ~10 ms of actual compute), so skipping converged iterations is
        # the whole-frame latency lever. Math per executed iteration is
        # unchanged.
        def cond(carry):
            i, _, _, _, _, done = carry
            return (i < n_iters) & ~done

        def body(carry):
            i, Rcw, tcw, lam, cost, _ = carry
            err, J, w, chi2, good = _vision_linearize(Rcw, tcw, obs, cam, active, robust)
            H = jnp.einsum("oki,o,okj->ij", J, w, J)
            b = jnp.einsum("oki,o,ok->i", J, w, -err)
            A = H + lam * jnp.eye(6, dtype=dtype)
            dx = jnp.linalg.solve(A, b)
            dR, dt = lie.se3_exp(dx)
            Rc, tc = lie.se3_mul(dR, dt, Rcw, tcw)
            Rc = lie.normalize_rotation(Rc)
            _, _, _, chi2_new, _ = _vision_linearize(Rc, tc, obs, cam, active, robust)
            new_cost = _robust_cost(chi2_new, active, robust, _pose_chi2_delta(obs))
            accept = new_cost < cost
            done = (jnp.sum(dx * dx) < 1e-12) | (
                accept & (cost - new_cost < 1e-6 * jnp.maximum(cost, 1e-12))
            )
            Rcw = jnp.where(accept, Rc, Rcw)
            tcw = jnp.where(accept, tc, tcw)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return i + 1, Rcw, tcw, lam, cost, done

        _, _, _, chi0, _ = _vision_linearize(Rcw, tcw, obs, cam, active, robust)
        cost0 = _robust_cost(chi0, active, robust, _pose_chi2_delta(obs))
        _, Rcw, tcw, _, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), Rcw, tcw,
             jnp.asarray(lambda_init, dtype), cost0, jnp.asarray(False)),
        )
        return Rcw, tcw

    for rnd in range(n_rounds):
        robust = rnd < 3
        Rcw, tcw = lm_round(Rcw, tcw, active, robust)
        # Re-classify over ALL valid observations (outliers can come back).
        _, _, _, chi2, _ = _vision_linearize(
            Rcw, tcw, obs, cam, obs.valid, robust=False
        )
        _, Pc = factors.reproj_residual(
            Rcw, tcw, obs.pts, obs.uv, cam.fx, cam.fy, cam.cx, cam.cy
        )
        active = obs.valid & (chi2 <= _pose_chi2_delta(obs)) & (Pc[..., 2] > 0)

    return Rcw, tcw, active, jnp.sum(active)


# ----------------------------------------------------------------------------
# Visual-inertial pose optimization.
# ----------------------------------------------------------------------------


class VIPoseProblem(NamedTuple):
    """Inputs shared by both VI pose-opt variants."""

    obs: PoseObs  # current-frame observations (fixed landmarks)
    pre: imu_ops.PreintState  # preintegration last->current
    gravity: jax.Array  # (3,)
    Rcb: jax.Array  # (3, 3) camera-from-body rotation
    pcb: jax.Array  # (3,) camera-from-body translation
    noise: imu_ops.ImuNoise


def _vi_reproj_linearize(ns: imu_ops.NavState, prob: VIPoseProblem, cam: Camera, active, robust):
    obs = prob.obs
    err, Pc = factors.reproj_vi_residual(
        ns.R, ns.p, obs.pts, obs.uv, prob.Rcb, prob.pcb, cam.fx, cam.fy, cam.cx, cam.cy
    )
    _, J_pvr = factors.reproj_vi_jacobians(ns.R, ns.p, obs.pts, Pc, prob.Rcb, cam.fx, cam.fy)
    chi2 = obs.inv_sigma2 * jnp.sum(err * err, axis=-1)
    w = obs.inv_sigma2
    if robust:
        w = w * factors.huber_weights(chi2, factors.CHI2_MONO)
    good = active & (Pc[..., 2] > 1e-6)
    w = w * good.astype(w.dtype)
    return err, J_pvr, w, chi2, good


def _imu_edge_system(ns_i: imu_ops.NavState, ns_j: imu_ops.NavState, prob: VIPoseProblem):
    """IMU PVR + bias-RW edge contributions.

    Returns (r9, J_i9, J_j9, Jb9, info9, r6, info6). The 9-dim edge couples
    (PVR_i, PVR_j, Bias_i); the 6-dim random walk couples (Bias_i, Bias_j).
    """
    r9 = factors.imu_pvr_residual(
        ns_i.p, ns_i.v, ns_i.R, ns_j.p, ns_j.v, ns_j.R, ns_i.dbg, ns_i.dba, prob.pre, prob.gravity
    )
    J_i, J_j, J_b = factors.imu_pvr_jacobians(
        ns_i.p, ns_i.v, ns_i.R, ns_j.p, ns_j.v, ns_j.R, ns_i.dbg, prob.pre, prob.gravity, r9[6:9]
    )
    info9 = factors.imu_pvr_information(prob.pre)
    r6 = factors.bias_rw_residual(
        ns_i.bg, ns_i.ba, ns_i.dbg, ns_i.dba, ns_j.bg, ns_j.ba, ns_j.dbg, ns_j.dba
    )
    info6 = factors.bias_rw_information(prob.noise, jnp.maximum(prob.pre.dt, 1e-3))
    return r9, J_i, J_j, J_b, info9, r6, info6


def _edge_h_b(r, J, info, delta2=None):
    """Robustified (H, b, chi2) contribution of one small edge."""
    chi2 = r @ info @ r
    w = 1.0
    if delta2 is not None:
        w = factors.huber_weights(chi2, delta2)
    H = w * (J.T @ info @ J)
    b = w * (J.T @ info @ -r)
    return H, b, chi2


def pose_optimize_vi_kf(
    ns: imu_ops.NavState,
    ns_kf: imu_ops.NavState,
    prob: VIPoseProblem,
    cam: Camera,
    compute_marg: bool = True,
    n_rounds: int = 4,
    n_iters: int = 10,
    lambda_init: float = 1e-2,
):
    """Optimize current frame NavState vs a FIXED last keyframe.

    Returns (ns, inlier_mask, n_inliers, marg_info15). marg_info15 is the
    15x15 information of the frame state at convergence (the inverse of the
    marginal covariance the reference extracts via computeMarginals,
    Optimizer.cc:567-582); zeros if compute_marg=False.
    """
    dtype = ns.p.dtype
    _, Pc0 = factors.reproj_vi_residual(
        ns.R, ns.p, prob.obs.pts, prob.obs.uv, prob.Rcb, prob.pcb,
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    active = prob.obs.valid & (Pc0[..., 2] > 1e-6)

    def state15_hessian(ns, active, robust):
        """Full (H (15,15), b (15,), cost) at the current state."""
        err, J_pvr, w, chi2, _ = _vi_reproj_linearize(ns, prob, cam, active, robust)
        H_pp = jnp.einsum("oki,o,okj->ij", J_pvr, w, J_pvr)
        b_p = jnp.einsum("oki,o,ok->i", J_pvr, w, -err)
        H = jnp.zeros((15, 15), dtype).at[:9, :9].add(H_pp)
        b = jnp.zeros((15,), dtype).at[:9].add(b_p)
        cost = _robust_cost(chi2, active, robust)

        r9, J_i, J_j, J_b, info9, r6, info6 = _imu_edge_system(ns_kf, ns, prob)
        # Current frame is vertex j for the PVR edge; its bias is vertex j
        # of the RW edge. The kf (vertex i) is fixed.
        H9, b9, c9 = _edge_h_b(r9, J_j, info9, factors.CHI2_PVR)
        H = H.at[:9, :9].add(H9)
        b = b.at[:9].add(b9)
        J6 = jnp.eye(6, dtype=dtype)  # d r6 / d (dbg_j, dba_j)
        H6, b6, c6 = _edge_h_b(r6, J6, info6, factors.CHI2_BIAS)
        H = H.at[9:, 9:].add(H6)
        b = b.at[9:].add(b6)
        cost = cost + c9 + c6
        return H, b, cost

    def apply(ns, dx):
        return ns.inc_small_pvr(dx[:9]).inc_small_bias(dx[9:])

    def lm_round(ns, active, robust):
        # early-exit LM — see pose_optimize_vision.lm_round
        def cond(carry):
            i, _, _, _, done = carry
            return (i < n_iters) & ~done

        def body(carry):
            i, ns, lam, cost = carry[:4]
            H, b, _ = state15_hessian(ns, active, robust)
            A = H + lam * jnp.eye(15, dtype=dtype)
            dx = jnp.linalg.solve(A, b)
            cand = apply(ns, dx)
            _, _, new_cost = state15_hessian(cand, active, robust)
            accept = new_cost < cost
            done = (jnp.sum(dx * dx) < 1e-12) | (
                accept & (cost - new_cost < 1e-6 * jnp.maximum(cost, 1e-12))
            )
            ns = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), cand, ns)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return i + 1, ns, lam, cost, done

        _, _, cost0 = state15_hessian(ns, active, robust)
        _, ns, _, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), ns, jnp.asarray(lambda_init, dtype),
             cost0, jnp.asarray(False)),
        )
        return ns

    for rnd in range(n_rounds):
        robust = rnd < 3
        ns = lm_round(ns, active, robust)
        err, Pc = factors.reproj_vi_residual(
            ns.R, ns.p, prob.obs.pts, prob.obs.uv, prob.Rcb, prob.pcb,
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        chi2 = prob.obs.inv_sigma2 * jnp.sum(err * err, axis=-1)
        active = prob.obs.valid & (chi2 <= factors.CHI2_MONO) & (Pc[..., 2] > 0)

    if compute_marg:
        H, _, _ = state15_hessian(ns, active, robust=False)
        marg_info = H
    else:
        marg_info = jnp.zeros((15, 15), dtype)
    return ns, active, jnp.sum(active), marg_info


def pose_optimize_vi_frame(
    ns: imu_ops.NavState,
    ns_last: imu_ops.NavState,
    prior_last: imu_ops.NavState,
    prior_info_last: jax.Array,  # (15, 15)
    prob: VIPoseProblem,
    cam: Camera,
    compute_marg: bool = True,
    n_rounds: int = 4,
    n_iters: int = 10,
    lambda_init: float = 1e-2,
):
    """Optimize (last frame, current frame) jointly; last frame carries a
    15-dim marginalization prior. Returns (ns, ns_last, inliers, n_inliers,
    marg_info15) with marg_info the Schur complement onto the current frame.

    Mirrors Optimizer.cc:600-977 (EdgeNavStatePriorPVRBias at :667-679).
    """
    dtype = ns.p.dtype
    _, Pc0 = factors.reproj_vi_residual(
        ns.R, ns.p, prob.obs.pts, prob.obs.uv, prob.Rcb, prob.pcb,
        cam.fx, cam.fy, cam.cx, cam.cy,
    )
    active = prob.obs.valid & (Pc0[..., 2] > 1e-6)

    def full_system(ns_l, ns_c, active, robust):
        """30-dof system: x = [last(15), cur(15)]."""
        H = jnp.zeros((30, 30), dtype)
        b = jnp.zeros((30,), dtype)

        err, J_pvr, w, chi2, _ = _vi_reproj_linearize(ns_c, prob, cam, active, robust)
        H = H.at[15:24, 15:24].add(jnp.einsum("oki,o,okj->ij", J_pvr, w, J_pvr))
        b = b.at[15:24].add(jnp.einsum("oki,o,ok->i", J_pvr, w, -err))
        cost = _robust_cost(chi2, active, robust)

        r9, J_i, J_j, J_b, info9, r6, info6 = _imu_edge_system(ns_l, ns_c, prob)
        J9 = jnp.zeros((9, 30), dtype)
        J9 = J9.at[:, 0:9].set(J_i).at[:, 15:24].set(J_j).at[:, 9:15].set(J_b)
        H9, b9, c9 = _edge_h_b(r9, J9, info9, factors.CHI2_PVR)
        H, b, cost = H + H9, b + b9, cost + c9

        J6 = jnp.zeros((6, 30), dtype)
        J6 = J6.at[:, 9:15].set(-jnp.eye(6, dtype=dtype)).at[:, 24:30].set(jnp.eye(6, dtype=dtype))
        H6, b6, c6 = _edge_h_b(r6, J6, info6, factors.CHI2_BIAS)
        H, b, cost = H + H6, b + b6, cost + c6

        rp = factors.prior_residual(ns_l, prior_last)
        Jp_pvr, Jp_bias = factors.prior_jacobians(ns_l, rp[6:9])
        Jp = jnp.zeros((15, 30), dtype)
        Jp = Jp.at[:, 0:9].set(Jp_pvr).at[:, 9:15].set(Jp_bias)
        Hp, bp, cp = _edge_h_b(rp, Jp, prior_info_last, factors.CHI2_PRIOR)
        H, b, cost = H + Hp, b + bp, cost + cp
        return H, b, cost

    def apply(ns_l, ns_c, dx):
        ns_l = ns_l.inc_small_pvr(dx[0:9]).inc_small_bias(dx[9:15])
        ns_c = ns_c.inc_small_pvr(dx[15:24]).inc_small_bias(dx[24:30])
        return ns_l, ns_c

    def lm_round(ns_l, ns_c, active, robust):
        # early-exit LM — see pose_optimize_vision.lm_round
        def cond(carry):
            return (carry[0] < n_iters) & ~carry[5]

        def body(carry):
            i, ns_l, ns_c, lam, cost, _ = carry
            H, b, _ = full_system(ns_l, ns_c, active, robust)
            A = H + lam * jnp.eye(30, dtype=dtype)
            dx = jnp.linalg.solve(A, b)
            cand_l, cand_c = apply(ns_l, ns_c, dx)
            _, _, new_cost = full_system(cand_l, cand_c, active, robust)
            accept = new_cost < cost
            done = (jnp.sum(dx * dx) < 1e-12) | (
                accept & (cost - new_cost < 1e-6 * jnp.maximum(cost, 1e-12))
            )
            ns_l = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), cand_l, ns_l)
            ns_c = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), cand_c, ns_c)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return i + 1, ns_l, ns_c, lam, cost, done

        _, _, cost0 = full_system(ns_l, ns_c, active, robust)
        _, ns_l, ns_c, _, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), ns_l, ns_c,
             jnp.asarray(lambda_init, dtype), cost0, jnp.asarray(False)),
        )
        return ns_l, ns_c

    for rnd in range(n_rounds):
        robust = rnd < 3
        ns_last, ns = lm_round(ns_last, ns, active, robust)
        err, Pc = factors.reproj_vi_residual(
            ns.R, ns.p, prob.obs.pts, prob.obs.uv, prob.Rcb, prob.pcb,
            cam.fx, cam.fy, cam.cx, cam.cy,
        )
        chi2 = prob.obs.inv_sigma2 * jnp.sum(err * err, axis=-1)
        active = prob.obs.valid & (chi2 <= factors.CHI2_MONO) & (Pc[..., 2] > 0)

    if compute_marg:
        H, _, _ = full_system(ns_last, ns, active, robust=False)
        H_ll = H[:15, :15] + 1e-9 * jnp.eye(15, dtype=dtype)
        H_cc = H[15:, 15:]
        H_cl = H[15:, :15]
        marg_info = H_cc - H_cl @ jnp.linalg.solve(H_ll, H_cl.T)
    else:
        marg_info = jnp.zeros((15, 15), dtype)
    return ns, ns_last, active, jnp.sum(active), marg_info
