"""Bundle adjustment drivers: Levenberg-Marquardt over the Schur-reduced
camera system, with the reference's iteration schedules and chi2 gating.

Replaces the g2o-based `Optimizer::{BundleAdjustment, LocalBundleAdjustment,
GlobalBundleAdjustemnt, LocalBundleAdjustmentNavState}` entry points
(`/root/reference/src/Optimizer.cc:2358,2763,2350,980`) with fully jitted
fixed-shape programs:

- observations are padded to a static O and masked by `valid`;
- outlier gating between rounds (chi2 > 5.991 at the reference's schedule,
  Optimizer.cc:1284-1338, 2851-2873) flips `valid` bits instead of removing
  edges;
- the LM loop is a `lax.fori_loop` with accept/reject damping control.

Monocular only for now (stereo observation rows extend J to 3 rows later).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import imu as imu_ops
from ..utils import lie
from . import factors, schur


class Camera(NamedTuple):
    """Pinhole intrinsics (static floats — shapes stay compile-constant).

    `bf` = baseline * fx (the reference's mbf, Frame.h) — 0 for monocular;
    enables the stereo observation row u_right = u - bf / z."""

    fx: float
    fy: float
    cx: float
    cy: float
    bf: float = 0.0


class VisionBAState(NamedTuple):
    Rcw: jax.Array  # (K, 3, 3)
    tcw: jax.Array  # (K, 3)
    points: jax.Array  # (L, 3)


class BAObservations(NamedTuple):
    cam_idx: jax.Array  # (O,) int32
    lm_idx: jax.Array  # (O,) int32
    uv: jax.Array  # (O, 2)
    inv_sigma2: jax.Array  # (O,) information scale (1/sigma^2 per octave)
    valid: jax.Array  # (O,) bool — padding and culled outliers
    # stereo extension (None for monocular problems): measured right-image
    # u coordinate per observation + its availability mask. Rows with
    # has_right add a third residual u_r - (u_pred - bf/z) with the stereo
    # chi2 threshold 7.815 (EdgeStereoSE3ProjectXYZ, Optimizer.cc:2447).
    u_right: jax.Array | None = None  # (O,)
    has_right: jax.Array | None = None  # (O,) bool


def _chi2_delta(obs: BAObservations):
    if obs.u_right is None:
        return factors.CHI2_MONO
    return jnp.where(obs.has_right, factors.CHI2_STEREO, factors.CHI2_MONO)


def _linearize_vision(state: VisionBAState, obs: BAObservations, cam: Camera, robust: bool):
    """Evaluate residuals/Jacobians/weights for all observations.

    Residual rows are (2,) for monocular problems and (3,) when the
    observation set carries stereo rows (third row masked per-observation).
    """
    Rcw = state.Rcw[obs.cam_idx]
    tcw = state.tcw[obs.cam_idx]
    Pw = state.points[obs.lm_idx]
    if obs.u_right is None:
        err, Pc = factors.reproj_residual(
            Rcw, tcw, Pw, obs.uv, cam.fx, cam.fy, cam.cx, cam.cy
        )
        J_pose, J_point = factors.reproj_jacobians(Rcw, Pc, cam.fx, cam.fy)
    else:
        obs3 = jnp.concatenate([obs.uv, obs.u_right[:, None]], -1)
        err, Pc = factors.reproj_stereo_residual(
            Rcw, tcw, Pw, obs3, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
        )
        J_pose, J_point = factors.reproj_stereo_jacobians(
            Rcw, Pc, cam.fx, cam.fy, cam.bf
        )
        row_mask = obs.has_right.astype(err.dtype)
        err = err * jnp.stack([jnp.ones_like(row_mask)] * 2 + [row_mask], -1)
        J_pose = J_pose.at[:, 2].multiply(row_mask[:, None])
        J_point = J_point.at[:, 2].multiply(row_mask[:, None])
    chi2 = obs.inv_sigma2 * jnp.sum(err * err, axis=-1)
    w = obs.inv_sigma2
    if robust:
        w = w * factors.huber_weights(chi2, _chi2_delta(obs))
    # Points behind the camera contribute nothing (reference drops them
    # via depth checks before optimization).
    good = obs.valid & (Pc[..., 2] > 1e-6)
    w = w * good.astype(w.dtype)
    return err, J_pose, J_point, w, chi2, good


def _vision_chi2(state: VisionBAState, obs: BAObservations, cam: Camera, robust: bool):
    err, _, _, w_unused, chi2, good = _linearize_vision(state, obs, cam, robust)
    # Huberized total cost (rho(chi2)) so accept/reject matches the robust
    # objective; padding contributes zero. The mask is obs.valid (NOT the
    # depth-gated `good`): a candidate state that throws points behind the
    # camera must see their huge clamped-z residuals, otherwise the cost
    # collapses to ~0 and the garbage step is accepted.
    if robust:
        d2 = _chi2_delta(obs)
        rho = jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 1e-12)) - d2)
    else:
        rho = chi2
    return jnp.sum(rho * obs.valid.astype(chi2.dtype))


def _apply_update_vision(state: VisionBAState, dx_cam, dx_pts):
    """Left-multiplicative SE3 update per camera; additive for points."""
    dR, dt = lie.se3_exp(dx_cam)  # (K,3,3), (K,3)
    Rcw, tcw = lie.se3_mul(dR, dt, state.Rcw, state.tcw)
    Rcw = lie.normalize_rotation(Rcw)
    return VisionBAState(Rcw=Rcw, tcw=tcw, points=state.points + dx_pts)


def _lm_round_vision(
    state: VisionBAState,
    obs: BAObservations,
    cam: Camera,
    fixed_cam_mask: jax.Array,
    n_iters: int,
    robust: bool,
    lambda_init: jax.Array,
):
    """One LM round (fixed iteration count, accept/reject damping)."""
    K = state.Rcw.shape[0]
    L = state.points.shape[0]
    D = 6

    fixed_dof = jnp.repeat(fixed_cam_mask, D)

    # early-exit LM (see solver/pose.py): converged rounds skip their
    # remaining iterations' serial kernel chains — the per-keyframe BA is
    # a large share of the per-insertion device latency
    def cond(carry):
        return (carry[0] < n_iters) & ~carry[4]

    def body(carry):
        i, state, lam, cost, _ = carry
        err, J_pose, J_point, w, _, _ = _linearize_vision(state, obs, cam, robust)
        sys = schur.ObsSystem(
            J_c=J_pose, J_p=J_point, r=-err, w=w, cam_idx=obs.cam_idx, lm_idx=obs.lm_idx
        )
        S, b, H_ll_inv, b_l, B = schur.build_reduced_camera_system(
            sys, K, L, D, lam, fixed_cam_mask
        )
        dx = schur.solve_cameras(S, b, lam, fixed_dof)
        dx_cam = dx.reshape(K, D)
        dx_pts = schur.back_substitute_landmarks(
            B, obs.cam_idx, obs.lm_idx, H_ll_inv, b_l, dx_cam, L
        )
        cand = _apply_update_vision(state, dx_cam, dx_pts)
        new_cost = _vision_chi2(cand, obs, cam, robust)
        accept = new_cost < cost
        done = accept & (cost - new_cost < 1e-6 * jnp.maximum(cost, 1e-12))
        state = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), cand, state)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        return i + 1, state, lam, cost, done

    cost0 = _vision_chi2(state, obs, cam, robust)
    _, state, lam, cost, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), state, lambda_init, cost0,
         jnp.asarray(False)),
    )
    return state, lam, cost


def gate_outliers_vision(state: VisionBAState, obs: BAObservations, cam: Camera, chi2_thr=None):
    """Flip valid bits for observations with chi2 > thr or negative depth.

    Mirrors the reference's inter-round erase of outlier edges
    (Optimizer.cc:2851-2873 for pose opt, 1284-1338 for VI local BA);
    threshold defaults to 5.991 for mono rows, 7.815 for stereo rows.
    """
    err, _, _, _, chi2, _ = _linearize_vision(state, obs, cam, robust=False)
    if chi2_thr is None:
        chi2_thr = _chi2_delta(obs)
    Rcw = state.Rcw[obs.cam_idx]
    tcw = state.tcw[obs.cam_idx]
    Pw = state.points[obs.lm_idx]
    z = (jnp.einsum("oij,oj->oi", Rcw, Pw) + tcw)[..., 2]
    keep = (chi2 <= chi2_thr) & (z > 0)
    return obs._replace(valid=obs.valid & keep)


def bundle_adjust_vision(
    state: VisionBAState,
    obs: BAObservations,
    cam: Camera,
    fixed_cam_mask: jax.Array,
    n_rounds: int = 2,
    iters_per_round: tuple = (5, 10),
    robust_rounds: tuple = (True, False),
    lambda_init: float = 1e-4,
):
    """Local/global BA: rounds of LM with outlier gating in between.

    Default schedule = the reference's local BA (5 robust iters, cull
    chi2>5.991, 10 non-robust iters — Optimizer.cc:2833-2881). Global BA
    callers pass n_rounds=1, iters_per_round=(20,), robust_rounds=(True,).
    """
    lam = jnp.asarray(lambda_init, state.points.dtype)
    # Pre-gate: drop observations already behind the camera at the input
    # state so they neither enter the system nor dominate the round cost
    # (the reference drops negative-depth points before optimization).
    obs = _depth_gate(state, obs, cam)
    for rnd in range(n_rounds):
        state, lam, _ = _lm_round_vision(
            state, obs, cam, fixed_cam_mask, iters_per_round[rnd], robust_rounds[rnd], lam
        )
        if rnd < n_rounds - 1:
            obs = gate_outliers_vision(state, obs, cam)
    return state, obs


def _depth_gate(state: VisionBAState, obs: BAObservations, cam: Camera):
    Rcw = state.Rcw[obs.cam_idx]
    tcw = state.tcw[obs.cam_idx]
    Pw = state.points[obs.lm_idx]
    z = (jnp.einsum("oij,oj->oi", Rcw, Pw) + tcw)[..., 2]
    return obs._replace(valid=obs.valid & (z > 1e-6))


# ----------------------------------------------------------------------------
# Visual-inertial local BA over the temporal keyframe window.
# Replaces Optimizer::LocalBundleAdjustmentNavState (Optimizer.cc:980-1449):
# window KFs are free (PVR 9 + bias 6 = 15 dof), the KF before the window
# plus covisible vision KFs are fixed, landmarks are marginalized, IMU
# preintegration + bias random-walk edges chain consecutive window KFs.
# ----------------------------------------------------------------------------

VI_D = 15  # per-camera dof: [dP(3), dV(3), dPhi(3), dbg(3), dba(3)]


class VIBAState(NamedTuple):
    nav: imu_ops.NavState  # batched over K cameras
    points: jax.Array  # (L, 3)


class ImuChain(NamedTuple):
    """IMU edges between consecutive keyframes (padded to fixed E)."""

    i_idx: jax.Array  # (E,) int — earlier KF
    j_idx: jax.Array  # (E,) int — later KF
    pre: imu_ops.PreintState  # batched (E, ...)
    valid: jax.Array  # (E,) bool


def _vi_reproj_linearize_ba(state: VIBAState, obs: BAObservations, cam: Camera, Rcb, pcb, robust):
    Rwb = state.nav.R[obs.cam_idx]
    Pwb = state.nav.p[obs.cam_idx]
    Pw = state.points[obs.lm_idx]
    err, Pc = factors.reproj_vi_residual(Rwb, Pwb, Pw, obs.uv, Rcb, pcb, cam.fx, cam.fy, cam.cx, cam.cy)
    J_point, J_pvr = factors.reproj_vi_jacobians(Rwb, Pwb, Pw, Pc, Rcb, cam.fx, cam.fy)
    O = obs.uv.shape[0]
    J_c = jnp.concatenate([J_pvr, jnp.zeros((O, 2, 6), J_pvr.dtype)], axis=-1)  # (O,2,15)
    chi2 = obs.inv_sigma2 * jnp.sum(err * err, axis=-1)
    w = obs.inv_sigma2
    if robust:
        w = w * factors.huber_weights(chi2, factors.CHI2_MONO)
    good = obs.valid & (Pc[..., 2] > 1e-6)
    w = w * good.astype(w.dtype)
    return err, J_c, J_point, w, chi2, good


def _imu_chain_blocks(state: VIBAState, chain: ImuChain, gravity, noise: imu_ops.ImuNoise):
    """Batched (H_ii, H_ij, H_jj, b_i, b_j, cost) for IMU + bias-RW edges."""
    nav = state.nav
    g = lambda a: a[chain.i_idx]
    h = lambda a: a[chain.j_idx]
    Pi, Vi, Ri = g(nav.p), g(nav.v), g(nav.R)
    Pj, Vj, Rj = h(nav.p), h(nav.v), h(nav.R)
    dbg_i, dba_i = g(nav.dbg), g(nav.dba)

    r9 = factors.imu_pvr_residual(Pi, Vi, Ri, Pj, Vj, Rj, dbg_i, dba_i, chain.pre, gravity)
    J_i, J_j, J_b = factors.imu_pvr_jacobians(
        Pi, Vi, Ri, Pj, Vj, Rj, dbg_i, chain.pre, gravity, r9[..., 6:9]
    )
    info9 = factors.imu_pvr_information(chain.pre)
    chi9 = jnp.einsum("ei,eij,ej->e", r9, info9, r9)
    w9 = factors.huber_weights(chi9, factors.CHI2_PVR) * chain.valid.astype(r9.dtype)

    E = r9.shape[0]
    dtype = r9.dtype
    Ji_full = jnp.zeros((E, 9, VI_D), dtype).at[:, :, 0:9].set(J_i).at[:, :, 9:15].set(J_b)
    Jj_full = jnp.zeros((E, 9, VI_D), dtype).at[:, :, 0:9].set(J_j)

    r6 = factors.bias_rw_residual(
        g(nav.bg), g(nav.ba), g(nav.dbg), g(nav.dba), h(nav.bg), h(nav.ba), h(nav.dbg), h(nav.dba)
    )
    info6 = factors.bias_rw_information(noise, jnp.maximum(chain.pre.dt, 1e-3))
    chi6 = jnp.einsum("ei,eij,ej->e", r6, info6, r6)
    w6 = factors.huber_weights(chi6, factors.CHI2_BIAS) * chain.valid.astype(dtype)
    J6_i = jnp.zeros((E, 6, VI_D), dtype).at[:, :, 9:15].set(-jnp.eye(6, dtype=dtype))
    J6_j = jnp.zeros((E, 6, VI_D), dtype).at[:, :, 9:15].set(jnp.eye(6, dtype=dtype))

    def hb(Ja, Jb_, r, info, w):
        H_ab = jnp.einsum("eki,ekl,elj->eij", Ja, info, Jb_) * w[:, None, None]
        return H_ab

    H_ii = hb(Ji_full, Ji_full, r9, info9, w9) + hb(J6_i, J6_i, r6, info6, w6)
    H_ij = hb(Ji_full, Jj_full, r9, info9, w9) + hb(J6_i, J6_j, r6, info6, w6)
    H_jj = hb(Jj_full, Jj_full, r9, info9, w9) + hb(J6_j, J6_j, r6, info6, w6)
    b_i = (
        jnp.einsum("eki,ekl,el->ei", Ji_full, info9, -r9) * w9[:, None]
        + jnp.einsum("eki,ekl,el->ei", J6_i, info6, -r6) * w6[:, None]
    )
    b_j = (
        jnp.einsum("eki,ekl,el->ei", Jj_full, info9, -r9) * w9[:, None]
        + jnp.einsum("eki,ekl,el->ei", J6_j, info6, -r6) * w6[:, None]
    )
    # Huberized cost of the chain edges.
    def rho(chi2, d2):
        return jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 1e-12)) - d2)

    cost = jnp.sum(chain.valid * (rho(chi9, factors.CHI2_PVR) + rho(chi6, factors.CHI2_BIAS)))
    return H_ii, H_ij, H_jj, b_i, b_j, cost


def _vi_cost(state, obs, cam, Rcb, pcb, chain, gravity, noise, robust):
    # Cost mask is obs.valid, not the depth-gated `good` — see _vision_chi2.
    _, _, _, _, chi2, good = _vi_reproj_linearize_ba(state, obs, cam, Rcb, pcb, robust)
    if robust:
        d2 = factors.CHI2_MONO
        rho = jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * jnp.maximum(chi2, 1e-12)) - d2)
    else:
        rho = chi2
    cost_v = jnp.sum(rho * obs.valid.astype(chi2.dtype))
    *_, cost_i = _imu_chain_blocks(state, chain, gravity, noise)
    return cost_v + cost_i


def _apply_update_vi(state: VIBAState, dx_cam, dx_pts):
    nav = state.nav.inc_small_pvr(dx_cam[:, 0:9]).inc_small_bias(dx_cam[:, 9:15])
    nav = nav._replace(R=lie.normalize_rotation(nav.R))
    return VIBAState(nav=nav, points=state.points + dx_pts)


def bundle_adjust_vi(
    state: VIBAState,
    obs: BAObservations,
    chain: ImuChain,
    cam: Camera,
    Rcb: jax.Array,
    pcb: jax.Array,
    gravity: jax.Array,
    noise: imu_ops.ImuNoise,
    fixed_cam_mask: jax.Array,
    n_rounds: int = 2,
    iters_per_round: tuple = (5, 10),
    robust_rounds: tuple = (True, True),
    lambda_init: float = 1e-2,
):
    """VI local BA. Returns (state, obs) with outlier-gated observations.

    Schedule mirrors Optimizer.cc:1284-1338 (optimize 5, cull chi2>5.991
    reprojection outliers, optimize 10 more).
    """
    K = state.nav.p.shape[0]
    L = state.points.shape[0]
    dtype = state.points.dtype
    fixed_dof = jnp.repeat(fixed_cam_mask, VI_D)
    free_edge_i = jnp.logical_not(fixed_cam_mask)[chain.i_idx].astype(dtype)
    free_edge_j = jnp.logical_not(fixed_cam_mask)[chain.j_idx].astype(dtype)

    def lm_round(state, obs, n_iters, robust, lam):
        # early-exit LM (see solver/pose.py)
        def cond(carry):
            return (carry[0] < n_iters) & ~carry[4]

        def body(carry):
            i, state, lam, cost, _ = carry
            err, J_c, J_p, w, _, _ = _vi_reproj_linearize_ba(state, obs, cam, Rcb, pcb, robust)
            sys = schur.ObsSystem(J_c=J_c, J_p=J_p, r=-err, w=w, cam_idx=obs.cam_idx, lm_idx=obs.lm_idx)
            S, b, H_ll_inv, b_l, B = schur.build_reduced_camera_system(
                sys, K, L, VI_D, lam, fixed_cam_mask
            )
            # Add IMU chain blocks (zeroing rows/cols of fixed cameras).
            H_ii, H_ij, H_jj, b_i, b_j, _ = _imu_chain_blocks(state, chain, gravity, noise)
            H_ii = H_ii * (free_edge_i * free_edge_i)[:, None, None]
            H_ij = H_ij * (free_edge_i * free_edge_j)[:, None, None]
            H_jj = H_jj * (free_edge_j * free_edge_j)[:, None, None]
            b_i = b_i * free_edge_i[:, None]
            b_j = b_j * free_edge_j[:, None]
            S4 = S.reshape(K, VI_D, K, VI_D)
            S4 = S4.at[chain.i_idx, :, chain.i_idx, :].add(H_ii)
            S4 = S4.at[chain.i_idx, :, chain.j_idx, :].add(H_ij)
            S4 = S4.at[chain.j_idx, :, chain.i_idx, :].add(jnp.swapaxes(H_ij, -1, -2))
            S4 = S4.at[chain.j_idx, :, chain.j_idx, :].add(H_jj)
            S = S4.reshape(K * VI_D, K * VI_D)
            b = b.reshape(K, VI_D).at[chain.i_idx].add(b_i).at[chain.j_idx].add(b_j).reshape(-1)

            dx = schur.solve_cameras(S, b, lam, fixed_dof)
            dx_cam = dx.reshape(K, VI_D)
            dx_pts = schur.back_substitute_landmarks(
                B, obs.cam_idx, obs.lm_idx, H_ll_inv, b_l, dx_cam, L
            )
            cand = _apply_update_vi(state, dx_cam, dx_pts)
            new_cost = _vi_cost(cand, obs, cam, Rcb, pcb, chain, gravity, noise, robust)
            accept = new_cost < cost
            done = accept & (cost - new_cost < 1e-6 * jnp.maximum(cost, 1e-12))
            state = jax.tree.map(lambda a, b_: jnp.where(accept, a, b_), cand, state)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0)
            cost = jnp.where(accept, new_cost, cost)
            return i + 1, state, lam, cost, done

        cost0 = _vi_cost(state, obs, cam, Rcb, pcb, chain, gravity, noise, robust)
        _, state, lam, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.asarray(0, jnp.int32), state, lam, cost0, jnp.asarray(False)),
        )
        return state, lam

    def depth_gate_vi(state, obs):
        _, Pc = factors.reproj_vi_residual(
            state.nav.R[obs.cam_idx], state.nav.p[obs.cam_idx],
            state.points[obs.lm_idx], obs.uv, Rcb, pcb, cam.fx, cam.fy, cam.cx, cam.cy,
        )
        return obs._replace(valid=obs.valid & (Pc[..., 2] > 1e-6))

    lam = jnp.asarray(lambda_init, dtype)
    obs = depth_gate_vi(state, obs)
    for rnd in range(n_rounds):
        state, lam = lm_round(state, obs, iters_per_round[rnd], robust_rounds[rnd], lam)
        if rnd < n_rounds - 1:
            err, _, _, _, chi2, _ = _vi_reproj_linearize_ba(state, obs, cam, Rcb, pcb, robust=False)
            Rwb = state.nav.R[obs.cam_idx]
            Pwb = state.nav.p[obs.cam_idx]
            _, Pc = factors.reproj_vi_residual(
                Rwb, Pwb, state.points[obs.lm_idx], obs.uv, Rcb, pcb, cam.fx, cam.fy, cam.cx, cam.cy
            )
            keep = (chi2 <= factors.CHI2_MONO) & (Pc[..., 2] > 0)
            obs = obs._replace(valid=obs.valid & keep)
    return state, obs
