"""Batched residuals + analytic Jacobians for every factor family.

This module replaces g2o's vertex/edge zoo (`/root/reference/Thirdparty/g2o`,
`/root/reference/src/IMU/g2otypes.{h,cc}`) with stateless batched functions:
each factor family evaluates residuals and Jacobians for *all* its edges at
once as dense array ops — the shape XLA tiles onto the MXU — instead of one
virtual `computeError` call per edge.

Conventions (matching the reference so thresholds/information carry over):

- Reprojection error is ``obs - project(Pc)`` (g2otypes.h:109-261).
- Vision camera parametrization: left-multiplicative se3 update on Tcw,
  ``Tcw <- exp(dxi) Tcw`` with dxi = (drho, dphi) — g2o SE3Quat convention
  (`types_six_dof_expmap.h`).
- NavState PVR parametrization: ``P <- P + R dP`` (body-frame), ``V <- V +
  dV``, ``R <- R exp(dphi)`` — `NavState::IncSmallPVR` (NavState.h:45-48).
- IMU PVR residual order (rP, rV, rPhi) and its Jacobians follow
  `EdgeNavStatePVR::{computeError,linearizeOplus}` (g2otypes.cc:8-213),
  i.e. Forster RSS'15 with the first-order bias-correction terms.
- Huber deltas: sqrt(5.991) for 2D, sqrt(7.815) for 3D/stereo,
  sqrt(21.666) for 9-DoF PVR, sqrt(16.812) for 6-DoF bias, sqrt(30.5779)
  for the 15-DoF prior (Optimizer.cc:113-114,676,697,716,1142-1144).

All functions broadcast over a leading batch axis (the edge set).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import imu as imu_ops
from ..utils import lie

# Huber thresholds (chi2 values; kernels use sqrt) — reference Optimizer.cc.
CHI2_MONO = 5.991
CHI2_STEREO = 7.815
CHI2_PVR = 21.666
CHI2_BIAS = 16.812
CHI2_PRIOR = 30.5779


def huber_weights(chi2: jax.Array, delta2: float) -> jax.Array:
    """Per-edge IRLS weight for the Huber kernel.

    chi2 = r^T W r. Returns w such that scaling the information by w
    reproduces the robustified normal equations: w = 1 inside the inlier
    region, delta/sqrt(chi2) outside (g2o RobustKernelHuber).
    """
    safe = jnp.maximum(chi2, 1e-12)
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / safe))


def _safe_z(z, eps=1e-6):
    """Clamp depth away from zero, keeping the sign.

    Rows with non-positive depth are masked out of the *linear system* by
    callers, but their residual still enters the accept/reject cost: a point
    pushed behind the camera must yield a huge (finite) residual so the LM
    step is rejected — exactly as g2o's unguarded computeError does. A
    sign-less clamp would instead make such residuals look plausible, and a
    raw 1/z would poison the normal-equation einsums through 0 * inf."""
    return jnp.where(z >= 0, jnp.maximum(z, eps), jnp.minimum(z, -eps))


def project(Pc: jax.Array, fx, fy, cx, cy) -> jax.Array:
    """Pinhole projection, (..., 3) -> (..., 2)."""
    z = _safe_z(Pc[..., 2])
    return jnp.stack([fx * Pc[..., 0] / z + cx, fy * Pc[..., 1] / z + cy], axis=-1)


def proj_jacobian(Pc: jax.Array, fx, fy) -> jax.Array:
    """d project / d Pc, (..., 2, 3). (Reference Maux/z, g2otypes.cc:283-291.)"""
    x, y, z = Pc[..., 0], Pc[..., 1], _safe_z(Pc[..., 2])
    zinv = 1.0 / z
    z2inv = zinv * zinv
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([fx * zinv, zero, -fx * x * z2inv], axis=-1),
            jnp.stack([zero, fy * zinv, -fy * y * z2inv], axis=-1),
        ],
        axis=-2,
    )


# ----------------------------------------------------------------------------
# 1. Vision reprojection factor: camera SE3 (Tcw) x landmark.
# ----------------------------------------------------------------------------


def reproj_residual(Rcw, tcw, Pw, obs, fx, fy, cx, cy):
    """err = obs - project(Rcw Pw + tcw). Returns (err, Pc).

    Rcw: (..., 3, 3); tcw/Pw: (..., 3); obs: (..., 2).
    """
    Pc = jnp.einsum("...ij,...j->...i", Rcw, Pw) + tcw
    return obs - project(Pc, fx, fy, cx, cy), Pc


def reproj_jacobians(Rcw, Pc, fx, fy):
    """Jacobians of the vision reprojection error.

    Returns (J_pose, J_point):
      J_pose:  (..., 2, 6) w.r.t. dxi = (drho, dphi), Tcw <- exp(dxi) Tcw
      J_point: (..., 2, 3) w.r.t. Pw
    """
    Jpi = proj_jacobian(Pc, fx, fy)  # (..., 2, 3)
    # dPc/d(drho) = I, dPc/d(dphi) = -[Pc]x  (left-mult update on Tcw)
    J_rho = -Jpi
    J_phi = Jpi @ lie.hat(Pc)
    J_pose = jnp.concatenate([J_rho, J_phi], axis=-1)
    J_point = -Jpi @ Rcw
    return J_pose, J_point


# ----------------------------------------------------------------------------
# 1b. Stereo reprojection factor: residual (u, v, u_right), u_r = u - bf/z.
#     Mirrors g2o EdgeStereoSE3ProjectXYZ (types_six_dof_expmap.h) used by
#     the reference for stereo/RGB-D observations (Optimizer.cc:2447-2476).
# ----------------------------------------------------------------------------


def project_stereo(Pc: jax.Array, fx, fy, cx, cy, bf) -> jax.Array:
    """(..., 3) -> (..., 3): (u, v, u_right)."""
    z = _safe_z(Pc[..., 2])
    u = fx * Pc[..., 0] / z + cx
    v = fy * Pc[..., 1] / z + cy
    return jnp.stack([u, v, u - bf / z], axis=-1)


def proj_stereo_jacobian(Pc: jax.Array, fx, fy, bf) -> jax.Array:
    """d project_stereo / d Pc, (..., 3, 3)."""
    J2 = proj_jacobian(Pc, fx, fy)  # (..., 2, 3)
    z = _safe_z(Pc[..., 2])
    z2inv = 1.0 / (z * z)
    zero = jnp.zeros_like(z)
    # u_r = u - bf/z  =>  row3 = row_u + (0, 0, bf/z^2)
    row3 = J2[..., 0, :] + jnp.stack([zero, zero, bf * z2inv], axis=-1)
    return jnp.concatenate([J2, row3[..., None, :]], axis=-2)


def reproj_stereo_residual(Rcw, tcw, Pw, obs3, fx, fy, cx, cy, bf):
    """err = obs3 - project_stereo(Rcw Pw + tcw). Returns (err, Pc)."""
    Pc = jnp.einsum("...ij,...j->...i", Rcw, Pw) + tcw
    return obs3 - project_stereo(Pc, fx, fy, cx, cy, bf), Pc


def reproj_stereo_jacobians(Rcw, Pc, fx, fy, bf):
    """(J_pose (...,3,6), J_point (...,3,3)), same conventions as
    reproj_jacobians."""
    Jpi = proj_stereo_jacobian(Pc, fx, fy, bf)
    J_rho = -Jpi
    J_phi = Jpi @ lie.hat(Pc)
    J_pose = jnp.concatenate([J_rho, J_phi], axis=-1)
    J_point = -Jpi @ Rcw
    return J_pose, J_point


# ----------------------------------------------------------------------------
# 2. VI reprojection factor: NavState PVR (body pose, through Tbc) x landmark.
#    Mirrors EdgeNavStatePVRPointXYZ (g2otypes.h:109-261, g2otypes.cc:265-320).
# ----------------------------------------------------------------------------


def reproj_vi_residual(Rwb, Pwb, Pw, obs, Rcb, pcb, fx, fy, cx, cy):
    """err = obs - project(Rcb Rwb^T (Pw - Pwb) + pcb). Returns (err, Pc).

    Rcb = Rbc^T, pcb = -Rcb Pbc (camera-from-body extrinsics).
    """
    Pb = jnp.einsum("...ji,...j->...i", Rwb, Pw - Pwb)  # Rwb^T (Pw - Pwb)
    Pc = jnp.einsum("ij,...j->...i", Rcb, Pb) + pcb
    return obs - project(Pc, fx, fy, cx, cy), Pc


def reproj_vi_jacobians(Rwb, Pwb, Pw, Pc, Rcb, fx, fy):
    """Jacobians w.r.t. (landmark Pw) and (NavState PVR 9-dof).

    Returns (J_point (...,2,3), J_pvr (...,2,9)); the middle 3 columns of
    J_pvr (velocity) are zero. Matches g2otypes.cc:299-319:
        J_point = -Jpi Rcb Rwb^T
        J_dP    = +Jpi Rcb                (update P <- P + Rwb dP)
        J_dPhi  = -Jpi [Rcb Rwb^T (Pw-Pwb)]x Rcb ... (see reference)
    """
    Jpi = proj_jacobian(Pc, fx, fy)
    RcbRbw = jnp.einsum("ij,...kj->...ik", Rcb, Rwb)  # Rcb @ Rwb^T
    J_point = -Jpi @ RcbRbw
    J_dP = Jpi @ jnp.broadcast_to(Rcb, RcbRbw.shape)  # -Jpi @ (-Rcb)
    Paux = jnp.einsum("...ij,...j->...i", RcbRbw, Pw - Pwb)
    J_dPhi = -Jpi @ (lie.hat(Paux) @ Rcb)
    J_dV = jnp.zeros_like(J_dP)
    J_pvr = jnp.concatenate([J_dP, J_dV, J_dPhi], axis=-1)
    return J_point, J_pvr


# ----------------------------------------------------------------------------
# 3. IMU PVR factor: (PVR_i, PVR_j, Bias_i) with preintegrated measurement.
#    Mirrors EdgeNavStatePVR (g2otypes.cc:8-213).
# ----------------------------------------------------------------------------


def imu_pvr_residual(
    Pi, Vi, Ri, Pj, Vj, Rj, dbg_i, dba_i, pre: imu_ops.PreintState, gravity
):
    """9-dim residual (rP, rV, rPhi). All args broadcast over batch."""
    dT = pre.dt[..., None]
    dT2 = dT * dT
    RiT = jnp.swapaxes(Ri, -1, -2)
    dP_c = pre.dP + jnp.einsum("...ij,...j->...i", pre.J_P_bg, dbg_i) + jnp.einsum(
        "...ij,...j->...i", pre.J_P_ba, dba_i
    )
    dV_c = pre.dV + jnp.einsum("...ij,...j->...i", pre.J_V_bg, dbg_i) + jnp.einsum(
        "...ij,...j->...i", pre.J_V_ba, dba_i
    )
    rP = jnp.einsum("...ij,...j->...i", RiT, Pj - Pi - Vi * dT - 0.5 * gravity * dT2) - dP_c
    rV = jnp.einsum("...ij,...j->...i", RiT, Vj - Vi - gravity * dT) - dV_c
    dR_corr = pre.dR @ lie.so3_exp(jnp.einsum("...ij,...j->...i", pre.J_R_bg, dbg_i))
    rR = jnp.swapaxes(dR_corr, -1, -2) @ (RiT @ Rj)
    rPhi = lie.so3_log(rR)
    return jnp.concatenate([rP, rV, rPhi], axis=-1)


def imu_pvr_jacobians(Pi, Vi, Ri, Pj, Vj, Rj, dbg_i, pre: imu_ops.PreintState, gravity, rPhi):
    """Jacobians of the 9-dim residual w.r.t. PVR_i (9), PVR_j (9), Bias_i (6).

    Matches EdgeNavStatePVR::linearizeOplus (g2otypes.cc:75-213), including
    the reference's increment conventions (P += R dP).
    """
    dT = pre.dt[..., None, None]
    dT2 = dT * dT
    RiT = jnp.swapaxes(Ri, -1, -2)
    RjT = jnp.swapaxes(Rj, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Pi.dtype), Ri.shape)
    O = jnp.zeros_like(eye)
    JrInv_rPhi = lie.so3_Jr_inv(rPhi)
    J_rPhi_dbg = pre.J_R_bg

    pv_term = jnp.einsum(
        "...ij,...j->...i", RiT, Pj - Pi - Vi * dT[..., 0] - 0.5 * gravity * dT2[..., 0]
    )
    vv_term = jnp.einsum("...ij,...j->...i", RiT, Vj - Vi - gravity * dT[..., 0])

    # --- vertex i (9x9) ---
    J_i = jnp.concatenate(
        [
            jnp.concatenate([-eye, -RiT * dT, lie.hat(pv_term)], axis=-1),
            jnp.concatenate([O, -RiT, lie.hat(vv_term)], axis=-1),
            jnp.concatenate([O, O, -(JrInv_rPhi @ RjT @ Ri)], axis=-1),
        ],
        axis=-2,
    )
    # --- vertex j (9x9) ---
    J_j = jnp.concatenate(
        [
            jnp.concatenate([RiT @ Rj, O, O], axis=-1),
            jnp.concatenate([O, RiT, O], axis=-1),
            jnp.concatenate([O, O, JrInv_rPhi], axis=-1),
        ],
        axis=-2,
    )
    # --- bias i (9x6) ---
    ExprPhiT = jnp.swapaxes(lie.so3_exp(rPhi), -1, -2)
    JrBiasGCorr = lie.so3_Jr(jnp.einsum("...ij,...j->...i", J_rPhi_dbg, dbg_i))
    J_rPhi_bg = -(JrInv_rPhi @ ExprPhiT @ JrBiasGCorr @ J_rPhi_dbg)
    J_b = jnp.concatenate(
        [
            jnp.concatenate([-pre.J_P_bg, -pre.J_P_ba], axis=-1),
            jnp.concatenate([-pre.J_V_bg, -pre.J_V_ba], axis=-1),
            jnp.concatenate([J_rPhi_bg, O], axis=-1),
        ],
        axis=-2,
    )
    return J_i, J_j, J_b


def imu_pvr_information(pre: imu_ops.PreintState) -> jax.Array:
    """Information = inverse of the 9x9 preintegration covariance (P,V,Phi).

    The reference inverts the covariance directly (Optimizer.cc sets the edge
    information to `M.getCovPVPhi().inverse()`); we solve against identity
    with a small symmetric regularizer for robustness on short windows.
    """
    cov = 0.5 * (pre.cov + jnp.swapaxes(pre.cov, -1, -2))
    eye = jnp.eye(9, dtype=cov.dtype)
    cov = cov + 1e-16 * eye
    return jnp.linalg.solve(cov, jnp.broadcast_to(eye, cov.shape))


# ----------------------------------------------------------------------------
# 4. Bias random-walk factor: (Bias_i, Bias_j).
#    Mirrors EdgeNavStateBias (g2otypes.cc:215-263).
# ----------------------------------------------------------------------------


def bias_rw_residual(bg_i, ba_i, dbg_i, dba_i, bg_j, ba_j, dbg_j, dba_j):
    rG = (bg_j + dbg_j) - (bg_i + dbg_i)
    rA = (ba_j + dba_j) - (ba_i + dba_i)
    return jnp.concatenate([rG, rA], axis=-1)


def bias_rw_information(noise: imu_ops.ImuNoise, dt, dtype=None) -> jax.Array:
    """Information of the random walk over dt: diag(cov_bg*dt, cov_ba*dt)^-1.

    Matches Optimizer.cc's InvCovBgaRW/dt construction (the RW covariance
    grows linearly with the integration time).
    """
    dt = jnp.asarray(dt)
    z = jnp.zeros_like(jnp.broadcast_to(noise.gyr_bias_rw2, dt.shape + (3, 3)))
    top = jnp.concatenate([noise.gyr_bias_rw2 * dt[..., None, None], z], axis=-1)
    bot = jnp.concatenate([z, noise.acc_bias_rw2 * dt[..., None, None]], axis=-1)
    cov = jnp.concatenate([top, bot], axis=-2)
    return jnp.linalg.inv(cov)


# ----------------------------------------------------------------------------
# 5. 15-dim NavState prior factor (marginalization prior on a frame).
#    Mirrors EdgeNavStatePriorPVRBias (g2otypes.cc:375-430).
# ----------------------------------------------------------------------------


def prior_residual(ns: imu_ops.NavState, prior: imu_ops.NavState):
    eP = prior.p - ns.p
    eV = prior.v - ns.v
    eR = lie.so3_log(jnp.swapaxes(prior.R, -1, -2) @ ns.R)
    eBg = (prior.bg + prior.dbg) - (ns.bg + ns.dbg)
    eBa = (prior.ba + prior.dba) - (ns.ba + ns.dba)
    return jnp.concatenate([eP, eV, eR, eBg, eBa], axis=-1)


def prior_jacobians(ns: imu_ops.NavState, eR):
    """J w.r.t. PVR (15x9) and Bias (15x6) — g2otypes.cc:414-430."""
    dtype = ns.p.dtype
    batch = ns.p.shape[:-1]
    J_pvr = jnp.zeros(batch + (15, 9), dtype)
    J_pvr = J_pvr.at[..., 0:3, 0:3].set(-ns.R)
    J_pvr = J_pvr.at[..., 3:6, 3:6].set(-jnp.eye(3, dtype=dtype))
    J_pvr = J_pvr.at[..., 6:9, 6:9].set(lie.so3_Jr_inv(eR))
    J_bias = jnp.zeros(batch + (15, 6), dtype)
    J_bias = J_bias.at[..., 9:12, 0:3].set(-jnp.eye(3, dtype=dtype))
    J_bias = J_bias.at[..., 12:15, 3:6].set(-jnp.eye(3, dtype=dtype))
    return J_pvr, J_bias


# ----------------------------------------------------------------------------
# 6. Gyro-bias-only rotation factor (VIO init step 1).
#    Mirrors EdgeGyrBias (g2otypes.cc:1242-1266): residual
#    r = log( (dR * exp(J_dR_bg bg))^-1 * Rwb_i^T * Rwb_j ).
# ----------------------------------------------------------------------------


def gyr_bias_residual(dR, J_dR_bg, Rwb_i, Rwb_j, bg):
    corr = dR @ lie.so3_exp(jnp.einsum("...ij,...j->...i", J_dR_bg, bg))
    rel = jnp.einsum("...ji,...jk->...ik", Rwb_i, Rwb_j)  # Rwb_i^T Rwb_j
    return lie.so3_log(jnp.swapaxes(corr, -1, -2) @ rel)


# ----------------------------------------------------------------------------
# 7. Sim3/SE3 pose-graph factor (essential graph, loop closing).
#    Residual r = log( Sji * Siw * Swj ) in sim(3) tangent (7-dim), matching
#    g2o EdgeSim3 semantics used by OptimizeEssentialGraph
#    (Optimizer.cc:3105-...).
# ----------------------------------------------------------------------------


def sim3_graph_residual(Ri, ti, si, Rj, tj, sj, Rij, tij, sij):
    """r = log( Sij * Sj * Si^-1 )... convention: measurement Sij = Si Sj^-1.

    We use: err = log( Sij^-1 * Si * Sj^-1 ) == 0 when consistent; returns
    the 7-vector sim3 tangent.
    """
    Rji_inv, tji_inv, sji_inv = lie.sim3_inv(Rj, tj, sj)
    R_rel, t_rel, s_rel = lie.sim3_mul(Ri, ti, si, Rji_inv, tji_inv, sji_inv)
    Rm_inv, tm_inv, sm_inv = lie.sim3_inv(Rij, tij, sij)
    R_err, t_err, s_err = lie.sim3_mul(Rm_inv, tm_inv, sm_inv, R_rel, t_rel, s_rel)
    return lie.sim3_log(R_err, t_err, s_err)
