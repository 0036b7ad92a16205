"""VIO initialization: gyro bias, scale/gravity/accel-bias estimation, and
online camera-IMU extrinsic (Rbc/pbc) calibration.

Batched JAX re-implementation of the reference's initialization chain:

- `estimate_gyro_bias`          <- Optimizer::OptimizeInitialGyroBias
  (Optimizer.cc:1619-1718; EdgeGyrBias residual g2otypes.cc:1242-1266) —
  Gauss-Newton on r = log((dR exp(J_dR_bg bg))^T Rwb_i^T Rwb_j)
- `estimate_scale_gravity`      <- TryInitVIO step 2 (LocalMapping.cc:1059-1162)
  lambda*s + beta*gw = gamma, 3(N-2)x4 LS
- `refine_scale_gravity_ba`     <- TryInitVIO step 3 (LocalMapping.cc:1173-1281)
  |g|=G constraint via Rwi 2-dof tangent update + accel bias, 3(N-2)x6 LS
- `estimate_rcb`                <- TryInitVIOWithoutPreCalibration step 1.2
  (LocalMapping.cc:440-570): quaternion hand-eye system solveZ with
  exponential weighting from the previous estimate
- `estimate_scale_gravity_pcb`  <- step 1.3 (LocalMapping.cc:578-706):
  lambda*s + beta*gw + phi*pcb = gamma, 3(N-2)x7 LS, exp weights
- `refine_with_pcb`             <- step 1.4 (LocalMapping.cc:711-844):
  x=[s,dthetaxy,ba,pcb] 3(N-2)x9 LS, exp weights
- `navstates_from_vision`       <- NavState/velocity assignment on success
  (LocalMapping.cc:1349-1410, 891-976)
- `ConvergenceMonitor`          <- CheckRbc/PbcEstimationConverge
  (LocalMapping.cc:1659-1783): trailing-10s std-dev < threshold, >=10 samples

Conventions: `Rwc` (N,3,3) / `pwc` (N,3) are keyframe camera-in-world poses
ordered by time; `pre` is a PreintState batched over N where entry j holds
the preintegration from keyframe j-1 to j (entry 0 unused). `Rcb` maps
body->camera; `pcb` is the body origin in camera frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import imu as imu_ops
from ..utils import lie

GRAVITY = 9.810  # ConfigParam::GetG() (configparam.cc:5)


# ----------------------------------------------------------------------------
# Step 1: gyro bias.
# ----------------------------------------------------------------------------


def estimate_gyro_bias(Rwc, pre: imu_ops.PreintState, Rcb, n_iters: int = 2,
                       pair_mask=None):
    """GN estimate of the gyro bias from rotation-only residuals over all
    consecutive keyframe pairs. The problem is almost linear — the reference
    runs a single g2o LM iteration; we run `n_iters` GN steps from zero.

    `pair_mask` (N-1,) bool zeroes residual rows for invalid keyframe
    pairs, so the function runs at a FIXED table shape inside one jitted
    init-attempt program (a `[:N]` slice would recompile per keyframe
    count — seconds per attempt on the remote-TPU backend)."""
    Rwb = Rwc @ Rcb  # (N,3,3)
    Ri, Rj = Rwb[:-1], Rwb[1:]
    dR = pre.dR[1:]
    J = pre.J_R_bg[1:]

    def residuals(bg):
        corr = dR @ lie.so3_exp(jnp.einsum("nij,j->ni", J, bg))
        rel = jnp.einsum("nji,njk->nik", Ri, Rj)
        r = lie.so3_log(jnp.swapaxes(corr, -1, -2) @ rel)  # (N-1, 3)
        if pair_mask is not None:
            r = r * pair_mask[:, None]
        return r

    bg = jnp.zeros(3, Rwc.dtype)
    for _ in range(n_iters):
        r = residuals(bg)
        Jb = jax.jacfwd(lambda b: residuals(b).reshape(-1))(bg)  # (3(N-1), 3)
        H = Jb.T @ Jb + 1e-12 * jnp.eye(3, dtype=Rwc.dtype)
        bg = bg + jnp.linalg.solve(H, Jb.T @ (-r.reshape(-1)))
    return bg


# ----------------------------------------------------------------------------
# Triplet helper: common per-(i, i+1, i+2) quantities.
# ----------------------------------------------------------------------------


def _triplets(pwc, Rwc, pre: imu_ops.PreintState):
    pc1, pc2, pc3 = pwc[:-2], pwc[1:-1], pwc[2:]
    Rc1, Rc2, Rc3 = Rwc[:-2], Rwc[1:-1], Rwc[2:]
    dt12 = pre.dt[1:-1]
    dt23 = pre.dt[2:]
    dp12, dv12 = pre.dP[1:-1], pre.dV[1:-1]
    dp23 = pre.dP[2:]
    Jpba12, Jvba12 = pre.J_P_ba[1:-1], pre.J_V_ba[1:-1]
    Jpba23 = pre.J_P_ba[2:]
    return (pc1, pc2, pc3, Rc1, Rc2, Rc3, dt12, dt23,
            dp12, dv12, dp23, Jpba12, Jvba12, Jpba23)


def _e(*xs):
    """einsum helper: matrix (n,3,3) @ vector (3,) or (n,3)."""
    A, v = xs
    if v.ndim == 1:
        return jnp.einsum("nij,j->ni", A, v)
    return jnp.einsum("nij,nj->ni", A, v)


# ----------------------------------------------------------------------------
# Step 2 (known Tbc): scale + gravity, no accel bias.
# ----------------------------------------------------------------------------


def estimate_scale_gravity(pwc, Rwc, pre, Rcb, pcb, triplet_mask=None):
    """Solve lambda*s + beta*gw = gamma for x=[s, gw] (4 dof).
    `triplet_mask` (N-2,) zeroes rows of invalid keyframe triplets (zero
    rows leave the least-squares solution unchanged) — fixed-shape path."""
    (pc1, pc2, pc3, Rc1, Rc2, Rc3, dt12, dt23,
     dp12, dv12, dp23, *_) = _triplets(pwc, Rwc, pre)
    T = pc1.shape[0]
    dtype = pwc.dtype

    lam = (pc2 - pc1) * dt23[:, None] + (pc2 - pc3) * dt12[:, None]  # (T,3)
    beta_c = 0.5 * (dt12 * dt12 * dt23 + dt12 * dt23 * dt23)  # (T,)
    gamma = (
        _e(Rc3 - Rc2, pcb) * dt12[:, None]
        + _e(Rc1 - Rc2, pcb) * dt23[:, None]
        + _e(Rc1 @ Rcb, dp12) * dt23[:, None]
        - _e(Rc2 @ Rcb, dp23) * dt12[:, None]
        - _e(Rc1 @ Rcb, dv12) * (dt12 * dt23)[:, None]
    )
    A = jnp.zeros((T, 3, 4), dtype)
    A = A.at[:, :, 0].set(lam)
    A = A.at[:, :, 1:4].set(beta_c[:, None, None] * jnp.eye(3, dtype=dtype))
    B = gamma
    if triplet_mask is not None:
        A = A * triplet_mask[:, None, None]
        B = B * triplet_mask[:, None]
    x, *_ = jnp.linalg.lstsq(A.reshape(3 * T, 4), B.reshape(3 * T))
    return x[0], x[1:4]


def _rwi_from_gw(gwstar, G, dtype):
    """Rotation aligning the inertial gravity direction gI=[0,0,-1] to the
    estimated gravity direction (LocalMapping.cc:1176-1194)."""
    gI = jnp.array([0.0, 0.0, -1.0], dtype)
    gwn = gwstar / jnp.linalg.norm(gwstar)
    v = jnp.cross(gI, gwn)
    nv = jnp.linalg.norm(v)
    vhat = v / jnp.maximum(nv, 1e-12)
    theta = jnp.arctan2(nv, jnp.dot(gI, gwn))
    Rwi = lie.so3_exp(vhat * theta)
    GI = gI * G
    return Rwi, GI


def refine_scale_gravity_ba(pwc, Rwc, pre, Rcb, pcb, gwstar, G=GRAVITY,
                            triplet_mask=None):
    """Refine with |g|=G constraint + accel bias: x=[s, dthetaxy, ba] (6)."""
    (pc1, pc2, pc3, Rc1, Rc2, Rc3, dt12, dt23,
     dp12, dv12, dp23, Jpba12, Jvba12, Jpba23) = _triplets(pwc, Rwc, pre)
    T = pc1.shape[0]
    dtype = pwc.dtype
    Rwi, GI = _rwi_from_gw(gwstar, G, dtype)

    dtt = dt12 * dt12 * dt23 + dt12 * dt23 * dt23
    lam = (pc2 - pc1) * dt23[:, None] + (pc2 - pc3) * dt12[:, None]
    phi_full = -0.5 * dtt[:, None, None] * (Rwi @ lie.hat(GI))  # (T,3,3)
    zeta = (
        jnp.einsum("nij,njk->nik", Rc2 @ Rcb, Jpba23) * dt12[:, None, None]
        + jnp.einsum("nij,njk->nik", Rc1 @ Rcb, Jvba12) * (dt12 * dt23)[:, None, None]
        - jnp.einsum("nij,njk->nik", Rc1 @ Rcb, Jpba12) * dt23[:, None, None]
    )
    psi = (
        _e(Rc1 - Rc2, pcb) * dt23[:, None]
        + _e(Rc1 @ Rcb, dp12) * dt23[:, None]
        - _e(Rc2 - Rc3, pcb) * dt12[:, None]
        - _e(Rc2 @ Rcb, dp23) * dt12[:, None]
        - _e(Rc1 @ Rcb, dv12) * (dt12 * dt23)[:, None]
        - 0.5 * dtt[:, None] * (Rwi @ GI)[None, :]
    )
    C = jnp.zeros((T, 3, 6), dtype)
    C = C.at[:, :, 0].set(lam)
    C = C.at[:, :, 1:3].set(phi_full[:, :, :2])
    C = C.at[:, :, 3:6].set(zeta)
    if triplet_mask is not None:
        C = C * triplet_mask[:, None, None]
        psi = psi * triplet_mask[:, None]
    y, *_ = jnp.linalg.lstsq(C.reshape(3 * T, 6), psi.reshape(3 * T))
    s = y[0]
    dtheta = jnp.array([y[1], y[2], 0.0], dtype)
    ba = y[3:6]
    Rwi_ = Rwi @ lie.so3_exp(dtheta)
    gw = Rwi_ @ GI
    return s, gw, ba


# ----------------------------------------------------------------------------
# Online extrinsic calibration (TryInitVIOWithoutPreCalibration).
# ----------------------------------------------------------------------------


def _quat_wxyz_from_matrix(R):
    q = lie.quat_from_matrix(R)  # (w, x, y, z) — check lie convention
    return q


def estimate_rcb(Rwc, pre, q_prev=None, weight_gain: float = 200.0,
                 gate: float = 0.05, pair_mask=None):
    """Hand-eye estimate of Rcb from rotation constraints: the quaternion
    q_cb satisfies q_B * q_cb = q_cb * q_C for every pair, giving Q q = 0
    with Q built from (q_B - q_C) (LocalMapping.cc:453-530). Solved as the
    smallest-singular-vector of the stacked 4(N-1)x4 system, with optional
    exponential row weights from the previous estimate."""
    dtype = Rwc.dtype
    dR_B = pre.dR[1:]  # body rotation i->i+1
    dR_C = jnp.einsum("nji,njk->nik", Rwc[:-1], Rwc[1:])  # Rcw1 * Rcw2^T
    q_B = lie.quat_from_matrix(dR_B)  # (N-1, 4) wxyz
    q_C = lie.quat_from_matrix(dR_C)

    dw = q_B[:, 0] - q_C[:, 0]
    dv = q_B[:, 1:] - q_C[:, 1:]
    T = dw.shape[0]
    Q = jnp.zeros((T, 4, 4), dtype)
    Q = Q.at[:, 0, 0].set(dw)
    Q = Q.at[:, 1:, 0].set(dv)
    Q = Q.at[:, 0, 1:].set(-dv)
    # Q_11_33 = (w_B - w_C) I - skew(v_B) - skew(v_C)  (LocalMapping.cc:478)
    Q = Q.at[:, 1:, 1:].set(
        dw[:, None, None] * jnp.eye(3, dtype=dtype)
        - lie.hat(q_B[:, 1:])
        - lie.hat(q_C[:, 1:])
    )

    if q_prev is not None:
        e = jnp.einsum("nij,j->ni", Q, q_prev)
        en = jnp.linalg.norm(e, axis=-1)
        w = jnp.where(en > gate, 0.0, jnp.exp(-en * weight_gain))
        Q = Q * w[:, None, None]
    if pair_mask is not None:
        Q = Q * pair_mask[:, None, None]

    A = Q.reshape(4 * T, 4)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    q = Vt[-1]
    q = jnp.where(q[0] < 1e-10, -q, q)
    q = q / jnp.linalg.norm(q)
    return q  # (w,x,y,z); Rcb = quat_to_matrix(q)


def estimate_scale_gravity_pcb(pwc, Rwc, pre, Rcb, prev=None,
                               weight_gain: float = 100.0, gate: float = 0.05,
                               triplet_mask=None):
    """x = [s, gw, pcb] (7 dof): lambda*s + beta*gw + phi*pcb = gamma."""
    (pc1, pc2, pc3, Rc1, Rc2, Rc3, dt12, dt23,
     dp12, dv12, dp23, *_) = _triplets(pwc, Rwc, pre)
    T = pc1.shape[0]
    dtype = pwc.dtype

    lam = (pc2 - pc1) * dt23[:, None] + (pc2 - pc3) * dt12[:, None]
    beta_c = 0.5 * (dt12 * dt12 * dt23 + dt12 * dt23 * dt23)
    phi = (Rc2 - Rc3) * dt12[:, None, None] - (Rc1 - Rc2) * dt23[:, None, None]
    gamma = (
        _e(Rc1 @ Rcb, dp12) * dt23[:, None]
        - _e(Rc2 @ Rcb, dp23) * dt12[:, None]
        - _e(Rc1 @ Rcb, dv12) * (dt12 * dt23)[:, None]
    )
    A = jnp.zeros((T, 3, 7), dtype)
    A = A.at[:, :, 0].set(lam)
    A = A.at[:, :, 1:4].set(beta_c[:, None, None] * jnp.eye(3, dtype=dtype))
    A = A.at[:, :, 4:7].set(phi)
    B = gamma

    if prev is not None:
        s_p, gw_p, pcb_p = prev
        pred = lam * s_p + beta_c[:, None] * gw_p[None, :] + _e(phi, pcb_p)
        en = jnp.linalg.norm(pred - gamma, axis=-1)
        w = jnp.where(en > gate, 0.0, jnp.exp(-en * weight_gain))
        A = A * w[:, None, None]
        B = B * w[:, None]
    if triplet_mask is not None:
        A = A * triplet_mask[:, None, None]
        B = B * triplet_mask[:, None]

    x, *_ = jnp.linalg.lstsq(A.reshape(3 * T, 7), B.reshape(3 * T))
    return x[0], x[1:4], x[4:7]


def refine_with_pcb(pwc, Rwc, pre, Rcb, gwstar, prev=None, G=GRAVITY,
                    gate: float = 0.05, triplet_mask=None):
    """x = [s, dthetaxy, ba, pcb] (9 dof) refinement (LocalMapping.cc:711-844)."""
    (pc1, pc2, pc3, Rc1, Rc2, Rc3, dt12, dt23,
     dp12, dv12, dp23, Jpba12, Jvba12, Jpba23) = _triplets(pwc, Rwc, pre)
    T = pc1.shape[0]
    dtype = pwc.dtype
    Rwi, GI = _rwi_from_gw(gwstar, G, dtype)

    dtt = dt12 * dt12 * dt23 + dt12 * dt23 * dt23
    lam = (pc2 - pc1) * dt23[:, None] - (pc3 - pc2) * dt12[:, None]
    phi_full = -0.5 * dtt[:, None, None] * (Rwi @ lie.hat(GI))
    zeta = (
        jnp.einsum("nij,njk->nik", Rc2 @ Rcb, Jpba23) * dt12[:, None, None]
        - jnp.einsum("nij,njk->nik", Rc1 @ Rcb, Jpba12) * dt23[:, None, None]
        + jnp.einsum("nij,njk->nik", Rc1 @ Rcb, Jvba12) * (dt12 * dt23)[:, None, None]
    )
    ksi = (Rc2 - Rc3) * dt12[:, None, None] - (Rc1 - Rc2) * dt23[:, None, None]
    psi = (
        _e(Rc1 @ Rcb, dp12) * dt23[:, None]
        - _e(Rc2 @ Rcb, dp23) * dt12[:, None]
        - _e(Rc1 @ Rcb, dv12) * (dt12 * dt23)[:, None]
        - 0.5 * dtt[:, None] * (Rwi @ GI)[None, :]
    )
    C = jnp.zeros((T, 3, 9), dtype)
    C = C.at[:, :, 0].set(lam)
    C = C.at[:, :, 1:3].set(phi_full[:, :, :2])
    C = C.at[:, :, 3:6].set(zeta)
    C = C.at[:, :, 6:9].set(ksi)
    D = psi

    if prev is not None:
        s_p, dtheta_p, ba_p, pcb_p = prev
        pred = (
            lam * s_p
            + _e(phi_full, dtheta_p)
            + _e(zeta, ba_p)
            + _e(ksi, pcb_p)
        )
        en = jnp.linalg.norm(pred - psi, axis=-1)
        w = jnp.where(en > gate, 0.0, jnp.exp(-en))
        C = C * w[:, None, None]
        D = D * w[:, None]
    if triplet_mask is not None:
        C = C * triplet_mask[:, None, None]
        D = D * triplet_mask[:, None]

    y, *_ = jnp.linalg.lstsq(C.reshape(3 * T, 9), D.reshape(3 * T))
    s = y[0]
    dtheta = jnp.array([y[1], y[2], 0.0], dtype)
    ba = y[3:6]
    pcb = y[6:9]
    Rwi_ = Rwi @ lie.so3_exp(dtheta)
    gw = Rwi_ @ GI
    return s, dtheta, ba, pcb, gw


# ----------------------------------------------------------------------------
# NavState + velocity assignment on successful init.
# ----------------------------------------------------------------------------


def navstates_from_vision(pwc, Rwc, pre, scale, gw, Rcb, pcb, bg, ba,
                          n_valid=None):
    """Batched NavStates for all keyframes (LocalMapping.cc:1349-1410).

    P = s*pwc + Rwc*pcb ; R = Rwc*Rcb ; velocities from the relative-position
    preintegration identity (interior keyframes) and IMU propagation from
    the previous keyframe (last one).

    `n_valid` (traced scalar) marks keyframes [0, n_valid) as live for the
    fixed-shape path: entries past it hold garbage the caller masks on
    write; the "last keyframe" velocity propagation targets index
    n_valid-1 via dynamic gathers instead of static slicing."""
    N = pwc.shape[0]
    dtype = pwc.dtype
    wPb = scale * pwc + _e(Rwc, pcb)
    Rwb = Rwc @ Rcb

    # velocities for keyframes 0..N-2 using the NEXT interval's preint
    dt = pre.dt[1:]  # (N-1,)
    dp = pre.dP[1:]
    Jpba = pre.J_P_ba[1:]
    dv_corr = dp + jnp.einsum("nij,j->ni", Jpba, ba)
    vel_head = -(
        scale * (pwc[:-1] - pwc[1:])
        + _e(Rwc[:-1] - Rwc[1:], pcb)
        + jnp.einsum("nij,nj->ni", Rwc[:-1] @ Rcb, dv_corr)
        + 0.5 * gw[None, :] * (dt * dt)[:, None]
    ) / jnp.maximum(dt, 1e-9)[:, None]

    # last keyframe: propagate from the previous one
    last = (N if n_valid is None else n_valid) - 1
    dt_l = jnp.take(pre.dt, last, axis=0)
    dv_l = (jnp.take(pre.dV, last, axis=0)
            + jnp.take(pre.J_V_ba, last, axis=0) @ ba)
    vel_last = (
        jnp.take(vel_head, last - 1, axis=0) + gw * dt_l
        + jnp.take(Rwb, last - 1, axis=0) @ dv_l
    )

    vel = jnp.concatenate(
        [vel_head, jnp.zeros((1, 3), dtype)], axis=0
    )
    vel = jnp.where(jnp.arange(N)[:, None] == last, vel_last[None], vel)
    z3 = jnp.zeros((N, 3), dtype)
    return imu_ops.NavState(
        p=wPb, v=vel, R=Rwb,
        bg=jnp.broadcast_to(bg, (N, 3)), ba=jnp.broadcast_to(ba, (N, 3)),
        dbg=z3, dba=z3,
    )


# ----------------------------------------------------------------------------
# Convergence monitors (host-side).
# ----------------------------------------------------------------------------


def euler_zyx_deg(R):
    """(yaw, pitch, roll) in degrees — matches eigen eulerAngles(2,1,0) use
    in the reference's convergence bookkeeping."""
    R = np.asarray(R)
    yaw = np.degrees(np.arctan2(R[1, 0], R[0, 0]))
    pitch = np.degrees(np.arcsin(np.clip(-R[2, 0], -1, 1)))
    roll = np.degrees(np.arctan2(R[2, 1], R[2, 2]))
    return np.array([yaw, pitch, roll])


class ConvergenceMonitor:
    """Trailing-window standard-deviation convergence check
    (CheckRbcEstimationConverge / CheckPbcEstimationConverge,
    LocalMapping.cc:1659-1783)."""

    def __init__(self, threshold: float, window_s: float = 10.0, min_samples: int = 10):
        self.threshold = threshold
        self.window_s = window_s
        self.min_samples = min_samples
        self.ts: list = []
        self.vals: list = []

    def push(self, t: float, v):
        self.ts.append(float(t))
        self.vals.append(np.asarray(v, np.float64))

    def converged(self, t_now: float) -> bool:
        sel = [v for t, v in zip(self.ts, self.vals)
               if t > t_now - self.window_s and np.isfinite(v).all()]
        if len(sel) < self.min_samples:
            return False
        std = np.std(np.stack(sel), axis=0, ddof=1)
        return bool(np.all(std < self.threshold))
