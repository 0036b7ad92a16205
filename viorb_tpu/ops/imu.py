"""IMU types, NavState, and preintegration as a fused `lax.scan`.

TPU-native re-design of the reference's IMU core
(`/root/reference/src/IMU/imudata.h:34-42`, `src/IMU/NavState.h:16-83`,
`src/IMU/IMUPreintegrator.cc:82-144`, `src/Converter.cc:59-81`).

Key differences from the reference:

- the preintegrator is not an object updated sample-by-sample; it is a
  single `lax.scan` over a (padded, masked) window of IMU samples that
  produces DeltaR/DeltaV/DeltaP, all five bias Jacobians and the 9x9 noise
  covariance in one fused pass;
- `batch_preintegrate` re-preintegrates *every* keyframe interval at once
  (vmap over intervals) — the operation the reference performs KF-by-KF in a
  Python-style loop after each bias update (`src/LocalMapping.cc:1047-1057`);
- states are struct-of-arrays pytrees so whole keyframe tables preintegrate /
  propagate in one XLA program.

Math follows Forster et al., "On-Manifold Preintegration" (TRO 2017),
Eq. 36 (delta updates), Eq. 63 (covariance), matching the reference's
implementation order: covariance first, then bias Jacobians, then deltas
(P with previous V/R, then V, then R).

Covariance state ordering is (P, V, Phi) — position, velocity, rotation —
matching `src/IMU/IMUPreintegrator.h` `_cov_P_V_Phi`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


class ImuNoise(NamedTuple):
    """Continuous-time IMU noise densities -> discrete covariances.

    Mirrors `src/IMU/imudata.{h,cc}`: the reference stores *discrete*
    covariances sigma^2 / dt with the nominal IMU rate folded in at config
    time (`src/IMU/configparam.cc:78-88`).
    """

    gyr_meas_cov: jax.Array  # (3, 3) discrete gyro measurement covariance
    acc_meas_cov: jax.Array  # (3, 3) discrete accel measurement covariance
    gyr_bias_rw2: jax.Array  # (3, 3) gyro bias random-walk cov (per sqrt dt)
    acc_bias_rw2: jax.Array  # (3, 3) accel bias random-walk cov

    @staticmethod
    def from_sigmas(
        sigma_g: float, sigma_gw: float, sigma_a: float, sigma_aw: float, rate_hz: float = 200.0,
        dtype=jnp.float32,
    ) -> "ImuNoise":
        dt = 1.0 / rate_hz
        eye = jnp.eye(3, dtype=dtype)
        return ImuNoise(
            gyr_meas_cov=eye * (sigma_g**2 / dt),
            acc_meas_cov=eye * (sigma_a**2 / dt),
            gyr_bias_rw2=eye * (sigma_gw**2),
            acc_bias_rw2=eye * (sigma_aw**2),
        )


# EuRoC default noise parameters (Examples/ROS/ORB_VIO/Config/EuRoC.yaml).
EUROC_NOISE = dict(sigma_g=1.6968e-4, sigma_gw=1.9393e-5, sigma_a=2.0e-3, sigma_aw=3.0e-3, rate_hz=200.0)
GRAVITY = 9.810  # src/IMU/configparam.cc:5


class NavState(NamedTuple):
    """15-DoF navigation state {P, V, R, bg, ba} + delta-bias {dbg, dba}.

    Equivalent to `src/IMU/NavState.h:16-83`. R is stored as a (..., 3, 3)
    rotation matrix (world-from-body, Rwb). All leaves broadcast over
    leading batch axes, so a whole keyframe table is a single NavState.
    """

    p: jax.Array  # (..., 3) position of body in world
    v: jax.Array  # (..., 3) velocity in world
    R: jax.Array  # (..., 3, 3) Rwb
    bg: jax.Array  # (..., 3) gyro bias
    ba: jax.Array  # (..., 3) accel bias
    dbg: jax.Array  # (..., 3) delta gyro bias (optimization increment)
    dba: jax.Array  # (..., 3) delta accel bias

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "NavState":
        z = jnp.zeros(batch_shape + (3,), dtype)
        return NavState(
            p=z, v=z,
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            bg=z, ba=z, dbg=z, dba=z,
        )

    def inc_small_pvr(self, upd9: jax.Array) -> "NavState":
        """Manifold increment of (P, V, R) by a 9-vector (dP, dV, dPhi).

        Position update is in the *body* frame: P += R @ dP — matching the
        reference's `NavState::IncSmallPVR` (`src/IMU/NavState.h:45-48`,
        applied at `src/IMU/g2otypes.cc:793-812`).
        """
        dp, dv, dphi = upd9[..., 0:3], upd9[..., 3:6], upd9[..., 6:9]
        return self._replace(
            p=self.p + jnp.einsum("...ij,...j->...i", self.R, dp),
            v=self.v + dv,
            R=self.R @ lie.so3_exp(dphi),
        )

    def inc_small_bias(self, upd6: jax.Array) -> "NavState":
        """Delta-bias increment (dbg, dba) — `NavState::IncSmallBias`."""
        return self._replace(dbg=self.dbg + upd6[..., 0:3], dba=self.dba + upd6[..., 3:6])


class PreintState(NamedTuple):
    """Preintegrated IMU measurement between two frames/keyframes.

    Equivalent to the reference `IMUPreintegrator` members
    (`src/IMU/IMUPreintegrator.h`): deltas, 5 bias Jacobians, 9x9 covariance
    (P-V-Phi order), accumulated dt. Batchable over leading axes.
    """

    dP: jax.Array  # (..., 3)
    dV: jax.Array  # (..., 3)
    dR: jax.Array  # (..., 3, 3)
    J_P_bg: jax.Array  # (..., 3, 3)
    J_P_ba: jax.Array
    J_V_bg: jax.Array
    J_V_ba: jax.Array
    J_R_bg: jax.Array
    cov: jax.Array  # (..., 9, 9) order (P, V, Phi)
    dt: jax.Array  # (...,) accumulated time

    @staticmethod
    def zero(batch_shape=(), dtype=jnp.float32) -> "PreintState":
        z3 = jnp.zeros(batch_shape + (3,), dtype)
        z33 = jnp.zeros(batch_shape + (3, 3), dtype)
        return PreintState(
            dP=z3, dV=z3,
            dR=jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch_shape + (3, 3)),
            J_P_bg=z33, J_P_ba=z33, J_V_bg=z33, J_V_ba=z33, J_R_bg=z33,
            cov=jnp.zeros(batch_shape + (9, 9), dtype),
            dt=jnp.zeros(batch_shape, dtype),
        )


def _preint_step(state: PreintState, omega, acc, dt, noise: ImuNoise) -> PreintState:
    """One preintegration update (bias-corrected omega/acc, time step dt).

    Mirrors `IMUPreintegrator::update` (`src/IMU/IMUPreintegrator.cc:82-144`)
    exactly: covariance propagation (Eq. 63) and bias Jacobians use the
    *pre-update* deltas, then P (with old V/R), V (with old R), R last.
    """
    dt2 = dt * dt
    dRk = lie.so3_exp(omega * dt)
    Jr = lie.so3_Jr(omega * dt)
    R = state.dR
    skew_a = lie.hat(acc)
    R_skew_a = R @ skew_a

    # --- covariance propagation, state order (P, V, Phi) ---
    eye3 = jnp.eye(3, dtype=acc.dtype)
    z3 = jnp.zeros_like(eye3)
    A = jnp.block([
        [eye3, eye3 * dt, -0.5 * R_skew_a * dt2],
        [z3, eye3, -R_skew_a * dt],
        [z3, z3, jnp.swapaxes(dRk, -1, -2)],
    ])
    Bg = jnp.concatenate([jnp.zeros((6, 3), acc.dtype), Jr * dt], axis=0)
    Ca = jnp.concatenate([0.5 * R * dt2, R * dt, jnp.zeros((3, 3), acc.dtype)], axis=0)
    cov = (
        A @ state.cov @ A.T
        + Bg @ noise.gyr_meas_cov @ Bg.T
        + Ca @ noise.acc_meas_cov @ Ca.T
    )

    # --- bias Jacobians (P first with old V-jacobians, then V, then R) ---
    J_P_ba = state.J_P_ba + state.J_V_ba * dt - 0.5 * R * dt2
    J_P_bg = state.J_P_bg + state.J_V_bg * dt - 0.5 * R_skew_a @ state.J_R_bg * dt2
    J_V_ba = state.J_V_ba - R * dt
    J_V_bg = state.J_V_bg - R_skew_a @ state.J_R_bg * dt
    J_R_bg = jnp.swapaxes(dRk, -1, -2) @ state.J_R_bg - Jr * dt

    # --- delta measurements (P with old V/R, then V, then R) ---
    Racc = R @ acc
    dP = state.dP + state.dV * dt + 0.5 * Racc * dt2
    dV = state.dV + Racc * dt
    dR = lie.normalize_rotation(R @ dRk)

    return PreintState(
        dP=dP, dV=dV, dR=dR,
        J_P_bg=J_P_bg, J_P_ba=J_P_ba, J_V_bg=J_V_bg, J_V_ba=J_V_ba, J_R_bg=J_R_bg,
        cov=cov, dt=state.dt + dt,
    )


def preintegrate(
    gyro: jax.Array,       # (N, 3) raw gyro samples
    acc: jax.Array,        # (N, 3) raw accel samples
    dts: jax.Array,        # (N,) per-sample integration intervals
    bg: jax.Array,         # (3,) gyro bias
    ba: jax.Array,         # (3,) accel bias
    noise: ImuNoise,
    mask: jax.Array | None = None,  # (N,) bool; padded slots must be False
) -> PreintState:
    """Preintegrate a window of IMU samples in one fused scan.

    Semantics match the reference loop in `Frame::ComputeIMUPreIntSinceLastKF`
    / `KeyFrame::ComputePreInt` (`src/Frame.cc:163-279`,
    `src/KeyFrame.cc:140-216`): each sample's (omega, acc) is measured at the
    segment start ("last measurement"), bias-corrected, integrated over dt.
    Padding is handled by forcing dt=0 on masked slots, which makes the
    update a no-op (exp(0)=I, all increments scale with dt).
    """
    if mask is not None:
        dts = jnp.where(mask, dts, 0.0)

    def step(carry, inp):
        w, a, dt = inp
        return _preint_step(carry, w - bg, a - ba, dt, noise), None

    init = PreintState.zero(dtype=gyro.dtype)
    out, _ = jax.lax.scan(step, init, (gyro, acc, dts))
    return out


def batch_preintegrate(gyro, acc, dts, bg, ba, noise, mask=None):
    """Preintegrate B independent windows at once.

    gyro/acc: (B, N, 3); dts/mask: (B, N); bg/ba: (B, 3) or (3,).
    This replaces the reference's per-keyframe re-preintegration loop after
    bias updates (`src/LocalMapping.cc:1047-1057`) with one vmapped program.
    """
    if bg.ndim == 1:
        bg = jnp.broadcast_to(bg, gyro.shape[:1] + (3,))
    if ba.ndim == 1:
        ba = jnp.broadcast_to(ba, gyro.shape[:1] + (3,))
    if mask is None:
        mask = jnp.ones(gyro.shape[:2], bool)
    return jax.vmap(lambda g, a, d, m, bgi, bai: preintegrate(g, a, d, bgi, bai, noise, m))(
        gyro, acc, dts, mask, bg, ba
    )


def propagate_navstate(ns: NavState, pre: PreintState, gravity: jax.Array) -> NavState:
    """Apply a preintegrated measurement to a NavState.

    Mirrors `Converter::updateNS` (`src/Converter.cc:59-81`):
        P <- P + V dt + 0.5 g dt^2 + R dP
        V <- V + g dt + R dV
        R <- R * dR
    and resets delta-biases to zero.
    """
    dt = pre.dt[..., None]
    P = ns.p + ns.v * dt + 0.5 * gravity * dt**2 + jnp.einsum("...ij,...j->...i", ns.R, pre.dP)
    V = ns.v + gravity * dt + jnp.einsum("...ij,...j->...i", ns.R, pre.dV)
    R = lie.normalize_rotation(ns.R @ pre.dR)
    z = jnp.zeros_like(ns.dbg)
    return ns._replace(p=P, v=V, R=R, dbg=z, dba=z)


def bias_corrected_delta(pre: PreintState, dbg: jax.Array, dba: jax.Array):
    """First-order bias-corrected deltas (Forster RSS'15 correction terms).

    Returns (dP', dV', dR') with
        dP' = dP + J_P_bg dbg + J_P_ba dba     (used in EdgeNavStatePVR,
        dV' = dV + J_V_bg dbg + J_V_ba dba      `src/IMU/g2otypes.cc:42-49`)
        dR' = dR * exp(J_R_bg dbg)
    """
    dP = pre.dP + jnp.einsum("...ij,...j->...i", pre.J_P_bg, dbg) + jnp.einsum("...ij,...j->...i", pre.J_P_ba, dba)
    dV = pre.dV + jnp.einsum("...ij,...j->...i", pre.J_V_bg, dbg) + jnp.einsum("...ij,...j->...i", pre.J_V_ba, dba)
    dR = pre.dR @ lie.so3_exp(jnp.einsum("...ij,...j->...i", pre.J_R_bg, dbg))
    return dP, dV, dR
