"""Preintegration correctness: closed-form motions, bias Jacobians, covariance.

Verifies the fused-scan preintegrator against (a) analytic constant-motion
solutions, (b) finite-difference bias Jacobians, (c) covariance PSD and
growth, (d) NavState propagation consistency — the test pyramid the reference
lacks (SURVEY.md section 4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.ops import imu
from viorb_tpu.utils import lie

NOISE = imu.ImuNoise.from_sigmas(**imu.EUROC_NOISE, dtype=jnp.float64)
KEY = jax.random.PRNGKey(42)


def _const_window(gyro_v, acc_v, n=200, dt=0.005):
    gyro = jnp.tile(jnp.asarray(gyro_v, jnp.float64), (n, 1))
    acc = jnp.tile(jnp.asarray(acc_v, jnp.float64), (n, 1))
    dts = jnp.full((n,), dt, jnp.float64)
    return gyro, acc, dts


class TestPreintegrationClosedForm:
    def test_static(self):
        g, a, d = _const_window([0, 0, 0], [0, 0, 0])
        pre = imu.preintegrate(g, a, d, jnp.zeros(3), jnp.zeros(3), NOISE)
        np.testing.assert_allclose(pre.dP, 0.0, atol=1e-15)
        np.testing.assert_allclose(pre.dV, 0.0, atol=1e-15)
        np.testing.assert_allclose(pre.dR, jnp.eye(3), atol=1e-15)
        np.testing.assert_allclose(pre.dt, 1.0, atol=1e-12)

    def test_constant_accel(self):
        a0 = jnp.array([1.0, -2.0, 0.5])
        g, a, d = _const_window([0, 0, 0], a0)
        pre = imu.preintegrate(g, a, d, jnp.zeros(3), jnp.zeros(3), NOISE)
        T = 1.0
        np.testing.assert_allclose(pre.dV, a0 * T, atol=1e-12)
        # Discrete Euler sum: dP = sum(V_k dt + 0.5 a dt^2) = 0.5 a T^2 exactly
        np.testing.assert_allclose(pre.dP, 0.5 * a0 * T**2, atol=1e-12)

    def test_constant_rotation(self):
        w0 = jnp.array([0.0, 0.0, 0.7])
        g, a, d = _const_window(w0, [0, 0, 0])
        pre = imu.preintegrate(g, a, d, jnp.zeros(3), jnp.zeros(3), NOISE)
        np.testing.assert_allclose(pre.dR, lie.so3_exp(w0 * 1.0), atol=1e-9)

    def test_bias_subtraction(self):
        """Integrating biased measurements with the same bias = static."""
        bg = jnp.array([0.01, -0.02, 0.005])
        ba = jnp.array([0.1, 0.05, -0.1])
        g, a, d = _const_window(bg, ba)
        pre = imu.preintegrate(g, a, d, bg, ba, NOISE)
        np.testing.assert_allclose(pre.dP, 0.0, atol=1e-14)
        np.testing.assert_allclose(pre.dR, jnp.eye(3), atol=1e-14)

    def test_mask_padding(self):
        g, a, d = _const_window([0.1, 0.2, 0.3], [1.0, 0, 0], n=100)
        # Padded version: 150 slots, last 50 masked with garbage values.
        g_pad = jnp.concatenate([g, jnp.full((50, 3), 99.0)])
        a_pad = jnp.concatenate([a, jnp.full((50, 3), 99.0)])
        d_pad = jnp.concatenate([d, jnp.full((50,), 0.005)])
        mask = jnp.arange(150) < 100
        pre = imu.preintegrate(g, a, d, jnp.zeros(3), jnp.zeros(3), NOISE)
        pre_pad = imu.preintegrate(g_pad, a_pad, d_pad, jnp.zeros(3), jnp.zeros(3), NOISE, mask)
        for x, y in zip(pre, pre_pad):
            np.testing.assert_allclose(x, y, atol=1e-12)


class TestBiasJacobians:
    def _random_window(self, n=50):
        k1, k2 = jax.random.split(KEY)
        gyro = 0.4 * jax.random.normal(k1, (n, 3), jnp.float64)
        acc = 2.0 * jax.random.normal(k2, (n, 3), jnp.float64) + jnp.array([0, 0, 9.8])
        dts = jnp.full((n,), 0.005, jnp.float64)
        return gyro, acc, dts

    def test_fd_gyro_bias(self):
        gyro, acc, dts = self._random_window()
        bg0, ba0 = jnp.zeros(3), jnp.zeros(3)
        pre = imu.preintegrate(gyro, acc, dts, bg0, ba0, NOISE)
        eps = 1e-6
        for i in range(3):
            dbg = jnp.zeros(3).at[i].set(eps)
            pre_p = imu.preintegrate(gyro, acc, dts, bg0 + dbg, ba0, NOISE)
            np.testing.assert_allclose((pre_p.dP - pre.dP) / eps, pre.J_P_bg[:, i], atol=2e-4)
            np.testing.assert_allclose((pre_p.dV - pre.dV) / eps, pre.J_V_bg[:, i], atol=2e-4)
            # dR(bg+e) ~= dR(bg) exp(J_R_bg e)
            dphi = lie.so3_log(jnp.swapaxes(pre.dR, -1, -2) @ pre_p.dR)
            np.testing.assert_allclose(dphi / eps, pre.J_R_bg[:, i], atol=2e-4)

    def test_fd_acc_bias(self):
        gyro, acc, dts = self._random_window()
        bg0, ba0 = jnp.zeros(3), jnp.zeros(3)
        pre = imu.preintegrate(gyro, acc, dts, bg0, ba0, NOISE)
        eps = 1e-6
        for i in range(3):
            dba = jnp.zeros(3).at[i].set(eps)
            pre_p = imu.preintegrate(gyro, acc, dts, bg0, ba0 + dba, NOISE)
            np.testing.assert_allclose((pre_p.dP - pre.dP) / eps, pre.J_P_ba[:, i], atol=1e-6)
            np.testing.assert_allclose((pre_p.dV - pre.dV) / eps, pre.J_V_ba[:, i], atol=1e-6)

    def test_bias_corrected_delta_consistency(self):
        """First-order correction matches re-preintegration with shifted bias."""
        gyro, acc, dts = self._random_window()
        pre = imu.preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3), NOISE)
        dbg = jnp.array([1e-3, -2e-3, 1.5e-3])
        dba = jnp.array([5e-3, 1e-3, -4e-3])
        dP_c, dV_c, dR_c = imu.bias_corrected_delta(pre, dbg, dba)
        pre_new = imu.preintegrate(gyro, acc, dts, dbg, dba, NOISE)
        # First-order correction must shrink the error vs the uncorrected
        # deltas by a large factor (residual is second order in the bias).
        for corrected, uncorrected, truth in [
            (dP_c, pre.dP, pre_new.dP),
            (dV_c, pre.dV, pre_new.dV),
            (dR_c, pre.dR, pre_new.dR),
        ]:
            err_c = float(jnp.max(jnp.abs(corrected - truth)))
            err_u = float(jnp.max(jnp.abs(uncorrected - truth)))
            assert err_c < 0.02 * err_u, (err_c, err_u)
            assert err_c < 1e-4


class TestCovariance:
    def test_psd_and_growth(self):
        k1, k2 = jax.random.split(KEY)
        n = 100
        gyro = 0.3 * jax.random.normal(k1, (n, 3), jnp.float64)
        acc = jax.random.normal(k2, (n, 3), jnp.float64)
        dts = jnp.full((n,), 0.005, jnp.float64)
        pre = imu.preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3), NOISE)
        cov = np.asarray(pre.cov)
        np.testing.assert_allclose(cov, cov.T, atol=1e-18)
        eig = np.linalg.eigvalsh(cov)
        assert eig.min() >= -1e-18
        # Longer integration -> strictly more uncertainty (trace grows).
        pre_half = imu.preintegrate(gyro[:50], acc[:50], dts[:50], jnp.zeros(3), jnp.zeros(3), NOISE)
        assert np.trace(np.asarray(pre_half.cov)) < np.trace(cov)


class TestNavState:
    def test_propagate_free_fall(self):
        """Static IMU measuring only -g: propagation = free fall cancellation."""
        gravity = jnp.array([0.0, 0.0, -imu.GRAVITY])
        # body at identity: accel measures specific force = -gravity
        g, a, d = _const_window([0, 0, 0], -gravity)
        pre = imu.preintegrate(g, a, d, jnp.zeros(3), jnp.zeros(3), NOISE)
        ns = imu.NavState.identity(dtype=jnp.float64)
        ns2 = imu.propagate_navstate(ns, pre, gravity)
        np.testing.assert_allclose(ns2.p, 0.0, atol=1e-12)
        np.testing.assert_allclose(ns2.v, 0.0, atol=1e-12)
        np.testing.assert_allclose(ns2.R, jnp.eye(3), atol=1e-12)

    def test_inc_small_pvr_body_frame(self):
        ns = imu.NavState.identity(dtype=jnp.float64)._replace(R=lie.so3_exp(jnp.array([0.0, 0.0, jnp.pi / 2])))
        upd = jnp.zeros(9).at[0].set(1.0)  # dP = (1,0,0) in body frame
        ns2 = ns.inc_small_pvr(upd)
        np.testing.assert_allclose(ns2.p, jnp.array([0.0, 1.0, 0.0]), atol=1e-12)

    def test_batched_windows(self):
        B, N = 4, 64
        k1, k2 = jax.random.split(KEY)
        gyro = 0.2 * jax.random.normal(k1, (B, N, 3), jnp.float64)
        acc = jax.random.normal(k2, (B, N, 3), jnp.float64)
        dts = jnp.full((B, N), 0.005, jnp.float64)
        out = imu.batch_preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3), NOISE)
        single = imu.preintegrate(gyro[1], acc[1], dts[1], jnp.zeros(3), jnp.zeros(3), NOISE)
        for x, y in zip(out, single):
            np.testing.assert_allclose(x[1], y, atol=1e-14)
