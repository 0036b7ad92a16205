"""Group identities and Jacobian checks for viorb_tpu.utils.lie."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viorb_tpu.utils import lie

KEY = jax.random.PRNGKey(0)


def rand_phi(key, n=32, scale=2.0):
    return jax.random.normal(key, (n, 3)) * scale


class TestSO3:
    def test_exp_log_roundtrip(self):
        phi = rand_phi(KEY)
        # keep |phi| < pi for uniqueness
        phi = phi / (1.0 + jnp.linalg.norm(phi, axis=-1, keepdims=True) / 3.0)
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(lie.so3_log(R), phi, atol=1e-9)

    def test_exp_is_rotation(self):
        R = lie.so3_exp(rand_phi(KEY))
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-12)
        np.testing.assert_allclose(jnp.linalg.det(R), 1.0, atol=1e-12)

    def test_small_angle(self):
        phi = jnp.array([[1e-12, -1e-13, 1e-12], [0.0, 0.0, 0.0]])
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), R.shape), atol=1e-10)
        assert jnp.all(jnp.isfinite(lie.so3_Jr(phi)))
        assert jnp.all(jnp.isfinite(lie.so3_Jr_inv(phi)))

    def test_near_pi_log(self):
        axis = jnp.array([0.6, -0.64, 0.48])
        axis = axis / jnp.linalg.norm(axis)
        phi = axis * (np.pi - 1e-6)
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(lie.so3_log(R), phi, atol=1e-5)

    def test_right_jacobian_fd(self):
        """exp(phi + d) ~= exp(phi) exp(Jr(phi) d)."""
        phi = jnp.array([0.3, -0.7, 0.5])
        Jr = lie.so3_Jr(phi)
        eps = 1e-6
        for i in range(3):
            d = jnp.zeros(3).at[i].set(eps)
            lhs = lie.so3_exp(phi + d)
            rhs = lie.so3_exp(phi) @ lie.so3_exp(Jr @ d)
            np.testing.assert_allclose(lhs, rhs, atol=1e-10)

    def test_jr_inv(self):
        phi = rand_phi(KEY, 8, 1.0)
        prod = lie.so3_Jr(phi) @ lie.so3_Jr_inv(phi)
        np.testing.assert_allclose(prod, jnp.broadcast_to(jnp.eye(3), prod.shape), atol=1e-9)

    def test_hat_vee(self):
        v = rand_phi(KEY, 5)
        np.testing.assert_allclose(lie.vee(lie.hat(v)), v)


class TestQuat:
    def test_quat_matrix_roundtrip(self):
        phi = rand_phi(KEY)
        R = lie.so3_exp(phi)
        np.testing.assert_allclose(lie.quat_to_matrix(lie.quat_from_matrix(R)), R, atol=1e-12)

    def test_quat_from_matrix_all_pivots(self):
        # Rotations near pi about each axis exercise all 4 Shepperd branches.
        for axis in [jnp.array([1.0, 0, 0]), jnp.array([0, 1.0, 0]), jnp.array([0, 0, 1.0])]:
            phi = axis * 3.1
            R = lie.so3_exp(phi)
            np.testing.assert_allclose(lie.quat_to_matrix(lie.quat_from_matrix(R)), R, atol=1e-12)

    def test_quat_exp_log(self):
        phi = rand_phi(KEY, scale=0.8)
        np.testing.assert_allclose(lie.quat_log(lie.quat_exp(phi)), phi, atol=1e-10)

    def test_quat_mul_matches_matrix(self):
        k1, k2 = jax.random.split(KEY)
        a, b = rand_phi(k1, 4, 1.0), rand_phi(k2, 4, 1.0)
        qa, qb = lie.quat_exp(a), lie.quat_exp(b)
        np.testing.assert_allclose(
            lie.quat_to_matrix(lie.quat_mul(qa, qb)),
            lie.quat_to_matrix(qa) @ lie.quat_to_matrix(qb),
            atol=1e-12,
        )

    def test_normalize_rotation(self):
        R = lie.so3_exp(jnp.array([0.2, 0.5, -0.1]))
        R_drift = R + 1e-5 * jax.random.normal(KEY, (3, 3))
        Rn = lie.normalize_rotation(R_drift)
        np.testing.assert_allclose(Rn @ Rn.T, jnp.eye(3), atol=1e-12)
        np.testing.assert_allclose(Rn, R, atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (16, 6))
        xi = xi.at[:, 3:].mul(0.6)
        R, t = lie.se3_exp(xi)
        np.testing.assert_allclose(lie.se3_log(R, t), xi, atol=1e-9)

    def test_inv_mul(self):
        xi = jax.random.normal(KEY, (4, 6)) * 0.5
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inv(R, t)
        Rp, tp = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(Rp, jnp.broadcast_to(jnp.eye(3), Rp.shape), atol=1e-12)
        np.testing.assert_allclose(tp, jnp.zeros_like(tp), atol=1e-12)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jax.random.normal(KEY, (16, 7)) * 0.5
        R, t, s = lie.sim3_exp(xi)
        np.testing.assert_allclose(lie.sim3_log(R, t, s), xi, atol=1e-8)

    def test_zero_sigma_matches_se3(self):
        xi6 = jax.random.normal(KEY, (4, 6)) * 0.5
        xi7 = jnp.concatenate([xi6, jnp.zeros((4, 1))], axis=-1)
        R7, t7, s7 = lie.sim3_exp(xi7)
        R6, t6 = lie.se3_exp(xi6)
        np.testing.assert_allclose(R7, R6, atol=1e-12)
        np.testing.assert_allclose(t7, t6, atol=1e-10)
        np.testing.assert_allclose(s7, 1.0, atol=1e-12)

    def test_inv_mul_apply(self):
        xi = jax.random.normal(KEY, (3, 7)) * 0.4
        R, t, s = lie.sim3_exp(xi)
        Ri, ti, si = lie.sim3_inv(R, t, s)
        p = jax.random.normal(KEY, (3, 3))
        q = lie.sim3_apply(R, t, s, p)
        np.testing.assert_allclose(lie.sim3_apply(Ri, ti, si, q), p, atol=1e-10)


@pytest.mark.parametrize("fn", [lie.so3_exp, lie.so3_Jr, lie.so3_Jr_inv])
def test_jittable_and_gradable(fn):
    phi = jnp.array([0.1, 0.2, -0.3])
    jitted = jax.jit(fn)
    np.testing.assert_allclose(jitted(phi), fn(phi), atol=1e-12)
    g = jax.grad(lambda p: jnp.sum(fn(p) ** 2))(phi)
    assert jnp.all(jnp.isfinite(g))
    # gradient finite at zero too
    g0 = jax.grad(lambda p: jnp.sum(fn(p) ** 2))(jnp.zeros(3))
    assert jnp.all(jnp.isfinite(g0))
