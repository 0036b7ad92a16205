"""Two-view bootstrap tests: general motion (F path) and planar scene (H path)."""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.pipeline import initializer
from viorb_tpu.solver.ba import Camera
from viorb_tpu.utils import lie

CAM = Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)


def project(Rcw, tcw, X):
    Pc = X @ np.asarray(Rcw).T + np.asarray(tcw)
    return np.stack(
        [CAM.fx * Pc[:, 0] / Pc[:, 2] + CAM.cx, CAM.fy * Pc[:, 1] / Pc[:, 2] + CAM.cy], -1
    ), Pc[:, 2]


def two_view_scene(planar=False, n=200, noise=0.3, outliers=0.05, seed=0):
    rng = np.random.default_rng(seed)
    if planar:
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), 6.0 + 0.0 * rng.uniform(0, 1, n)], -1
        )
    else:
        X = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 10, n)], -1
        )
    R2 = np.asarray(lie.so3_exp(jnp.array([0.02, -0.12, 0.03])))
    t2 = np.array([0.6, 0.05, 0.1])
    uv1, z1 = project(np.eye(3), np.zeros(3), X)
    uv2, z2 = project(R2, t2, X)
    uv1 += noise * rng.standard_normal(uv1.shape)
    uv2 += noise * rng.standard_normal(uv2.shape)
    out = rng.uniform(size=n) < outliers
    uv2[out] += rng.uniform(20, 60, (out.sum(), 2))
    valid = (z1 > 0.1) & (z2 > 0.1)
    return jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(valid), (R2, t2, X, out)


def _angle_between(Ra, Rb):
    return float(jnp.linalg.norm(lie.so3_log(jnp.asarray(Ra).T @ jnp.asarray(Rb))))


class TestInitializer:
    def test_general_scene_f_model(self):
        uv1, uv2, valid, (R2, t2, X, out) = two_view_scene(planar=False)
        res = initializer.initialize_two_view(uv1, uv2, valid, CAM, jax.random.PRNGKey(0))
        assert bool(res.success)
        assert not bool(res.used_h)
        assert _angle_between(res.Rcw2, R2) < 0.01
        # translation up to scale
        # translation direction up to scale; single-hypothesis 8-point with
        # 0.3 px noise gives a few-degree direction error (the reference
        # likewise refines only in the post-init global BA)
        t_est = np.asarray(res.tcw2)
        t_gt = t2 / np.linalg.norm(t2)
        assert np.abs(t_est / np.linalg.norm(t_est) - t_gt).max() < 0.06
        # triangulated structure roughly matches GT at the same scale
        g = np.asarray(res.good)
        assert g.sum() > 100
        scale = np.linalg.norm(t2)  # t normalized to 1 -> world shrinks by |t|
        err = np.abs(np.asarray(res.points)[g] * scale - X[g])
        assert np.median(err) < 0.2
        # injected outliers must not be 'good'
        assert (~g[out]).mean() > 0.9

    def test_planar_scene_h_model(self):
        uv1, uv2, valid, (R2, t2, X, out) = two_view_scene(planar=True)
        res = initializer.initialize_two_view(uv1, uv2, valid, CAM, jax.random.PRNGKey(1))
        assert bool(res.used_h)
        assert bool(res.success)
        assert _angle_between(res.Rcw2, R2) < 0.02
        t_est = np.asarray(res.tcw2)
        t_gt = t2 / np.linalg.norm(t2)
        assert np.abs(t_est / np.linalg.norm(t_est) - t_gt).max() < 0.03

    def test_pure_rotation_rejected(self):
        """No parallax -> init must fail (reference's parallax gate)."""
        rng = np.random.default_rng(2)
        X = np.stack([rng.uniform(-3, 3, 200), rng.uniform(-2, 2, 200), rng.uniform(4, 10, 200)], -1)
        R2 = np.asarray(lie.so3_exp(jnp.array([0.0, -0.1, 0.02])))
        uv1, z1 = project(np.eye(3), np.zeros(3), X)
        uv2, z2 = project(R2, np.zeros(3), X)
        valid = jnp.asarray((z1 > 0) & (z2 > 0))
        res = initializer.initialize_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), valid, CAM, jax.random.PRNGKey(3)
        )
        assert not bool(res.success)

    def test_triangulate_exact(self):
        rng = np.random.default_rng(3)
        X = np.stack([rng.uniform(-2, 2, 50), rng.uniform(-2, 2, 50), rng.uniform(3, 8, 50)], -1)
        R2 = np.asarray(lie.so3_exp(jnp.array([0.05, -0.1, 0.0])))
        t2 = np.array([0.4, 0.0, 0.05])
        x1n = X[:, :2] / X[:, 2:3]
        Xc2 = X @ R2.T + t2
        x2n = Xc2[:, :2] / Xc2[:, 2:3]
        Xt = initializer.triangulate(
            jnp.eye(3), jnp.zeros(3), jnp.asarray(R2), jnp.asarray(t2),
            jnp.asarray(x1n), jnp.asarray(x2n),
        )
        np.testing.assert_allclose(np.asarray(Xt), X, atol=1e-6)
