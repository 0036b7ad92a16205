"""Synthetic bundle-adjustment convergence tests for the Schur-LM solver."""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.solver import ba, factors
from viorb_tpu.utils import lie

CAM = ba.Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)


def make_scene(key, n_cams=8, n_pts=120, noise_px=0.0):
    """Cameras on an arc looking at a point cloud near the origin."""
    kp, kn, kper = jax.random.split(key, 3)
    pts = jax.random.uniform(kp, (n_pts, 3), minval=-2.0, maxval=2.0)
    pts = pts.at[:, 2].add(6.0)  # cloud centered ~6m ahead

    angles = jnp.linspace(-0.3, 0.3, n_cams)
    Rcw = jax.vmap(lambda a: lie.so3_exp(jnp.array([0.0, 1.0, 0.0]) * a))(angles)
    centers = jnp.stack([2.0 * jnp.sin(angles), 0.1 * angles, -2.0 * jnp.cos(angles) + 2.0], axis=-1)
    tcw = -jnp.einsum("kij,kj->ki", Rcw, centers)

    cam_idx = jnp.repeat(jnp.arange(n_cams), n_pts)
    lm_idx = jnp.tile(jnp.arange(n_pts), n_cams)
    err, Pc = factors.reproj_residual(
        Rcw[cam_idx], tcw[cam_idx], pts[lm_idx], jnp.zeros((n_cams * n_pts, 2)),
        CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    uv = -err  # projection of the true geometry
    uv = uv + noise_px * jax.random.normal(kn, uv.shape)
    valid = (Pc[:, 2] > 0.1) & (jnp.abs(uv[:, 0] - CAM.cx) < 380) & (jnp.abs(uv[:, 1] - CAM.cy) < 260)

    obs = ba.BAObservations(
        cam_idx=cam_idx, lm_idx=lm_idx, uv=uv,
        inv_sigma2=jnp.ones(uv.shape[0]), valid=valid,
    )
    return ba.VisionBAState(Rcw=Rcw, tcw=tcw, points=pts), obs


def perturb(state, key, rot=0.02, trans=0.05, pts=0.05, keep_first=2):
    k1, k2, k3 = jax.random.split(key, 3)
    K = state.Rcw.shape[0]
    dphi = rot * jax.random.normal(k1, (K, 3))
    dt = trans * jax.random.normal(k2, (K, 3))
    keep = (jnp.arange(K) < keep_first)[:, None]
    dphi = jnp.where(keep, 0.0, dphi)
    dt = jnp.where(keep, 0.0, dt)
    Rcw = jax.vmap(lambda R, p: lie.so3_exp(p) @ R)(state.Rcw, dphi)
    dpts = pts * jax.random.normal(k3, state.points.shape)
    return ba.VisionBAState(Rcw=Rcw, tcw=state.tcw + dt, points=state.points + dpts)


def rms_reproj(state, obs):
    err, _ = factors.reproj_residual(
        state.Rcw[obs.cam_idx], state.tcw[obs.cam_idx], state.points[obs.lm_idx],
        obs.uv, CAM.fx, CAM.fy, CAM.cx, CAM.cy,
    )
    m = obs.valid.astype(err.dtype)
    return float(jnp.sqrt(jnp.sum(jnp.sum(err**2, -1) * m) / jnp.maximum(jnp.sum(m), 1)))


class TestVisionBA:
    def test_noise_free_convergence(self):
        key = jax.random.PRNGKey(0)
        gt, obs = make_scene(key)
        init = perturb(gt, jax.random.PRNGKey(1))
        fixed = jnp.arange(gt.Rcw.shape[0]) < 2  # pin gauge (pose+scale)
        assert rms_reproj(init, obs) > 5.0
        out, obs2 = ba.bundle_adjust_vision(init, obs, CAM, fixed)
        assert rms_reproj(out, obs2) < 1e-3
        # camera poses recovered
        np.testing.assert_allclose(np.asarray(out.tcw), np.asarray(gt.tcw), atol=1e-3)

    def test_noisy_convergence_with_outliers(self):
        key = jax.random.PRNGKey(2)
        gt, obs = make_scene(key, noise_px=0.5)
        # corrupt 5% of observations with gross outliers
        ko = jax.random.PRNGKey(3)
        n = obs.uv.shape[0]
        outl = jax.random.uniform(ko, (n,)) < 0.05
        uv_bad = obs.uv + jnp.where(outl[:, None], 40.0, 0.0)
        obs = obs._replace(uv=uv_bad)
        init = perturb(gt, jax.random.PRNGKey(4))
        fixed = jnp.arange(gt.Rcw.shape[0]) < 2
        out, obs2 = ba.bundle_adjust_vision(init, obs, CAM, fixed)
        # outliers gated away; inlier reprojection near the noise floor
        inl = obs2.valid & ~outl
        err, _ = factors.reproj_residual(
            out.Rcw[obs.cam_idx], out.tcw[obs.cam_idx], out.points[obs.lm_idx],
            obs.uv, CAM.fx, CAM.fy, CAM.cx, CAM.cy,
        )
        rms_inl = float(jnp.sqrt(jnp.mean(jnp.sum(err**2, -1), where=inl)))
        assert rms_inl < 1.2  # ~noise floor (0.5 px/axis)
        # most injected outliers were flagged invalid
        frac_caught = float(jnp.mean(~obs2.valid, where=outl))
        assert frac_caught > 0.9

    def test_fixed_cameras_unchanged(self):
        key = jax.random.PRNGKey(5)
        gt, obs = make_scene(key)
        init = perturb(gt, jax.random.PRNGKey(6))
        fixed = jnp.arange(gt.Rcw.shape[0]) < 2
        out, _ = ba.bundle_adjust_vision(init, obs, CAM, fixed)
        np.testing.assert_allclose(out.Rcw[:2], init.Rcw[:2], atol=1e-12)
        np.testing.assert_allclose(out.tcw[:2], init.tcw[:2], atol=1e-12)

    def test_jit_compiles_once(self):
        key = jax.random.PRNGKey(8)
        gt, obs = make_scene(key, n_cams=4, n_pts=50)
        init = perturb(gt, jax.random.PRNGKey(9))
        fixed = jnp.arange(4) < 2
        f = jax.jit(
            lambda s, o: ba.bundle_adjust_vision(s, o, CAM, fixed)[0],
        )
        out1 = f(init, obs)
        out2 = f(init, obs)  # cached
        np.testing.assert_allclose(out1.points, out2.points)
