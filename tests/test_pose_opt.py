"""Pose-optimization tests: vision and visual-inertial variants."""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.ops import imu
from viorb_tpu.solver import ba, factors, pose
from viorb_tpu.utils import lie

CAM = ba.Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)
NOISE = imu.ImuNoise.from_sigmas(**imu.EUROC_NOISE, dtype=jnp.float64)
GRAVITY = jnp.array([0.0, 0.0, -imu.GRAVITY])


def make_pose_obs(key, Rcw, tcw, n=200, noise_px=0.3, outlier_frac=0.05):
    kp, kn, ko = jax.random.split(key, 3)
    pts = jax.random.uniform(kp, (n, 3), minval=-3.0, maxval=3.0)
    pts = pts.at[:, 2].add(7.0)
    # world points placed in front of the camera
    Pw = jnp.einsum("ij,oj->oi", Rcw.T, pts - tcw)  # pts were camera coords
    err, _ = factors.reproj_residual(Rcw, tcw, Pw, jnp.zeros((n, 2)), CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    uv = -err + noise_px * jax.random.normal(kn, (n, 2))
    outl = jax.random.uniform(ko, (n,)) < outlier_frac
    uv = uv + jnp.where(outl[:, None], 30.0, 0.0)
    obs = pose.PoseObs(pts=Pw, uv=uv, inv_sigma2=jnp.ones(n), valid=jnp.ones(n, bool))
    return obs, outl


class TestVisionPoseOpt:
    def test_recovers_pose(self):
        key = jax.random.PRNGKey(0)
        Rcw_gt = lie.so3_exp(jnp.array([0.1, -0.2, 0.05]))
        tcw_gt = jnp.array([0.3, -0.1, 0.2])
        obs, outl = make_pose_obs(key, Rcw_gt, tcw_gt)
        # perturbed init
        Rcw0 = lie.so3_exp(jnp.array([0.03, 0.02, -0.04])) @ Rcw_gt
        tcw0 = tcw_gt + jnp.array([0.1, -0.05, 0.08])
        R, t, inl, n_inl = pose.pose_optimize_vision(Rcw0, tcw0, obs, CAM)
        np.testing.assert_allclose(np.asarray(t), np.asarray(tcw_gt), atol=5e-3)
        np.testing.assert_allclose(np.asarray(R), np.asarray(Rcw_gt), atol=5e-3)
        # outliers excluded from the inlier set
        assert float(jnp.mean(~inl, where=outl)) > 0.9
        assert int(n_inl) > 150

    def test_jit(self):
        key = jax.random.PRNGKey(1)
        Rcw_gt = jnp.eye(3)
        tcw_gt = jnp.zeros(3)
        obs, _ = make_pose_obs(key, Rcw_gt, tcw_gt)
        f = jax.jit(lambda R, t, o: pose.pose_optimize_vision(R, t, o, CAM))
        R, t, inl, n = f(Rcw_gt, tcw_gt, obs)
        assert jnp.isfinite(t).all()


def _vi_setup(key):
    """Ground-truth 2-state IMU segment + current-frame observations."""
    ks = jax.random.split(key, 6)
    # EuRoC-like extrinsics
    Rbc = lie.so3_exp(jnp.array([0.0, 1.2, 0.1]))
    Pbc = jnp.array([0.02, -0.06, 0.01])
    Rcb, pcb = Rbc.T, -Rbc.T @ Pbc

    n = 40
    gyro = 0.3 * jax.random.normal(ks[0], (n, 3), jnp.float64)
    Rwb_i = lie.so3_exp(0.2 * jax.random.normal(ks[1], (3,)))
    # accel chosen so the body truly accelerates (specific force = a - g)
    a_w = 0.8 * jax.random.normal(ks[2], (n, 3), jnp.float64)
    dts = jnp.full((n,), 0.005, jnp.float64)

    # Integrate GT trajectory sample by sample (same ZOH as preintegrator).
    def step(carry, inp):
        p, v, R = carry
        w, a, dt = inp
        acc_body = R.T @ (a - GRAVITY)  # what the IMU measures
        p2 = p + v * dt + 0.5 * a * dt * dt
        v2 = v + a * dt
        R2 = R @ lie.so3_exp(w * dt)
        return (p2, v2, R2), acc_body

    p0 = jnp.array([0.5, -0.2, 0.1])
    v0 = jnp.array([0.3, 0.1, -0.2])
    (p1, v1, R1), acc_body = jax.lax.scan(step, (p0, v0, Rwb_i), (gyro, a_w, dts))

    pre = imu.preintegrate(gyro, acc_body, dts, jnp.zeros(3), jnp.zeros(3), NOISE)
    ns_kf = imu.NavState.identity(dtype=jnp.float64)._replace(p=p0, v=v0, R=Rwb_i)
    ns_gt = imu.NavState.identity(dtype=jnp.float64)._replace(p=p1, v=v1, R=R1)

    # Landmarks in front of the current camera.
    m = 150
    pts_c = jax.random.uniform(ks[3], (m, 3), minval=-2.0, maxval=2.0).at[:, 2].add(6.0)
    Rwc = R1 @ Rbc
    twc = p1 + R1 @ Pbc
    Pw = jnp.einsum("ij,oj->oi", Rwc, pts_c) + twc
    err, _ = factors.reproj_vi_residual(R1, p1, Pw, jnp.zeros((m, 2)), Rcb, pcb, CAM.fx, CAM.fy, CAM.cx, CAM.cy)
    uv = -err + 0.3 * jax.random.normal(ks[4], (m, 2))
    obs = pose.PoseObs(pts=Pw, uv=uv, inv_sigma2=jnp.ones(m), valid=jnp.ones(m, bool))

    prob = pose.VIPoseProblem(obs=obs, pre=pre, gravity=GRAVITY, Rcb=Rcb, pcb=pcb, noise=NOISE)
    return ns_kf, ns_gt, prob


class TestVIPoseOpt:
    def test_kf_variant_recovers(self):
        ns_kf, ns_gt, prob = _vi_setup(jax.random.PRNGKey(2))
        ns0 = ns_gt._replace(
            p=ns_gt.p + jnp.array([0.05, -0.03, 0.04]),
            v=ns_gt.v + jnp.array([0.1, 0.05, -0.1]),
            R=ns_gt.R @ lie.so3_exp(jnp.array([0.02, -0.01, 0.03])),
        )
        ns, inl, n_inl, marg = pose.pose_optimize_vi_kf(ns0, ns_kf, prob, CAM)
        np.testing.assert_allclose(np.asarray(ns.p), np.asarray(ns_gt.p), atol=1e-2)
        np.testing.assert_allclose(np.asarray(ns.R), np.asarray(ns_gt.R), atol=1e-2)
        np.testing.assert_allclose(np.asarray(ns.v), np.asarray(ns_gt.v), atol=5e-2)
        assert int(n_inl) > 120
        # marginal information is symmetric PSD
        m = np.asarray(marg)
        np.testing.assert_allclose(m, m.T, atol=1e-8)
        assert np.linalg.eigvalsh(m).min() > -1e-8

    def test_frame_variant_with_prior(self):
        ns_kf, ns_gt, prob = _vi_setup(jax.random.PRNGKey(3))
        # Treat the "kf" as the last frame carrying a confident prior at its
        # true state.
        prior_info = jnp.eye(15, dtype=jnp.float64) * 1e4
        ns0 = ns_gt._replace(p=ns_gt.p + 0.05, v=ns_gt.v - 0.05)
        ns, ns_last, inl, n_inl, marg = pose.pose_optimize_vi_frame(
            ns0, ns_kf, ns_kf, prior_info, prob, CAM
        )
        np.testing.assert_allclose(np.asarray(ns.p), np.asarray(ns_gt.p), atol=2e-2)
        # last frame stays near its prior
        np.testing.assert_allclose(np.asarray(ns_last.p), np.asarray(ns_kf.p), atol=2e-2)
        m = np.asarray(marg)
        np.testing.assert_allclose(m, m.T, atol=1e-6)

    def test_imu_only_prediction_consistency(self):
        """With no vision (all obs invalid), optimum stays at the IMU
        prediction (residuals already zero)."""
        ns_kf, ns_gt, prob = _vi_setup(jax.random.PRNGKey(4))
        prob = prob._replace(obs=prob.obs._replace(valid=jnp.zeros_like(prob.obs.valid)))
        ns_pred = imu.propagate_navstate(ns_kf, prob.pre, prob.gravity)
        ns, _, _, _ = pose.pose_optimize_vi_kf(ns_pred, ns_kf, prob, CAM, compute_marg=False)
        np.testing.assert_allclose(np.asarray(ns.p), np.asarray(ns_pred.p), atol=1e-9)
