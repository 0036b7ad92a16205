"""Visual-inertial local BA on a synthetic trajectory with exact IMU."""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.io import synthetic
from viorb_tpu.ops import imu
from viorb_tpu.solver import ba
from viorb_tpu.utils import lie

CAM = ba.Camera(fx=458.0, fy=457.0, cx=367.0, cy=248.0)
NOISE = imu.ImuNoise.from_sigmas(**imu.EUROC_NOISE, dtype=jnp.float64)
GRAV = jnp.asarray(synthetic.GRAVITY_W)


def test_synthetic_imu_is_exact():
    """The generator's IMU samples must preintegrate back to the GT states."""
    traj = synthetic.circle_trajectory(duration=2.0)
    n = traj.gyro.shape[0]
    dts = jnp.full((n,), 1.0 / 200.0, jnp.float64)
    pre = imu.preintegrate(
        jnp.asarray(traj.gyro), jnp.asarray(traj.acc), dts, jnp.zeros(3), jnp.zeros(3), NOISE
    )
    ns0 = imu.NavState.identity(dtype=jnp.float64)._replace(
        p=jnp.asarray(traj.p[0]), v=jnp.asarray(traj.v[0]), R=jnp.asarray(traj.Rwb[0])
    )
    ns1 = imu.propagate_navstate(ns0, pre, GRAV)
    np.testing.assert_allclose(np.asarray(ns1.p), traj.p[-1], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ns1.v), traj.v[-1], atol=1e-8)
    np.testing.assert_allclose(np.asarray(ns1.R), traj.Rwb[-1], atol=1e-8)


def build_vi_problem(n_kf=8, kf_stride=40, noise_px=0.3, seed=0):
    """Keyframes every kf_stride IMU samples; landmarks from the cloud."""
    rng = np.random.default_rng(seed)
    traj = synthetic.circle_trajectory(duration=(n_kf * kf_stride + 1) / 200.0)
    ext = synthetic.euroc_like_extrinsics()
    cloud = synthetic.landmark_cloud(rng, n=400)

    kf_samples = np.arange(n_kf) * kf_stride
    nav = imu.NavState(
        p=jnp.asarray(traj.p[kf_samples]),
        v=jnp.asarray(traj.v[kf_samples]),
        R=jnp.asarray(traj.Rwb[kf_samples]),
        bg=jnp.zeros((n_kf, 3)), ba=jnp.zeros((n_kf, 3)),
        dbg=jnp.zeros((n_kf, 3)), dba=jnp.zeros((n_kf, 3)),
    )

    # IMU chain between consecutive KFs.
    E = n_kf - 1
    seg = kf_stride
    gyro = np.stack([traj.gyro[kf_samples[i]:kf_samples[i] + seg] for i in range(E)])
    acc = np.stack([traj.acc[kf_samples[i]:kf_samples[i] + seg] for i in range(E)])
    dts = np.full((E, seg), 1.0 / 200.0)
    pre = imu.batch_preintegrate(
        jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts), jnp.zeros(3), jnp.zeros(3), NOISE
    )
    chain = ba.ImuChain(
        i_idx=jnp.arange(E), j_idx=jnp.arange(1, E + 1), pre=pre, valid=jnp.ones(E, bool)
    )

    # Observations: project the cloud from every KF.
    cams, lms, uvs = [], [], []
    obs_count = np.zeros(len(cloud), int)
    for i in range(n_kf):
        fo = synthetic.project_frame(
            traj.p[kf_samples[i]], traj.Rwb[kf_samples[i]], cloud, ext,
            noise_px=noise_px, rng=rng,
        )
        cams.append(np.full(len(fo.lm_idx), i))
        lms.append(fo.lm_idx)
        uvs.append(fo.uv)
        obs_count[fo.lm_idx] += 1
    cam_idx = np.concatenate(cams)
    lm_raw = np.concatenate(lms)
    uv = np.concatenate(uvs)
    # keep landmarks with >= 2 observations; compact the index space
    keep = obs_count >= 2
    remap = -np.ones(len(cloud), int)
    remap[keep] = np.arange(keep.sum())
    sel = keep[lm_raw]
    cam_idx, lm_idx, uv = cam_idx[sel], remap[lm_raw[sel]], uv[sel]
    points = cloud[keep]

    obs = ba.BAObservations(
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        lm_idx=jnp.asarray(lm_idx, jnp.int32),
        uv=jnp.asarray(uv),
        inv_sigma2=jnp.ones(len(uv)),
        valid=jnp.ones(len(uv), bool),
    )
    state = ba.VIBAState(nav=nav, points=jnp.asarray(points))
    Rcb = jnp.asarray(ext.Rbc.T)
    pcb = jnp.asarray(-ext.Rbc.T @ ext.pbc)
    return state, obs, chain, Rcb, pcb


def test_vi_ba_converges():
    gt, obs, chain, Rcb, pcb = build_vi_problem()
    K = gt.nav.p.shape[0]
    rng = np.random.default_rng(1)

    # Perturb all but the first KF (fixed boundary, like the reference's
    # pKFPrevLocal) and all points.
    pert_p = jnp.asarray(rng.normal(0, 0.05, (K, 3))).at[0].set(0.0)
    pert_v = jnp.asarray(rng.normal(0, 0.1, (K, 3))).at[0].set(0.0)
    pert_phi = jnp.asarray(rng.normal(0, 0.02, (K, 3))).at[0].set(0.0)
    nav0 = gt.nav._replace(
        p=gt.nav.p + pert_p,
        v=gt.nav.v + pert_v,
        R=jax.vmap(lambda R, ph: R @ lie.so3_exp(ph))(gt.nav.R, pert_phi),
    )
    pts0 = gt.points + jnp.asarray(rng.normal(0, 0.05, gt.points.shape))
    init = ba.VIBAState(nav=nav0, points=pts0)
    fixed = jnp.arange(K) == 0

    out, obs2 = ba.bundle_adjust_vi(
        init, obs, chain, CAM, Rcb, pcb, GRAV, NOISE, fixed
    )
    p_err0 = float(jnp.abs(nav0.p - gt.nav.p).max())
    p_err = float(jnp.abs(out.nav.p - gt.nav.p).max())
    v_err = float(jnp.abs(out.nav.v - gt.nav.v).max())
    assert p_err < 0.02, (p_err0, p_err)
    assert v_err < 0.06
    # biases stay near zero (they were zero in the sim)
    assert float(jnp.abs(out.nav.bg + out.nav.dbg).max()) < 5e-3
    assert float(jnp.abs(out.nav.ba + out.nav.dba).max()) < 5e-2


def test_vi_ba_fixed_kf_unchanged():
    gt, obs, chain, Rcb, pcb = build_vi_problem(n_kf=5)
    K = gt.nav.p.shape[0]
    init = ba.VIBAState(
        nav=gt.nav._replace(p=gt.nav.p + 0.03), points=gt.points + 0.02
    )
    fixed = jnp.arange(K) == 0
    out, _ = ba.bundle_adjust_vi(init, obs, chain, CAM, Rcb, pcb, GRAV, NOISE, fixed)
    np.testing.assert_allclose(np.asarray(out.nav.p[0]), np.asarray(init.nav.p[0]), atol=1e-12)
