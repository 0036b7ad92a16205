"""VIO initialization chain on the analytic trajectory: gyro bias, scale,
gravity, accel bias, velocities, and the online Rbc/pbc estimation."""

import jax.numpy as jnp
import numpy as np

from viorb_tpu.io import synthetic
from viorb_tpu.ops import imu as imu_ops
from viorb_tpu.pipeline import vio_init
from viorb_tpu.utils import lie

BG_TRUE = np.array([0.004, -0.002, 0.003])
BA_TRUE = np.array([-0.03, 0.02, 0.05])
S_TRUE = 2.7  # vision positions = metric / S_TRUE


def make_init_problem(duration=12.0, kf_dt=0.5, noisy=False, bg=BG_TRUE, ba=BA_TRUE,
                      rich_rotation=False):
    rng = np.random.default_rng(1)
    # online extrinsic calibration needs rotation about >=2 axes to separate
    # Rcb misalignment from gyro bias (the reference converges on EuRoC's
    # aggressive MAV motion; a flat yaw-only circle is degenerate)
    kw = dict(pitch_amp=0.35, roll_amp=0.35) if rich_rotation else {}
    traj = synthetic.circle_trajectory(duration=duration, imu_rate=200.0, **kw)
    traj = synthetic.add_imu_noise(
        traj, rng, sigma_g=1.7e-4 if noisy else 0.0, sigma_a=2e-3 if noisy else 0.0,
        bg=bg, ba=ba,
    )
    ext = synthetic.euroc_like_extrinsics()
    Rbc, pbc = ext.Rbc, ext.pbc
    Rcb = Rbc.T
    pcb = -Rcb @ pbc

    stride = int(kf_dt * 200)
    idx = np.arange(0, len(traj.t), stride)
    N = len(idx)

    # vision keyframe poses: camera-in-world at arbitrary scale
    Rwc = np.einsum("nij,jk->nik", traj.Rwb[idx], Rbc)
    pwc_metric = traj.p[idx] + np.einsum("nij,j->ni", traj.Rwb[idx], pbc)
    pwc = pwc_metric / S_TRUE

    # per-interval preintegrations (entry 0 zero)
    M = stride
    gyro = np.zeros((N, M, 3))
    acc = np.zeros((N, M, 3))
    dts = np.zeros((N, M))
    for j in range(1, N):
        s0, s1 = idx[j - 1], idx[j]
        gyro[j] = traj.gyro[s0:s1]
        acc[j] = traj.acc[s0:s1]
        dts[j] = np.diff(traj.t[s0 : s1 + 1])
    noise = imu_ops.ImuNoise.from_sigmas(**imu_ops.EUROC_NOISE)
    pre = imu_ops.batch_preintegrate(
        jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts),
        jnp.zeros(3), jnp.zeros(3), noise,
    )
    kf_ts = traj.t[idx]
    return traj, idx, kf_ts, jnp.asarray(Rwc), jnp.asarray(pwc), pre, Rcb, pcb, (gyro, acc, dts, noise)


def repreintegrate(raw, bg, ba):
    gyro, acc, dts, noise = raw
    return imu_ops.batch_preintegrate(
        jnp.asarray(gyro), jnp.asarray(acc), jnp.asarray(dts),
        jnp.asarray(bg), jnp.asarray(ba), noise,
    )


def test_gyro_bias_estimation():
    traj, idx, ts, Rwc, pwc, pre, Rcb, pcb, raw = make_init_problem()
    bg = vio_init.estimate_gyro_bias(Rwc, pre, jnp.asarray(Rcb))
    np.testing.assert_allclose(np.asarray(bg), BG_TRUE, atol=2e-4)


def test_scale_gravity_ba_chain():
    traj, idx, ts, Rwc, pwc, pre, Rcb, pcb, raw = make_init_problem()
    bg = vio_init.estimate_gyro_bias(Rwc, pre, jnp.asarray(Rcb))
    pre = repreintegrate(raw, bg, np.zeros(3))

    s_star, gw_star = vio_init.estimate_scale_gravity(pwc, Rwc, pre, jnp.asarray(Rcb), jnp.asarray(pcb))
    assert abs(float(s_star) - S_TRUE) / S_TRUE < 0.05, float(s_star)
    # gravity direction within a few degrees, magnitude near 9.81
    gw = np.asarray(gw_star)
    assert abs(np.linalg.norm(gw) - 9.81) < 0.5, gw

    s, gw_ref, ba = vio_init.refine_scale_gravity_ba(
        pwc, Rwc, pre, jnp.asarray(Rcb), jnp.asarray(pcb), gw_star
    )
    assert abs(float(s) - S_TRUE) / S_TRUE < 0.02, float(s)
    np.testing.assert_allclose(np.asarray(ba), BA_TRUE, atol=0.02)
    cos = np.dot(np.asarray(gw_ref), synthetic.GRAVITY_W) / (
        np.linalg.norm(gw_ref) * 9.81
    )
    assert cos > 0.999, np.asarray(gw_ref)

    # velocities
    ns = vio_init.navstates_from_vision(
        pwc, Rwc, pre, s, gw_ref, jnp.asarray(Rcb), jnp.asarray(pcb), bg, ba
    )
    v_err = np.linalg.norm(np.asarray(ns.v) - traj.v[idx], axis=-1)
    assert np.median(v_err) < 0.05, np.median(v_err)
    p_err = np.linalg.norm(np.asarray(ns.p) - traj.p[idx], axis=-1)
    assert np.max(p_err) < 0.02, np.max(p_err)


def test_online_extrinsic_estimation():
    traj, idx, ts, Rwc, pwc, pre, Rcb, pcb, raw = make_init_problem(rich_rotation=True)
    # reference iteration (each keyframe insertion re-runs the chain with
    # the last estimates, LocalMapping.cc:425-530): rough Rcb, gyro bias
    # with it, re-preintegrate, re-estimate Rcb with exp weights — repeat
    q = vio_init.estimate_rcb(Rwc, pre)
    bg_total = np.zeros(3)
    pre2 = pre
    for _ in range(6):
        dbg = np.asarray(vio_init.estimate_gyro_bias(Rwc, pre2, lie.quat_to_matrix(q)))
        bg_total = bg_total + dbg
        pre2 = repreintegrate(raw, bg_total, np.zeros(3))
        q = vio_init.estimate_rcb(Rwc, pre2, q_prev=q)
    Rcb_est = np.asarray(lie.quat_to_matrix(q))
    err_deg = np.degrees(
        np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(Rcb_est @ Rcb.T)))))
    assert err_deg < 0.1, err_deg
    np.testing.assert_allclose(bg_total, BG_TRUE, atol=5e-4)

    s_star, gw_star, pcb_star = vio_init.estimate_scale_gravity_pcb(
        pwc, Rwc, pre2, jnp.asarray(Rcb_est)
    )
    assert abs(float(s_star) - S_TRUE) / S_TRUE < 0.1, float(s_star)

    s, dtheta, ba, pcb_ref, gw_ref = vio_init.refine_with_pcb(
        pwc, Rwc, pre2, jnp.asarray(Rcb_est), gw_star
    )
    assert abs(float(s) - S_TRUE) / S_TRUE < 0.03, float(s)
    np.testing.assert_allclose(np.asarray(ba), BA_TRUE, atol=0.03)
    np.testing.assert_allclose(np.asarray(pcb_ref), pcb, atol=0.02)


def test_convergence_monitor():
    mon = vio_init.ConvergenceMonitor(threshold=0.1, window_s=10.0, min_samples=10)
    for i in range(9):
        mon.push(i, np.array([1.0, 2.0, 3.0]))
    assert not mon.converged(9.0)  # too few samples
    for i in range(9, 15):
        mon.push(i, np.array([1.0, 2.0, 3.0]) + 0.01 * np.sin(i))
    assert mon.converged(14.0)
    mon2 = vio_init.ConvergenceMonitor(threshold=0.1)
    for i in range(20):
        mon2.push(i, np.array([np.sin(i), 2.0, 3.0]))
    assert not mon2.converged(19.0)
