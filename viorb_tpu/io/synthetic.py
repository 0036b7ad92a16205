"""Synthetic visual-inertial world generator for tests and benchmarks.

The reference repo has no unit tests and validates end-to-end on EuRoC bags
(SURVEY.md section 4). Those datasets are not available in this environment,
so this module provides an analytic substitute: a smooth 6-DoF trajectory
with exact IMU measurements (ZOH, same discretization as the preintegrator)
and pinhole landmark observations through the camera-IMU extrinsics —
enough to exercise tracking, VIO initialization (scale/gravity/bias/Rbc are
all observable), local mapping, BA, and loop closing with known ground
truth.

World frame: z-up, gravity (0, 0, -9.81). Body trajectory: circle of radius
r in the xy-plane with sinusoidal z, yaw following the track. Camera:
EuRoC-like mounting (optical axis ~ body +x, i.e. looking outward).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

GRAVITY_W = np.array([0.0, 0.0, -9.810])


class Extrinsics(NamedTuple):
    Rbc: np.ndarray  # (3,3) body-from-camera rotation
    pbc: np.ndarray  # (3,) body-from-camera translation


def euroc_like_extrinsics() -> Extrinsics:
    """A non-trivial camera mounting (round numbers, not copied from EuRoC):
    camera z (optical axis) -> body x, camera x -> body -y, camera y -> body -z,
    with a few-cm lever arm."""
    Rbc = np.array(
        [
            [0.0, 0.0, 1.0],
            [-1.0, 0.0, 0.0],
            [0.0, -1.0, 0.0],
        ]
    )
    pbc = np.array([0.03, -0.05, 0.02])
    return Extrinsics(Rbc=Rbc, pbc=pbc)


def _so3_exp(phi):
    th = np.linalg.norm(phi)
    K = np.array([[0, -phi[2], phi[1]], [phi[2], 0, -phi[0]], [-phi[1], phi[0], 0]])
    if th < 1e-12:
        return np.eye(3) + K
    return np.eye(3) + np.sin(th) / th * K + (1 - np.cos(th)) / th**2 * (K @ K)


def _so3_log(R):
    cos = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(cos)
    if th < 1e-9:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2
    return th / (2 * np.sin(th)) * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])


class Trajectory(NamedTuple):
    """Ground-truth body states sampled at IMU rate."""

    t: np.ndarray  # (N,)
    p: np.ndarray  # (N, 3)
    v: np.ndarray  # (N, 3)
    Rwb: np.ndarray  # (N, 3, 3)
    gyro: np.ndarray  # (N-1, 3) body rates over [k, k+1)
    acc: np.ndarray  # (N-1, 3) specific force measured over [k, k+1)


def circle_trajectory(
    duration: float = 20.0,
    imu_rate: float = 200.0,
    radius: float = 3.0,
    omega: float = 0.5,
    z_amp: float = 0.4,
    z_freq: float = 0.7,
    pitch_amp: float = 0.1,
    pitch_freq: float = 0.9,
    roll_amp: float = 0.0,
    roll_freq: float = 1.3,
    yaw_amp: float = 0.0,
    yaw_freq: float = 1.7,
) -> Trajectory:
    """Analytic circle-with-bobbing trajectory; yaw tracks the tangent,
    optionally with a sinusoidal wobble (yaw_amp > 0).

    yaw_amp matters for camera-IMU extrinsic calibration fixtures: on a
    constant-rate orbit the angular velocity is constant, so the pcb
    lever arm contributes a CONSTANT body-frame centripetal term —
    indistinguishable from an accel-bias/gravity combination — and the
    scale/gravity/pcb least-squares' phi = (Rc_i - Rc_j) columns
    annihilate the pcb component along the (fixed) rotation axis. Yaw-rate
    modulation restores observability the way EuRoC's hand-carried motion
    does for the reference (LocalMapping.cc:578-706).

    IMU samples are *exact* for the ZOH integrator: gyro over [tk, tk+1) is
    the constant body rate mapping R_k to R_{k+1} (log of relative rotation
    / dt), and accel is the body-frame specific force built from the
    discrete velocity difference, so preintegrating the samples reproduces
    the (p, v, R) sequence to machine precision. This decouples solver tests
    from discretization error.
    """
    n = int(duration * imu_rate)
    dt = 1.0 / imu_rate
    t = np.arange(n + 1) * dt
    th = omega * t

    p = np.stack(
        [radius * np.cos(th), radius * np.sin(th), z_amp * np.sin(z_freq * t)], axis=-1
    )
    # Body yaw follows the track; add slight pitch oscillation for richness.
    yaw = th + np.pi / 2 + yaw_amp * np.sin(yaw_freq * t)
    pitch = pitch_amp * np.sin(pitch_freq * t)
    roll = roll_amp * np.sin(roll_freq * t)
    Rwb = np.zeros((n + 1, 3, 3))
    for k in range(n + 1):
        cz, sz = np.cos(yaw[k]), np.sin(yaw[k])
        cy, sy = np.cos(pitch[k]), np.sin(pitch[k])
        cx, sx = np.cos(roll[k]), np.sin(roll[k])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Rwb[k] = Rz @ Ry @ Rx

    # Discrete-consistent velocity and IMU samples (ZOH semantics):
    #   p_{k+1} = p_k + v_k dt + 0.5 a_k dt^2 ; v_{k+1} = v_k + a_k dt
    #   => choose v_0 from the analytic derivative, then propagate.
    v = np.zeros((n + 1, 3))
    v[0] = np.array([-radius * omega * np.sin(0), radius * omega * np.cos(0), z_amp * z_freq])
    gyro = np.zeros((n, 3))
    acc = np.zeros((n, 3))
    for k in range(n):
        a_w = 2.0 * (p[k + 1] - p[k] - v[k] * dt) / dt**2
        v[k + 1] = v[k] + a_w * dt
        gyro[k] = _so3_log(Rwb[k].T @ Rwb[k + 1]) / dt
        acc[k] = Rwb[k].T @ (a_w - GRAVITY_W)
    return Trajectory(t=t, p=p, v=v, Rwb=Rwb, gyro=gyro, acc=acc)


def add_imu_noise(traj: Trajectory, rng: np.random.Generator, sigma_g=1.7e-4, sigma_a=2e-3,
                  bg=np.zeros(3), ba=np.zeros(3), rate=200.0) -> Trajectory:
    """Additive white noise (discrete sigma/sqrt(dt)) + constant biases."""
    sd_g = sigma_g * np.sqrt(rate)
    sd_a = sigma_a * np.sqrt(rate)
    gyro = traj.gyro + bg + sd_g * rng.standard_normal(traj.gyro.shape)
    acc = traj.acc + ba + sd_a * rng.standard_normal(traj.acc.shape)
    return traj._replace(gyro=gyro, acc=acc)


def landmark_cloud(rng: np.random.Generator, n: int = 800, radius_lo=4.5, radius_hi=9.0,
                   z_lo=-2.0, z_hi=3.0) -> np.ndarray:
    """Points on a cylindrical shell around the circle trajectory (visible
    to an outward-looking camera)."""
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = rng.uniform(radius_lo, radius_hi, n)
    z = rng.uniform(z_lo, z_hi, n)
    return np.stack([rad * np.cos(ang), rad * np.sin(ang), z], axis=-1)


class FrameObs(NamedTuple):
    """Observations of landmarks in one camera frame."""

    lm_idx: np.ndarray  # (M,) indices into the cloud
    uv: np.ndarray  # (M, 2)


def project_frame(
    p_wb: np.ndarray,
    Rwb: np.ndarray,
    points: np.ndarray,
    ext: Extrinsics,
    fx=458.0, fy=457.0, cx=367.0, cy=248.0,
    width=752, height=480,
    min_depth=0.3, max_depth=25.0,
    noise_px=0.0,
    rng: np.random.Generator | None = None,
) -> FrameObs:
    """Project the cloud into a frame; returns visible observations."""
    Rwc = Rwb @ ext.Rbc
    twc = p_wb + Rwb @ ext.pbc
    Pc = (points - twc) @ Rwc  # (N, 3) camera coords
    z = Pc[:, 2]
    u = fx * Pc[:, 0] / np.where(z > 0, z, 1.0) + cx
    v = fy * Pc[:, 1] / np.where(z > 0, z, 1.0) + cy
    vis = (z > min_depth) & (z < max_depth) & (u >= 5) & (u < width - 5) & (v >= 5) & (v < height - 5)
    idx = np.nonzero(vis)[0]
    uv = np.stack([u[idx], v[idx]], axis=-1)
    if noise_px > 0 and rng is not None:
        uv = uv + noise_px * rng.standard_normal(uv.shape)
    return FrameObs(lm_idx=idx, uv=uv)
