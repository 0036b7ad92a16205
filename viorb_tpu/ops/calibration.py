"""Planar (Zhang) camera calibration from chessboard corner observations.

Replaces the reference's chessboard calibration utility
(`/root/reference/Examples/ROS/ORB_SLAM2/src/ros_mono_calib.cc`, which
wraps cv::calibrateCamera): given N views of a planar grid with known
board coordinates and detected image corners, estimate fx, fy, cx, cy
(+ k1, k2 radial distortion) and per-view extrinsics.

Algorithm (Zhang, TPAMI 2000 — the same closed-form-then-refine pipeline
OpenCV uses):
1. per-view homography H by normalized DLT;
2. intrinsics from the two orthonormality constraints per H on the image
   of the absolute conic B = K^-T K^-1 (solved as a 6-dim null space);
3. extrinsics per view from H and K;
4. joint nonlinear refinement of [K, k1, k2, per-view (rvec, tvec)] by
   Gauss-Newton on the reprojection residuals (jax.jacfwd — the problem is
   tiny: 4+2+6N parameters).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lie


def homography_dlt(xy_board: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """(N, 2) board coords, (N, 2) pixels -> 3x3 H with Hartley
    normalization (uv ~ H [x, y, 1])."""

    def normalizer(p):
        mu = p.mean(0)
        s = np.sqrt(2.0) / np.maximum(np.linalg.norm(p - mu, axis=1).mean(), 1e-12)
        T = np.array([[s, 0, -s * mu[0]], [0, s, -s * mu[1]], [0, 0, 1.0]])
        return T

    Tb, Tu = normalizer(xy_board), normalizer(uv)
    xb = (np.c_[xy_board, np.ones(len(xy_board))] @ Tb.T)[:, :2]
    xu = (np.c_[uv, np.ones(len(uv))] @ Tu.T)[:, :2]
    A = []
    for (x, y), (u, v) in zip(xb, xu):
        A.append([-x, -y, -1, 0, 0, 0, u * x, u * y, u])
        A.append([0, 0, 0, -x, -y, -1, v * x, v * y, v])
    _, _, Vt = np.linalg.svd(np.asarray(A))
    Hn = Vt[-1].reshape(3, 3)
    H = np.linalg.inv(Tu) @ Hn @ Tb
    return H / H[2, 2]


def _v_ij(H, i, j):
    return np.array([
        H[0, i] * H[0, j],
        H[0, i] * H[1, j] + H[1, i] * H[0, j],
        H[1, i] * H[1, j],
        H[2, i] * H[0, j] + H[0, i] * H[2, j],
        H[2, i] * H[1, j] + H[1, i] * H[2, j],
        H[2, i] * H[2, j],
    ])


def intrinsics_from_homographies(Hs: list[np.ndarray]) -> np.ndarray:
    """Closed-form K from >= 2 homographies (zero-skew extraction)."""
    V = []
    for H in Hs:
        V.append(_v_ij(H, 0, 1))
        V.append(_v_ij(H, 0, 0) - _v_ij(H, 1, 1))
    _, _, Vt = np.linalg.svd(np.asarray(V))
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12**2)
    lam = b33 - (b13**2 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12**2)))
    skew = -b12 * fx**2 * fy / lam
    cx = skew * cy / fy - b13 * fx**2 / lam
    K = np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    return K


def extrinsics_from_homography(K: np.ndarray, H: np.ndarray):
    """(R, t) of the board plane from H = K [r1 r2 t]."""
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / np.linalg.norm(Kinv @ h1)
    r1 = lam * Kinv @ h1
    r2 = lam * Kinv @ h2
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], 1)
    U, _, Vt = np.linalg.svd(R)  # project to SO(3)
    R = U @ np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))]) @ Vt
    t = lam * Kinv @ h3
    if t[2] < 0:  # board must be in front of the camera
        R = R @ np.diag([-1.0, -1.0, 1.0])
        t = -t
    return R, t


class CalibrationResult(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    k1: float
    k2: float
    rms_px: float
    Rs: np.ndarray  # (V, 3, 3) per-view board rotation
    ts: np.ndarray  # (V, 3)


def _project(params, rvecs, tvecs, board_xyz):
    """Reproject all views: params = [fx, fy, cx, cy, k1, k2]."""
    fx, fy, cx, cy, k1, k2 = params
    R = jax.vmap(lie.so3_exp)(rvecs)  # (V, 3, 3)
    Pc = jnp.einsum("vij,nj->vni", R, board_xyz) + tvecs[:, None, :]
    x = Pc[..., 0] / Pc[..., 2]
    y = Pc[..., 1] / Pc[..., 2]
    r2 = x * x + y * y
    d = 1.0 + k1 * r2 + k2 * r2 * r2
    return jnp.stack([fx * d * x + cx, fy * d * y + cy], -1)  # (V, N, 2)


def calibrate_camera(
    board_xy: np.ndarray,  # (N, 2) planar board coordinates (z = 0)
    image_uvs: np.ndarray,  # (V, N, 2) detected corners per view
    n_iters: int = 25,
) -> CalibrationResult:
    """Full Zhang pipeline; all views must observe all N corners."""
    V = len(image_uvs)
    assert V >= 3, "need >= 3 views for a stable calibration"
    Hs = [homography_dlt(board_xy, image_uvs[v]) for v in range(V)]
    K = intrinsics_from_homographies(Hs)
    Rs, ts = zip(*(extrinsics_from_homography(K, H) for H in Hs))
    rvecs = np.stack([np.asarray(lie.so3_log(jnp.asarray(R))) for R in Rs])
    tvecs = np.stack(ts)

    board_xyz = jnp.asarray(
        np.c_[board_xy, np.zeros(len(board_xy))], jnp.float64
    )
    uvs = jnp.asarray(image_uvs, jnp.float64)
    theta0 = jnp.concatenate([
        jnp.asarray(
            [K[0, 0], K[1, 1], K[0, 2], K[1, 2], 0.0, 0.0], jnp.float64
        ),
        jnp.asarray(rvecs, jnp.float64).reshape(-1),
        jnp.asarray(tvecs, jnp.float64).reshape(-1),
    ])

    def residual(theta):
        params = theta[:6]
        rv = theta[6 : 6 + 3 * V].reshape(V, 3)
        tv = theta[6 + 3 * V :].reshape(V, 3)
        return (_project(params, rv, tv, board_xyz) - uvs).reshape(-1)

    jac = jax.jit(jax.jacfwd(residual))
    res_f = jax.jit(residual)
    theta = theta0
    lam = 1e-3
    cost = float(jnp.sum(res_f(theta) ** 2))
    for _ in range(n_iters):  # Levenberg-Marquardt on the tiny dense system
        J = jac(theta)
        r = res_f(theta)
        A = J.T @ J
        g = J.T @ r
        step = jnp.linalg.solve(A + lam * jnp.diag(jnp.diag(A)), g)
        new = theta - step
        new_cost = float(jnp.sum(res_f(new) ** 2))
        if new_cost < cost:
            theta, cost, lam = new, new_cost, max(lam * 0.3, 1e-9)
        else:
            lam = min(lam * 5.0, 1e6)

    p = np.asarray(theta[:6])
    rv = np.asarray(theta[6 : 6 + 3 * V]).reshape(V, 3)
    tv = np.asarray(theta[6 + 3 * V :]).reshape(V, 3)
    rms = float(np.sqrt(cost / (V * len(board_xy) * 2)))
    Rs_out = np.stack([np.asarray(lie.so3_exp(jnp.asarray(v))) for v in rv])
    return CalibrationResult(
        fx=float(p[0]), fy=float(p[1]), cx=float(p[2]), cy=float(p[3]),
        k1=float(p[4]), k2=float(p[5]), rms_px=rms, Rs=Rs_out, ts=tv,
    )
