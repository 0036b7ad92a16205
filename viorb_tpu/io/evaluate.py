"""Trajectory evaluation: ATE RMSE with Sim3 (auto-scale) or SE3 alignment.

Equivalent of the TUM rgbd-benchmark scripts the reference's harness calls
(`evaluate_ate_autoScale*.py` / `evaluate_ate_estimatedScale*.py`,
`dataProcessingForEuRoCSingleSequence.sh:36-86`): associate by timestamp,
align with Umeyama (optionally solving scale — the auto-scale variant), and
report translational RMSE.
"""

from __future__ import annotations

import numpy as np


def umeyama(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform dst ~= s R src + t."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Greedy nearest-timestamp association (TUM associate.py semantics)."""
    ia, ib = [], []
    j = 0
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b, t))
        best, bestd = -1, max_dt
        for k in (j - 1, j):
            if 0 <= k < len(ts_b) and abs(ts_b[k] - t) <= bestd:
                best, bestd = k, abs(ts_b[k] - t)
        if best >= 0:
            ia.append(i)
            ib.append(best)
    return np.asarray(ia, int), np.asarray(ib, int)


def ate_rmse(
    ts_est: np.ndarray,
    p_est: np.ndarray,
    ts_gt: np.ndarray,
    p_gt: np.ndarray,
    with_scale: bool = True,
):
    """Absolute trajectory error RMSE after (Sim3|SE3) alignment.

    Returns (rmse, scale, aligned_estimate).
    """
    ia, ib = associate(ts_est, ts_gt)
    if len(ia) < 3:
        return float("inf"), 1.0, None
    src = p_est[ia]
    dst = p_gt[ib]
    s, R, t = umeyama(src, dst, with_scale)
    aligned = (s * (R @ src.T)).T + t
    err = aligned - dst
    return float(np.sqrt((err**2).sum(-1).mean())), s, aligned


def save_tum_trajectory(path: str, ts, Rcw_list, tcw_list):
    """Write camera trajectory in TUM format (t x y z qx qy qz qw), like
    System::SaveKeyFrameTrajectoryTUM — poses converted to camera-in-world."""
    from ..utils import lie
    import jax.numpy as jnp

    with open(path, "w") as f:
        for t, Rcw, tcw in zip(ts, Rcw_list, tcw_list):
            Rwc = np.asarray(Rcw).T
            c = -Rwc @ np.asarray(tcw)
            q = np.asarray(lie.quat_from_matrix(jnp.asarray(Rwc)))  # w x y z
            f.write(
                f"{t:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )
