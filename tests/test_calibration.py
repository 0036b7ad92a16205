"""Zhang planar calibration (ops/calibration.py — the ros_mono_calib.cc
chessboard calibration equivalent)."""

import numpy as np
import pytest

from viorb_tpu.ops import calibration as cal


def synth_views(n_views=12, k1=-0.12, k2=0.05, noise=0.15, seed=0):
    rng = np.random.default_rng(seed)
    fx, fy, cx, cy = 460.0, 455.0, 370.0, 245.0
    gx, gy = 9, 6
    board = np.stack(np.meshgrid(np.arange(gx), np.arange(gy)), -1)
    board = board.reshape(-1, 2).astype(np.float64) * 0.04  # 4 cm squares

    uvs = []
    for v in range(n_views):
        # strong tilts decorrelate focal length from radial distortion
        rv = rng.normal(0, 0.45, 3)
        th = np.linalg.norm(rv)
        K_ = np.array([[0, -rv[2], rv[1]], [rv[2], 0, -rv[0]], [-rv[1], rv[0], 0]])
        R = np.eye(3) + np.sinc(th / np.pi) * K_ + \
            ((1 - np.cos(th)) / max(th**2, 1e-12)) * (K_ @ K_)
        t = np.array([-0.12, -0.08, 0.6]) + rng.normal(0, 0.05, 3)
        Pc = np.c_[board, np.zeros(len(board))] @ R.T + t
        x, y = Pc[:, 0] / Pc[:, 2], Pc[:, 1] / Pc[:, 2]
        r2 = x * x + y * y
        d = 1 + k1 * r2 + k2 * r2 * r2
        uv = np.stack([fx * d * x + cx, fy * d * y + cy], -1)
        uvs.append(uv + rng.normal(0, noise, uv.shape))
    return board, np.stack(uvs), (fx, fy, cx, cy, k1, k2)


def test_homography_dlt_exact():
    rng = np.random.default_rng(1)
    H = np.array([[400.0, 12.0, 320.0], [-8.0, 410.0, 240.0], [0.02, -0.01, 1.0]])
    xy = rng.uniform(0, 0.3, (30, 2))
    p = np.c_[xy, np.ones(30)] @ H.T
    uv = p[:, :2] / p[:, 2:]
    He = cal.homography_dlt(xy, uv)
    np.testing.assert_allclose(He, H / H[2, 2], rtol=1e-6, atol=1e-6)


def test_calibrate_recovers_intrinsics_and_distortion():
    board, uvs, truth = synth_views()
    res = cal.calibrate_camera(board, uvs)
    fx, fy, cx, cy, k1, k2 = truth
    assert res.fx == pytest.approx(fx, rel=0.01)
    assert res.fy == pytest.approx(fy, rel=0.01)
    assert res.cx == pytest.approx(cx, abs=4.0)
    assert res.cy == pytest.approx(cy, abs=4.0)
    assert res.k1 == pytest.approx(k1, abs=0.02)
    assert res.k2 == pytest.approx(k2, abs=0.05)
    assert res.rms_px < 0.3  # ~ the injected corner noise
    # extrinsics: boards in front of the camera
    assert (res.ts[:, 2] > 0).all()


def test_calibrate_noise_free_is_nearly_exact():
    board, uvs, truth = synth_views(noise=0.0, seed=3)
    res = cal.calibrate_camera(board, uvs)
    assert res.rms_px < 1e-3
    assert res.fx == pytest.approx(truth[0], rel=1e-4)
    assert res.k1 == pytest.approx(truth[4], abs=1e-3)
