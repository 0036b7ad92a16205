"""Keypoint undistortion (Frame::UndistortKeyPoints parity) and config
plumb-through (ORB YAML params -> extractor; distortion -> make_frame)."""

import numpy as np
import pytest

import jax.numpy as jnp

from viorb_tpu.ops import undistort

# EuRoC cam0 intrinsics + radtan coefficients (the reference's EuRoC.yaml)
FX, FY, CX, CY = 458.654, 457.296, 367.215, 248.375
EUROC = undistort.DistCoeffs(
    k1=-0.28340811, k2=0.07395907, p1=0.00019359, p2=1.76187114e-05
)


def test_undistort_inverts_distort():
    """undistort(distort(x)) == x to sub-1e-2 px across the image."""
    rng = np.random.default_rng(0)
    xy = np.stack(
        [rng.uniform(60, 700, 512), rng.uniform(60, 420, 512)], -1
    ).astype(np.float32)
    dist = np.asarray(
        undistort.distort_points(jnp.asarray(xy), FX, FY, CX, CY, EUROC)
    )
    und = np.asarray(
        undistort.undistort_points(jnp.asarray(dist), FX, FY, CX, CY, EUROC)
    )
    err = np.abs(und - xy).max()
    assert err < 1e-2, err


def test_undistort_recovers_projective_geometry():
    """Distorted projections of a plane stop being a homography of the
    plane; undistorted ones are again (recovers geometry end-to-end)."""
    rng = np.random.default_rng(1)
    # points on a 3D plane, projected through a pinhole = exact homography
    uv_plane = np.stack(
        [rng.uniform(100, 650, 128), rng.uniform(100, 380, 128)], -1
    )
    X = np.concatenate(
        [(uv_plane - [CX, CY]) / [FX, FY] * 2.0, np.full((128, 1), 2.0)], -1
    )
    R = np.eye(3)
    t = np.array([0.15, -0.05, 0.3])
    Pc = X @ R.T + t
    ideal = np.stack(
        [FX * Pc[:, 0] / Pc[:, 2] + CX, FY * Pc[:, 1] / Pc[:, 2] + CY], -1
    )
    dist = np.asarray(
        undistort.distort_points(jnp.asarray(ideal, jnp.float32), FX, FY, CX, CY, EUROC)
    )
    und = np.asarray(
        undistort.undistort_points(jnp.asarray(dist), FX, FY, CX, CY, EUROC)
    )
    assert np.abs(und - ideal).max() < 2e-2


def test_undistorted_bounds_barrel():
    """Barrel distortion (k1<0) pushes the undistorted corners OUTSIDE the
    raw image rectangle (Frame::ComputeImageBounds semantics)."""
    x_min, x_max, y_min, y_max = undistort.undistorted_bounds(
        752, 480, FX, FY, CX, CY, EUROC
    )
    assert x_min < 0 and y_min < 0
    assert x_max > 752 and y_max > 480
    # zero coefficients -> exact image rectangle
    b0 = undistort.undistorted_bounds(752, 480, FX, FY, CX, CY, undistort.DistCoeffs())
    assert b0 == (0.0, 752.0, 0.0, 480.0)


def test_config_plumbs_orb_and_distortion(tmp_path):
    """ORBextractor.* and Camera.k1..p2 YAML keys reach the built system
    (round-trip: VERDICT round-1 gap — config.py parsed then ignored)."""
    yaml_text = """%YAML:1.0
Camera.fx: 458.654
Camera.fy: 457.296
Camera.cx: 367.215
Camera.cy: 248.375
Camera.k1: -0.28340811
Camera.k2: 0.07395907
Camera.p1: 0.00019359
Camera.p2: 0.0000176187114
Camera.width: 752
Camera.height: 480
Camera.fps: 20.0
ORBextractor.nFeatures: 600
ORBextractor.scaleFactor: 1.25
ORBextractor.nLevels: 6
ORBextractor.iniThFAST: 25
ORBextractor.minThFAST: 5
runningMode: 0
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    from viorb_tpu import config as cfg_mod

    cfg = cfg_mod.config_from_yaml(str(p))
    sys_ = cfg_mod.build_system(cfg, sensor="monocular")
    op = sys_.orb_params
    assert op.n_features == 600
    assert op.n_levels == 6
    assert op.scale == pytest.approx(1.25)
    assert op.ini_th == 25.0 and op.min_th == 5.0
    assert sys_.dist.k1 == pytest.approx(-0.28340811)
    assert not sys_.dist.is_zero
    # undistorted bounds extend beyond the raw rectangle
    assert sys_.bounds[0] < 0 and sys_.bounds[1] > 752

    # make_frame applies undistortion: xy_und differs from raw xy at the
    # image periphery (and matches the reference model's prediction)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.normal(128, 40, (480, 752)).astype(np.float32))
    frame = sys_.make_frame(img)
    xy = np.asarray(frame.feats.xy)
    und = np.asarray(frame.xy_und)
    valid = np.asarray(frame.feats.valid)
    assert valid.any()
    d = np.linalg.norm(und[valid] - xy[valid], axis=-1)
    assert d.max() > 1.0  # periphery moves by many px under k1=-0.28
    expect = np.asarray(
        undistort.undistort_points(
            jnp.asarray(xy[valid]), cfg.camera.fx, cfg.camera.fy,
            cfg.camera.cx, cfg.camera.cy, sys_.dist,
        )
    )
    assert np.abs(expect - und[valid]).max() < 1e-3
