"""AR demo layer: plane RANSAC, plane frame, wireframe overlay.

Mirrors the reference AR demo behavior
(`Examples/ROS/ORB_VIO/src/AR/ViewerAR.cc:392-491` plane RANSAC,
`:516-591` Recompute, `:336-382` cube/grid geometry).
"""

import numpy as np

from viorb_tpu import ar


def _plane_cloud(rng, n=200, n_out=40, normal=(0.0, 0.0, 1.0), d=2.0, noise=0.002):
    normal = np.asarray(normal) / np.linalg.norm(normal)
    # basis on the plane
    a = np.array([1.0, 0.0, 0.0])
    if abs(normal @ a) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    u = np.cross(normal, a); u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    xy = rng.uniform(-1, 1, (n, 2))
    pts = xy[:, :1] * u + xy[:, 1:] * v + d * normal
    pts += rng.normal(0, noise, pts.shape)
    out = rng.uniform(-1.5, 1.5, (n_out, 3)) + d * normal + normal * rng.uniform(0.3, 1.0, (n_out, 1))
    return np.concatenate([pts, out]), n


def test_detect_plane_finds_dominant_plane():
    rng = np.random.default_rng(3)
    pts, n_in = _plane_cloud(rng)
    n_obs = np.full(len(pts), 8)
    Tcw = np.eye(4)  # camera at origin looking +z toward the plane
    plane = ar.detect_plane(pts, n_obs, Tcw, iterations=100, seed=1)
    assert plane is not None
    # normal should match the true plane normal (z), oriented away from the
    # camera (ViewerAR.cc:549-556 flips so XC.n <= 0; the -y drawing normal
    # then faces the camera). Camera at z=0, plane at z=2 -> n_z > 0.
    assert abs(abs(plane.n[2]) - 1.0) < 0.02
    assert plane.n[2] > 0
    # origin lies on the plane
    assert abs(plane.o[2] - 2.0) < 0.05
    # the adaptive threshold (1.4x the 20th-percentile distance,
    # ViewerAR.cc:478-491) keeps a core set of true plane points only
    assert len(plane.points) >= 50
    d = np.abs(plane.points @ plane.n + (-plane.n @ plane.o))
    assert np.max(d) < 0.01  # every inlier is a true plane point


def test_detect_plane_requires_candidates():
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (100, 3))
    # too few well-observed points (>5 obs needed, >=50 required)
    n_obs = np.full(100, 2)
    assert ar.detect_plane(pts, n_obs, np.eye(4)) is None
    n_obs = np.full(100, 8)
    n_obs[40:] = 1  # only 40 candidates
    assert ar.detect_plane(pts, n_obs, np.eye(4)) is None


def test_plane_frame_orthonormal_and_on_plane():
    rng = np.random.default_rng(5)
    pts, _ = _plane_cloud(rng, normal=(0.2, -0.9, 0.4), d=1.5)
    plane = ar.detect_plane(pts, np.full(len(pts), 9), np.eye(4), iterations=80)
    assert plane is not None
    R = plane.Tpw[:3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-8)
    assert np.isclose(np.linalg.det(R), 1.0)
    # the plane frame's +y axis is the (anti-)normal: grid at y=0 lies on the plane
    y_axis = R[:, 1]
    assert abs(abs(y_axis @ plane.n) - 1.0) < 1e-6


def test_cube_and_grid_geometry():
    Tpw = np.eye(4)
    cube = ar.cube_segments(0.1, Tpw)
    assert cube.shape == (12, 2, 3)
    # cube rests on the plane: y in [-0.2, 0] (normal is -y, ViewerAR.cc:336-343)
    assert cube[..., 1].max() <= 1e-12 and cube[..., 1].min() >= -0.2 - 1e-12
    grid = ar.grid_segments(3, 0.05, Tpw)
    assert grid.shape == (2 * (2 * 3 + 1), 2, 3)
    assert np.allclose(grid[..., 1], 0.0)  # grid lies in the plane


def test_ar_frame_drawer_overlays_cube():
    rng = np.random.default_rng(7)
    pts, _ = _plane_cloud(rng, n=300, d=2.0)
    n_obs = np.full(len(pts), 10)
    H, W = 120, 160
    fx = fy = 120.0; cx, cy = W / 2, H / 2
    drawer = ar.ARFrameDrawer(fx, fy, cx, cy, cube_size=0.2, grid_size=0.2)
    img = np.full((H, W), 50, np.uint8)

    out, txt = drawer.update(img, "not_initialized", np.eye(3), np.zeros(3))
    assert txt == "SLAM NOT INITIALIZED" and (out[..., 0] == 50).all()

    out, txt = drawer.update(img, "ok", np.eye(3), np.zeros(3), pts, n_obs)
    assert txt == "SLAM ON"
    assert drawer.plane is not None
    # overlay actually drew colored pixels
    assert (out[..., 0] != out[..., 1]).any() or (out[..., 1] != out[..., 2]).any()

    # loop-closure invalidation refits without error (ViewerAR.cc:187-209)
    drawer.invalidate()
    out2, _ = drawer.update(img, "ok", np.eye(3), np.zeros(3), pts, n_obs)
    assert out2.shape == (H, W, 3)
