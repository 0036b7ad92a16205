"""Headless AR demo layer: plane detection + virtual object overlay.

The reference ships an AR demo (`Examples/ROS/ORB_VIO/src/AR/ViewerAR.{h,cc}`,
`ros_mono_ar.cc`) that RANSAC-fits a dominant plane to the tracked map points
and renders a virtual cube / grid on it with Pangolin, following the live
camera pose. This module provides the same capability headlessly:

- ``detect_plane``: the reference's 3-point plane RANSAC
  (`ViewerAR.cc:392-491`) re-designed TPU-style — all ``iterations``
  hypotheses are scored in ONE batched evaluation (sample triples -> SVD
  plane fit per hypothesis via ``vmap`` -> an (iters, N) distance matrix ->
  per-hypothesis 20th-percentile score), instead of the reference's
  sequential loop. Same scoring: score = sorted distance at
  ``max(0.2N, 20)``; inliers at ``dist < 1.4 * best``; requires >=50
  candidate points with >5 observations.
- ``Plane.recompute``: total least-squares refit over the inliers with the
  normal oriented away from the first camera (so the plane-frame -y drawing
  normal faces it, `ViewerAR.cc:549-556`) and a plane->world transform
  ``Tpw = R(up x n) * R_y(rang)`` about the centroid (`ViewerAR.cc:516-591`).
- ``cube_segments`` / ``grid_segments``: the wireframe geometry of
  `DrawCube` (cube of half-size s resting on the plane, `ViewerAR.cc:336-343`)
  and `DrawPlane` (2*ndivs x 2*ndivs grid, `ViewerAR.cc:353-382`).
- ``ARFrameDrawer``: projects the geometry through the current pose and
  rasterizes the segments onto the camera image (numpy, host-side), with the
  reference's status-text semantics (`ViewerAR.cc:288-308`).

Device work (RANSAC scoring) is jitted; rasterization is host-side numpy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .utils.lie import so3_exp


# ----------------------------------------------------------------------------
# Batched plane RANSAC (ViewerAR::DetectPlane, ViewerAR.cc:392-491)
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("iterations",))
def _ransac_plane(pts: jnp.ndarray, valid: jnp.ndarray, key, iterations: int):
    """Score every 3-point plane hypothesis at once.

    pts: (N, 3) candidate points (padded); valid: (N,) mask.
    Returns (best_dists (N,), best_score) where best_dists are the
    point-plane distances under the best hypothesis.
    """
    n = pts.shape[0]
    nvalid = jnp.sum(valid)
    # sample (iterations, 3) indices over the valid prefix-agnostic set:
    # draw uniformly over [0, nvalid) positions of the valid entries.
    order = jnp.argsort(~valid)  # valid entries first, stable
    u = jax.random.uniform(key, (iterations, 3))
    idx = jnp.minimum((u * nvalid).astype(jnp.int32), jnp.maximum(nvalid - 1, 0))
    triples = pts[order[idx]]  # (iters, 3, 3)

    def fit(tri):
        # plane through 3 points: smallest right-singular vector of [X|1]
        A = jnp.concatenate([tri, jnp.ones((3, 1), tri.dtype)], axis=1)
        _, _, vt = jnp.linalg.svd(A, full_matrices=True)
        return vt[3]  # (a, b, c, d)

    planes = jax.vmap(fit)(triples)  # (iters, 4)
    normals = planes[:, :3]
    f = 1.0 / jnp.maximum(jnp.linalg.norm(normals, axis=1), 1e-12)
    # (iters, N) absolute distances, one matmul on the MXU
    dists = jnp.abs(planes[:, :3] @ pts.T + planes[:, 3:4]) * f[:, None]
    big = jnp.asarray(1e9, dists.dtype)
    dists = jnp.where(valid[None, :], dists, big)
    # score = sorted distance at rank max(0.2*N, 20) (ViewerAR.cc:478-479)
    nth = jnp.maximum((0.2 * nvalid).astype(jnp.int32), 20)
    nth = jnp.minimum(nth, jnp.maximum(nvalid - 1, 0))
    sorted_d = jnp.sort(dists, axis=1)
    scores = jnp.take_along_axis(sorted_d, jnp.full((iterations, 1), nth), axis=1)[:, 0]
    best = jnp.argmin(scores)
    return dists[best], scores[best]


@dataclass
class Plane:
    """Detected plane: inlier points + plane->world transform (ViewerAR.h Plane)."""

    points: np.ndarray          # (M, 3) inlier world points
    Tcw: np.ndarray             # (4, 4) camera pose at detection time
    rang: float                 # random yaw about the plane normal
    o: np.ndarray = field(default=None)    # plane origin (centroid)
    n: np.ndarray = field(default=None)    # unit normal (away from camera)
    Tpw: np.ndarray = field(default=None)  # (4, 4) plane-to-world
    _XC: np.ndarray = field(default=None, repr=False)

    def recompute(self, points: np.ndarray | None = None) -> None:
        """TLS refit over all (possibly updated) inlier points
        (Plane::Recompute, ViewerAR.cc:516-591)."""
        if points is not None:
            self.points = points
        X = np.asarray(self.points, np.float64)
        A = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        _, _, vt = np.linalg.svd(A, full_matrices=True)
        a, b, c, _ = vt[3]
        o = X.mean(axis=0)
        f = 1.0 / max(np.sqrt(a * a + b * b + c * c), 1e-12)
        if self._XC is None:
            Rcw, tcw = self.Tcw[:3, :3], self.Tcw[:3, 3]
            Oc = -Rcw.T @ tcw
            self._XC = Oc - o
        if self._XC @ np.array([a, b, c]) > 0:  # orient so XC.n <= 0
            a, b, c = -a, -b, -c
        n = np.array([a, b, c]) * f
        up = np.array([0.0, 1.0, 0.0])
        v = np.cross(up, n)
        sa, ca = np.linalg.norm(v), up @ n
        ang = np.arctan2(sa, ca)
        axis = v * ang / sa if sa > 1e-12 else np.zeros(3)
        Rpw = np.asarray(so3_exp(jnp.asarray(axis))) @ np.asarray(
            so3_exp(jnp.asarray(up * self.rang)))
        Tpw = np.eye(4)
        Tpw[:3, :3], Tpw[:3, 3] = Rpw, o
        self.o, self.n, self.Tpw = o, n, Tpw


def detect_plane(
    points_w: np.ndarray,
    n_obs: np.ndarray,
    Tcw: np.ndarray,
    iterations: int = 50,
    seed: int = 0,
) -> Plane | None:
    """RANSAC-fit the dominant plane to well-observed map points.

    Mirrors `ViewerAR::DetectPlane` (ViewerAR.cc:392-491): candidates are map
    points with >5 observations, >=50 required; returns None if none found.
    """
    points_w = np.asarray(points_w, np.float32)
    cand = np.asarray(n_obs) > 5
    N = int(cand.sum())
    if N < 50:
        return None
    pts = points_w[cand]
    pad = int(2 ** np.ceil(np.log2(max(len(pts), 64))))
    pts_p = np.zeros((pad, 3), np.float32)
    pts_p[: len(pts)] = pts
    valid = np.zeros(pad, bool)
    valid[: len(pts)] = True
    dists, score = _ransac_plane(
        jnp.asarray(pts_p), jnp.asarray(valid), jax.random.PRNGKey(seed), iterations)
    dists = np.asarray(dists)[: len(pts)]
    inliers = dists < 1.4 * float(score)
    if inliers.sum() < 3:
        return None
    rng = np.random.default_rng(seed)
    plane = Plane(points=pts[inliers], Tcw=np.asarray(Tcw, np.float64),
                  rang=float(-np.pi / 2 + rng.random() * np.pi))
    plane.recompute()
    return plane


# ----------------------------------------------------------------------------
# Wireframe geometry (DrawCube / DrawPlane, ViewerAR.cc:336-382)
# ----------------------------------------------------------------------------


def cube_segments(size: float, Tpw: np.ndarray) -> np.ndarray:
    """12 edges of a cube of half-size ``size`` resting on the plane.

    The reference translates by (0, -size, 0) in plane coords and draws a
    cube spanning [-size, size]^3 (ViewerAR.cc:336-343); plane normal is -y.
    """
    s = size
    c = np.array([[sx, sy - s, sz] for sx in (-s, s) for sy in (-s, s) for sz in (-s, s)])
    edges = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
             (0, 4), (1, 5), (2, 6), (3, 7)]
    seg = np.array([[c[i], c[j]] for i, j in edges])  # (12, 2, 3)
    return _to_world(seg, Tpw)


def grid_segments(ndivs: int, ndivsize: float, Tpw: np.ndarray) -> np.ndarray:
    """(2*ndivs+1) x 2 grid lines on the plane (DrawPlane, ViewerAR.cc:353-382)."""
    lo, hi = -ndivs * ndivsize, ndivs * ndivsize
    seg = []
    for k in range(2 * ndivs + 1):
        x = lo + ndivsize * k
        seg.append([[x, 0.0, lo], [x, 0.0, hi]])
        seg.append([[lo, 0.0, x], [hi, 0.0, x]])
    return _to_world(np.asarray(seg), Tpw)


def _to_world(seg: np.ndarray, Tpw: np.ndarray) -> np.ndarray:
    R, t = Tpw[:3, :3], Tpw[:3, 3]
    return seg @ R.T + t


# ----------------------------------------------------------------------------
# Projection + rasterization (host-side)
# ----------------------------------------------------------------------------


def project_segments(seg_w: np.ndarray, Rcw, tcw, fx, fy, cx, cy):
    """World segments (S, 2, 3) -> pixel segments (S, 2, 2) + front-of-camera mask."""
    Pc = seg_w @ np.asarray(Rcw).T + np.asarray(tcw)
    z = np.maximum(Pc[..., 2], 1e-6)
    uv = np.stack([fx * Pc[..., 0] / z + cx, fy * Pc[..., 1] / z + cy], axis=-1)
    vis = np.all(Pc[..., 2] > 0.05, axis=-1)
    return uv, vis


def draw_segments(img: np.ndarray, seg_px: np.ndarray, vis: np.ndarray, color) -> None:
    """Rasterize line segments into an (H, W, 3) uint8 image in place."""
    h, w = img.shape[:2]
    color = np.asarray(color, np.uint8)
    for (p0, p1), ok in zip(seg_px, vis):
        if not ok:
            continue
        n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]))) + 1
        n = min(n, 4 * max(h, w))
        ts = np.linspace(0.0, 1.0, n)
        xs = np.round(p0[0] + ts * (p1[0] - p0[0])).astype(int)
        ys = np.round(p0[1] + ts * (p1[1] - p0[1])).astype(int)
        ok2 = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
        img[ys[ok2], xs[ok2]] = color


STATUS_TEXT = {  # ViewerAR.cc:288-308
    "not_initialized": "SLAM NOT INITIALIZED",
    "ok": "SLAM ON",
    "lost": "SLAM LOST",
    "no_plane": "PLACE A CUBE: TRANSLATE THE CAMERA",
}


@dataclass
class ARFrameDrawer:
    """Per-frame AR compositor (the ViewerAR render loop, ViewerAR.cc:100-286).

    Feed tracked poses + map points each frame; it detects a plane once
    enough well-observed points exist, keeps it, and overlays cube + grid.
    Call ``invalidate()`` after a loop closure / global BA to refit the plane
    to the (moved) inlier points, as the reference does on big-map-change
    (ViewerAR.cc:187-209).
    """

    fx: float
    fy: float
    cx: float
    cy: float
    cube_size: float = 0.05
    ngrid: int = 3
    grid_size: float = 0.05
    ransac_iterations: int = 50
    plane: Plane | None = None
    _needs_recompute: bool = False

    def invalidate(self) -> None:
        self._needs_recompute = True

    def update(self, img_gray: np.ndarray, status: str, Rcw, tcw,
               points_w=None, n_obs=None) -> tuple[np.ndarray, str]:
        """Returns (RGB overlay image, status text)."""
        img = np.repeat(np.asarray(img_gray, np.uint8)[..., None], 3, axis=-1)
        if status != "ok":
            return img, STATUS_TEXT.get(status, status)
        if self.plane is None and points_w is not None and n_obs is not None:
            Tcw = np.eye(4)
            Tcw[:3, :3], Tcw[:3, 3] = Rcw, tcw
            self.plane = detect_plane(points_w, n_obs, Tcw, self.ransac_iterations)
        if self.plane is None:
            return img, STATUS_TEXT["no_plane"]
        if self._needs_recompute:
            self.plane.recompute()
            self._needs_recompute = False
        grid = grid_segments(self.ngrid, self.grid_size, self.plane.Tpw)
        cube = cube_segments(self.cube_size, self.plane.Tpw)
        for seg, color in ((grid, (180, 180, 255)), (cube, (255, 60, 60))):
            uv, vis = project_segments(seg, Rcw, tcw, self.fx, self.fy, self.cx, self.cy)
            draw_segments(img, uv, vis, color)
        return img, STATUS_TEXT["ok"]
