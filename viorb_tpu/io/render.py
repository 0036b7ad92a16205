"""Synthetic image renderer: textured planes by ray casting.

Closes the last gap between the feature-level tests (`FeatureSim`) and the
reference's end-to-end validation on EuRoC bags: this renders *images* of a
known 3D scene along the analytic trajectory from `io/synthetic.py`, so the
real ORB front-end (`ops/orb.py`) runs inside the SLAM loop and the
estimated trajectory can be scored against ground truth (ATE), exactly how
the reference validates itself (SURVEY.md section 4; the reference's
Examples/* drivers + evaluate_ate_scale.py).

Scene model: a box room of six textured planes; the camera orbits inside
looking outward (matching `synthetic.circle_trajectory` +
`euroc_like_extrinsics`). Textures are random mosaics (piecewise-constant
cells, lightly blurred): dense FAST corners at every cell boundary, with
stable rBRIEF descriptors under the viewpoint/scale changes of the orbit.

Pure numpy on the host — rendering is dataset *generation*, kept off the
device so benchmarks time only the SLAM system.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Plane(NamedTuple):
    p0: np.ndarray  # (3,) a point on the plane (its texture origin)
    e1: np.ndarray  # (3,) in-plane unit axis 1
    e2: np.ndarray  # (3,) in-plane unit axis 2
    half1: float  # half-extent along e1 (m)
    half2: float  # half-extent along e2 (m)
    tex: np.ndarray  # (Ht, Wt) float32 texture, sampled bilinearly
    px_per_m: float  # texture resolution


class Scene(NamedTuple):
    planes: tuple[Plane, ...]


def _mosaic_texture(rng: np.random.Generator, size_m: float, px_per_m: float,
                    cell_m: float = 0.22, lo: float = 40.0, hi: float = 215.0):
    """Random piecewise-constant mosaic, blurred one texel: corner-rich and
    descriptor-stable (high contrast, no repeating pattern to alias)."""
    n_px = int(size_m * px_per_m)
    n_cells = max(2, int(np.ceil(size_m / cell_m)))
    cells = rng.uniform(lo, hi, (n_cells, n_cells)).astype(np.float32)
    # upsample nearest then box-blur 3x3 to soften cell edges ~1 texel
    idx = (np.arange(n_px) * n_cells // n_px).astype(np.int32)
    img = cells[np.ix_(idx, idx)]
    k = np.array([0.25, 0.5, 0.25], np.float32)
    img = np.apply_along_axis(lambda r: np.convolve(r, k, mode="same"), 1, img)
    img = np.apply_along_axis(lambda c: np.convolve(c, k, mode="same"), 0, img)
    return img.astype(np.float32)


def box_room(rng: np.random.Generator, half_xy: float = 9.0, z_lo: float = -2.5,
             z_hi: float = 4.0, px_per_m: float = 64.0) -> Scene:
    """Six textured planes forming a closed room around the origin."""
    zc = 0.5 * (z_lo + z_hi)
    zh = 0.5 * (z_hi - z_lo)
    h = half_xy
    ex, ey, ez = np.eye(3)

    def wall(p0, e1, e2, h1, h2):
        size = 2.0 * max(h1, h2)
        tex = _mosaic_texture(rng, size, px_per_m)
        return Plane(np.asarray(p0, np.float64), e1.astype(np.float64),
                     e2.astype(np.float64), h1, h2, tex, px_per_m)

    return Scene(planes=(
        wall([h, 0, zc], ey, ez, h, zh),    # +x wall
        wall([-h, 0, zc], ey, ez, h, zh),   # -x wall
        wall([0, h, zc], ex, ez, h, zh),    # +y wall
        wall([0, -h, zc], ex, ez, h, zh),   # -y wall
        wall([0, 0, z_lo], ex, ey, h, h),   # floor
        wall([0, 0, z_hi], ex, ey, h, h),   # ceiling
    ))


class RenderCam(NamedTuple):
    fx: float = 458.0
    fy: float = 457.0
    cx: float = 367.0
    cy: float = 248.0
    width: int = 752
    height: int = 480


def _pixel_dirs(cam: RenderCam) -> np.ndarray:
    u, v = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
    d = np.stack([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy,
                  np.ones_like(u, np.float64)], axis=-1)
    return d.reshape(-1, 3)  # (H*W, 3) camera-frame ray directions


def distorted_pixel_dirs(cam: RenderCam, dist) -> np.ndarray:
    """Ray directions for a radtan-distorted camera: pixel (u, v) is the
    DISTORTED projection, so its ray is the undistorted normalized
    coordinate (ops/undistort.undistort_points inverts the model). Pass the
    result as `dirs` to render_frames_jax to render images that exercise
    the keypoint-undistortion path end-to-end (Frame.cc:748)."""
    from ..ops import undistort as und

    import jax.numpy as jnp

    u, v = np.meshgrid(np.arange(cam.width), np.arange(cam.height))
    xy = np.stack([u.ravel(), v.ravel()], axis=-1).astype(np.float32)
    xy_u = np.asarray(und.undistort_points(
        jnp.asarray(xy), cam.fx, cam.fy, cam.cx, cam.cy, dist
    ))
    d = np.stack(
        [(xy_u[:, 0] - cam.cx) / cam.fx, (xy_u[:, 1] - cam.cy) / cam.fy,
         np.ones(len(xy_u))], axis=-1,
    )
    return d  # (H*W, 3)


def render(scene: Scene, Rwc: np.ndarray, twc: np.ndarray, cam: RenderCam,
           _dirs_cache: dict = {}) -> np.ndarray:
    """Render one grayscale frame (H, W) float32 from camera pose (world
    from camera). Nearest-hit compositing over the scene's planes with
    bilinear texture sampling."""
    key = (cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height)
    dirs_c = _dirs_cache.get(key)
    if dirs_c is None:
        dirs_c = _dirs_cache[key] = _pixel_dirs(cam)
    d = dirs_c @ Rwc.T  # (P, 3) world-frame ray dirs
    C = np.asarray(twc, np.float64)

    best_t = np.full(d.shape[0], np.inf)
    out = np.full(d.shape[0], 96.0, np.float32)  # background gray
    for pl in scene.planes:
        n = np.cross(pl.e1, pl.e2)
        denom = d @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((pl.p0 - C) @ n) / denom
        hit = (np.abs(denom) > 1e-9) & (t > 0.05) & (t < best_t)
        if not hit.any():
            continue
        P = C + t[hit, None] * d[hit]
        rel = P - pl.p0
        a = rel @ pl.e1
        b = rel @ pl.e2
        inb = (np.abs(a) <= pl.half1) & (np.abs(b) <= pl.half2)
        if not inb.any():
            continue
        sel = np.nonzero(hit)[0][inb]
        # bilinear sample
        Ht, Wt = pl.tex.shape
        x = (a[inb] + pl.half1) * pl.px_per_m
        y = (b[inb] + pl.half2) * pl.px_per_m
        x = np.clip(x, 0.0, Wt - 1.001)
        y = np.clip(y, 0.0, Ht - 1.001)
        x0 = x.astype(np.int32)
        y0 = y.astype(np.int32)
        fx_ = (x - x0).astype(np.float32)
        fy_ = (y - y0).astype(np.float32)
        t00 = pl.tex[y0, x0]
        t01 = pl.tex[y0, x0 + 1]
        t10 = pl.tex[y0 + 1, x0]
        t11 = pl.tex[y0 + 1, x0 + 1]
        val = (t00 * (1 - fx_) * (1 - fy_) + t01 * fx_ * (1 - fy_)
               + t10 * (1 - fx_) * fy_ + t11 * fx_ * fy_)
        out[sel] = val
        best_t[hit] = np.where(inb, t[hit], best_t[hit])
    return out.reshape(cam.height, cam.width)


def _stack_scene(scene: Scene):
    """Stack the scene's planes into arrays for the jitted renderer.
    Requires all textures the same shape (true for `box_room`)."""
    import jax.numpy as jnp

    pls = scene.planes
    shapes = {p.tex.shape for p in pls}
    assert len(shapes) == 1, "stacked renderer needs uniform texture sizes"
    return dict(
        p0=jnp.asarray(np.stack([p.p0 for p in pls]), jnp.float32),
        e1=jnp.asarray(np.stack([p.e1 for p in pls]), jnp.float32),
        e2=jnp.asarray(np.stack([p.e2 for p in pls]), jnp.float32),
        n=jnp.asarray(
            np.stack([np.cross(p.e1, p.e2) for p in pls]), jnp.float32
        ),
        half1=jnp.asarray(np.array([p.half1 for p in pls]), jnp.float32),
        half2=jnp.asarray(np.array([p.half2 for p in pls]), jnp.float32),
        tex=jnp.asarray(np.stack([p.tex for p in pls])),
        ppm=jnp.asarray(np.array([p.px_per_m for p in pls]), jnp.float32),
    )


def render_frames_jax(scene: Scene, Rwc_batch: np.ndarray,
                      twc_batch: np.ndarray, cam: RenderCam,
                      dirs: np.ndarray | None = None):
    """Jitted batch renderer: (B,3,3), (B,3) poses -> (B,H,W) float32 on the
    default device. Same math as `render` (nearest-hit plane compositing +
    bilinear texture sampling), one fused XLA program scanned over frames —
    keeps 500-frame dataset generation off the benchmark's critical path."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    S = _stack_scene(scene)
    dirs_c = jnp.asarray(
        _pixel_dirs(cam) if dirs is None else dirs, jnp.float32
    )  # (P, 3)
    Ht, Wt = scene.planes[0].tex.shape

    def one(carry, pose):
        Rwc, twc = pose
        d = dirs_c @ Rwc.T  # (P, 3)
        denom = d @ S["n"].T  # (P, K)
        num = jnp.einsum("kd,kd->k", S["p0"] - twc[None, :], S["n"])  # (K,)
        t = num[None, :] / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        rel = twc[None, None, :] + t[:, :, None] * d[:, None, :] - S["p0"]
        a = jnp.einsum("pkd,kd->pk", rel, S["e1"])
        b = jnp.einsum("pkd,kd->pk", rel, S["e2"])
        ok = ((jnp.abs(denom) > 1e-9) & (t > 0.05)
              & (jnp.abs(a) <= S["half1"]) & (jnp.abs(b) <= S["half2"]))
        t_m = jnp.where(ok, t, jnp.inf)
        k_best = jnp.argmin(t_m, axis=1)  # (P,)
        hit = jnp.isfinite(jnp.min(t_m, axis=1))
        pk = jnp.arange(a.shape[0])
        ab = a[pk, k_best]
        bb = b[pk, k_best]
        x = jnp.clip((ab + S["half1"][k_best]) * S["ppm"][k_best], 0.0, Wt - 1.001)
        y = jnp.clip((bb + S["half2"][k_best]) * S["ppm"][k_best], 0.0, Ht - 1.001)
        x0 = x.astype(jnp.int32)
        y0 = y.astype(jnp.int32)
        fx_ = x - x0
        fy_ = y - y0
        tex = S["tex"]
        t00 = tex[k_best, y0, x0]
        t01 = tex[k_best, y0, x0 + 1]
        t10 = tex[k_best, y0 + 1, x0]
        t11 = tex[k_best, y0 + 1, x0 + 1]
        val = (t00 * (1 - fx_) * (1 - fy_) + t01 * fx_ * (1 - fy_)
               + t10 * (1 - fx_) * fy_ + t11 * fx_ * fy_)
        img = jnp.where(hit, val, 96.0).reshape(cam.height, cam.width)
        return carry, img

    _, imgs = lax.scan(
        one, 0,
        (jnp.asarray(Rwc_batch, jnp.float32), jnp.asarray(twc_batch, jnp.float32)),
    )
    return imgs


def camera_poses(traj, ext, frame_stride: int, n_frames: int):
    """World-from-camera poses + timestamps for every rendered frame."""
    ks = np.arange(n_frames) * frame_stride
    Rwc = traj.Rwb[ks] @ ext.Rbc
    twc = traj.p[ks] + traj.Rwb[ks] @ ext.pbc
    return ks, traj.t[ks], Rwc, twc


def render_sequence(scene: Scene, traj, ext, cam: RenderCam,
                    frame_stride: int, n_frames: int):
    """Render frames along a `synthetic.Trajectory` at
    `imu_rate/frame_stride` fps through the camera extrinsics.

    Yields (frame_index_in_traj, timestamp, image)."""
    for f in range(n_frames):
        k = f * frame_stride
        Rwc = traj.Rwb[k] @ ext.Rbc
        twc = traj.p[k] + traj.Rwb[k] @ ext.pbc
        yield k, float(traj.t[k]), render(scene, Rwc, twc, cam)
