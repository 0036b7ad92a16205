"""Stereo feature matching + depth recovery (rectified pairs) and RGB-D
depth lookup.

Replaces `Frame::ComputeStereoMatches` and `Frame::ComputeStereoFromRGBD`
(`/root/reference/src/Frame.cc`): the reference builds per-row candidate
lists and loops left keypoints, matching by descriptor then refining by an
11x11 SAD slide at the keypoint's octave. Here:

- candidate gating is one dense mask on the (N_l, N_r) Hamming matrix
  (row band |v_l - v_r| <= 2 sigma, octave +/-1, disparity window) —
  the same semantics without the row-bucket data structure;
- the sub-pixel SAD slide is batched: one (N, 11, 11+2W) right-strip
  gather + a stack of shifted differences, then the reference's parabola
  fit; performed on the level-0 images (design difference: the reference
  slides on the octave image — equivalent up to the octave's pixel size);
- the median-SAD outlier cut keeps the reference's 1.5 * 1.4 * median rule.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import matching
from .orb import OrbFeatures

TH_ORB = (matching.TH_LOW + matching.TH_HIGH) / 2  # thOrbDist (Frame.cc)


class StereoDepth(NamedTuple):
    u_right: jax.Array  # (N,) matched right u (-1 if none)
    depth: jax.Array  # (N,) metric depth (-1 if none)
    valid: jax.Array  # (N,) bool


def _gather_patch(img, cy, cx, h, w):
    """(h, w) patch centered at (cy, cx) with border clamping."""
    H, W = img.shape
    y0 = jnp.clip(cy - h // 2, 0, H - h)
    x0 = jnp.clip(cx - w // 2, 0, W - w)
    return jax.lax.dynamic_slice(img, (y0, x0), (h, w))


def match_stereo(
    feats_l: OrbFeatures,
    feats_r: OrbFeatures,
    img_l: jax.Array,  # (H, W) float level-0 left image
    img_r: jax.Array,
    bf: float,
    min_z: float,
    scale_factor: float = 1.2,
    sad_w: int = 5,
    sad_slide: int = 5,
) -> StereoDepth:
    """Per-left-feature right match + depth. min_z sets the max disparity
    (reference: minD=0, maxD=mbf/minZ with minZ=mb, Frame.cc)."""
    N = feats_l.xy.shape[0]
    max_disp = bf / min_z

    # 1. descriptor matching with epipolar-band + disparity gating
    dist = matching.hamming_matrix(feats_l.desc_pm1, feats_r.desc_pm1)
    dv = jnp.abs(feats_l.xy[:, 1:2] - feats_r.xy[None, :, 1])
    band = 2.0 * scale_factor ** feats_r.octave.astype(img_l.dtype)
    disp = feats_l.xy[:, 0:1] - feats_r.xy[None, :, 0]
    d_oct = jnp.abs(feats_l.octave[:, None] - feats_r.octave[None, :])
    allowed = (
        (dv <= band[None, :])
        & (disp >= -1.0)
        & (disp <= max_disp)
        & (d_oct <= 1)
        & feats_l.valid[:, None]
        & feats_r.valid[None, :]
    )
    res = matching.best_match(dist, allowed, max_dist=TH_ORB)

    # 2. batched sub-pixel SAD refinement around the matched right u
    w, L = sad_w, sad_slide
    P = 2 * w + 1
    ul = feats_l.xy[:, 0]
    vl = feats_l.xy[:, 1]
    ur0 = feats_r.xy[jnp.clip(res.idx, 0), 0]

    cyl = jnp.round(vl).astype(jnp.int32)
    cxl = jnp.round(ul).astype(jnp.int32)
    cxr = jnp.round(ur0).astype(jnp.int32)

    patch_l = jax.vmap(lambda cy, cx: _gather_patch(img_l, cy, cx, P, P))(cyl, cxl)
    strip_r = jax.vmap(
        lambda cy, cx: _gather_patch(img_r, cy, cx, P, P + 2 * L)
    )(cyl, cxr)
    # center-normalize (the reference subtracts the window center value)
    patch_l = patch_l - patch_l[:, w : w + 1, w : w + 1]
    sads = []
    for dx in range(2 * L + 1):
        win = jax.lax.dynamic_slice_in_dim(strip_r, dx, P, axis=2)
        win = win - win[:, w : w + 1, w : w + 1]
        sads.append(jnp.sum(jnp.abs(patch_l - win), axis=(1, 2)))
    sad = jnp.stack(sads, -1)  # (N, 2L+1)
    best = jnp.argmin(sad, -1)
    best_in = (best > 0) & (best < 2 * L)
    bi = jnp.clip(best, 1, 2 * L - 1)
    rows = jnp.arange(N)
    s0 = sad[rows, bi]
    sm = sad[rows, bi - 1]
    sp = sad[rows, bi + 1]
    denom = jnp.maximum(sm + sp - 2 * s0, 1e-6)
    delta = (sm - sp) / (2.0 * denom)
    sub_ok = best_in & (jnp.abs(delta) <= 1.0)
    u_right = ur0 + (bi.astype(ul.dtype) - L) + jnp.where(sub_ok, delta, 0.0)

    disparity = ul - u_right
    ok = (
        res.valid
        & sub_ok
        & (disparity > 0.01)
        & (disparity <= max_disp)
    )

    # 3. median-SAD outlier cut (Frame.cc: 1.5 * 1.4 * median)
    best_sad = s0
    med = jnp.median(jnp.where(ok, best_sad, jnp.nan))
    med = jnp.nan_to_num(med, nan=jnp.inf)
    ok = ok & (best_sad <= 1.5 * 1.4 * med)

    depth = jnp.where(ok, bf / jnp.maximum(disparity, 1e-6), -1.0)
    return StereoDepth(
        u_right=jnp.where(ok, u_right, -1.0),
        depth=depth,
        valid=ok,
    )


def depth_from_rgbd(
    feats: OrbFeatures,
    depth_map: jax.Array,  # (H, W) metric depth, <=0 invalid
    bf: float,
) -> StereoDepth:
    """Frame::ComputeStereoFromRGBD: depth lookup at the (distorted)
    keypoint location + virtual right coordinate u_r = u - bf/d."""
    H, W = depth_map.shape
    x = jnp.clip(jnp.round(feats.xy[:, 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(feats.xy[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_map[y, x]
    ok = feats.valid & (d > 0)
    return StereoDepth(
        u_right=jnp.where(ok, feats.xy[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0),
        depth=jnp.where(ok, d, -1.0),
        valid=ok,
    )
