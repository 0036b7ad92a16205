"""Per-frame tracking kernels: motion-model tracking, local-map tracking,
frustum culling, keyframe policy.

Array re-design of the reference `Tracking` thread's per-frame work
(`/root/reference/src/Tracking.cc:978-1553`): each stage is one jitted
fixed-shape program over the map tables; the host state machine lives in
pipeline/system.py.

- `track_motion_model`  <- Tracking::TrackWithMotionModel (Tracking.cc:1984)
- `track_local_map`     <- TrackLocalMap + SearchLocalPoints + isInFrustum
  (Tracking.cc:2054,2315-2365; Frame::isInFrustum, Frame.cc)
- `need_new_keyframe`   <- simplified NeedNewKeyFrame (Tracking.cc:2101)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..map import arrays as ma
from ..ops import matching
from ..ops.orb import OrbFeatures
from ..solver import pose as pose_opt
from ..solver.ba import Camera
from ..utils import lie


class FrameData(NamedTuple):
    """One frame's extracted features (undistorted coords for geometry).

    Stereo / RGB-D frames additionally carry per-feature right-image u
    coordinates and depths (the reference's mvuRight / mvDepth,
    Frame::ComputeStereoMatches / ComputeStereoFromRGBD); -1 where the
    feature has no depth."""

    feats: OrbFeatures
    xy_und: jax.Array  # (N, 2)
    u_right: jax.Array | None = None  # (N,), -1 if none
    depth: jax.Array | None = None  # (N,), -1 if none


class TrackOutput(NamedTuple):
    Rcw: jax.Array
    tcw: jax.Array
    assoc: jax.Array  # (N,) landmark id per feature (-1 none)
    n_inliers: jax.Array  # () int32


def predict_octave(dist, dist_max, scale=1.2, n_levels=8):
    """MapPoint::PredictScale — expected pyramid level from distance."""
    ratio = jnp.maximum(dist_max / jnp.maximum(dist, 1e-6), 1e-6)
    lvl = jnp.ceil(jnp.log(ratio) / jnp.log(scale)).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


def track_motion_model(
    m: ma.MapArrays,
    frame: FrameData,
    Rcw_last: jax.Array,
    tcw_last: jax.Array,
    assoc_last: jax.Array,  # (N,) last frame's landmark associations
    R_vel: jax.Array,
    t_vel: jax.Array,
    cam: Camera,
    th: float = 15.0,
) -> TrackOutput:
    """Project last frame's landmarks at the velocity-predicted pose, match
    in a window, optimize the pose (4x10 with gating)."""
    Rp, tp = lie.se3_mul(R_vel, t_vel, Rcw_last, tcw_last)

    lm_id = assoc_last
    has = lm_id >= 0
    P = m.lms.pos[jnp.clip(lm_id, 0)]  # (N, 3)
    Pc = jnp.einsum("ij,nj->ni", Rp, P) + tp
    z = Pc[:, 2]
    uv = jnp.stack(
        [cam.fx * Pc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx,
         cam.fy * Pc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy], -1
    )
    q_valid = has & (z > 0) & m.lms.valid[jnp.clip(lm_id, 0)]

    # per-query radius scales with the octave of the last observation
    oct_last = predict_octave(
        jnp.linalg.norm(P - (-jnp.einsum("ji,j->i", Rcw_last, tcw_last))[None], axis=-1),
        m.lms.dist_max[jnp.clip(lm_id, 0)],
    )
    radius = th * 1.2 ** oct_last.astype(uv.dtype)

    res = matching.search_by_projection(
        m.lms.pm1[jnp.clip(lm_id, 0)],
        frame.feats.desc_pm1,
        uv,
        frame.xy_und,
        radius,
        q_valid,
        frame.feats.valid,
        oct_query=oct_last,
        oct_frame=frame.feats.octave,
        oct_lo=-1,
        oct_hi=1,
        max_dist=matching.TH_HIGH,
        ratio=0.9,
    )
    res = matching.mutual_filter(res, frame.xy_und.shape[0])

    # scatter matches into a per-feature assoc row
    N = frame.xy_und.shape[0]
    assoc = jnp.full((N,), -1, jnp.int32)
    feat_idx = jnp.where(res.valid, res.idx, N - 1)
    assoc = assoc.at[feat_idx].set(jnp.where(res.valid, lm_id, assoc[feat_idx]))

    return _optimize_and_gate(m, frame, Rp, tp, assoc, cam)


def _optimize_and_gate(m, frame, Rp, tp, assoc, cam) -> TrackOutput:
    """Pose-optimize against associated landmarks; clear outlier assocs."""
    has = assoc >= 0
    obs = pose_opt.PoseObs(
        pts=m.lms.pos[jnp.clip(assoc, 0)],
        uv=frame.xy_und,
        inv_sigma2=1.0 / frame.feats.sigma2,
        valid=has & frame.feats.valid & m.lms.valid[jnp.clip(assoc, 0)],
        u_right=frame.u_right,
        has_right=None if frame.u_right is None else frame.u_right >= 0,
    )
    Rcw, tcw, inl, n_inl = pose_opt.pose_optimize_vision(Rp, tp, obs, cam)
    assoc = jnp.where(inl, assoc, -1)
    return TrackOutput(Rcw=Rcw, tcw=tcw, assoc=assoc, n_inliers=n_inl)


def frustum_gate(
    m: ma.MapArrays,
    Rcw: jax.Array,
    tcw: jax.Array,
    cam: Camera,
    width: float,
    height: float,
):
    """(L,) visibility + (L, 2) projections + (L,) predicted octave.

    Frame::isInFrustum: positive depth, in-image, distance within
    [0.8 dmin, 1.2 dmax], viewing angle < 60 deg from the mean normal.
    """
    P = m.lms.pos
    Pc = P @ Rcw.T + tcw
    z = Pc[:, 2]
    uv = jnp.stack(
        [cam.fx * Pc[:, 0] / jnp.maximum(z, 1e-6) + cam.cx,
         cam.fy * Pc[:, 1] / jnp.maximum(z, 1e-6) + cam.cy], -1
    )
    center = -Rcw.T @ tcw
    d = P - center[None]
    dist = jnp.linalg.norm(d, axis=-1)
    view_cos = jnp.sum(d * m.lms.normal, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = (
        m.lms.valid
        & (z > 0.05)
        & (uv[:, 0] >= 0) & (uv[:, 0] < width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < height)
        & (dist >= 0.8 * m.lms.dist_min) & (dist <= 1.2 * m.lms.dist_max)
        & (view_cos > 0.5)
    )
    octave = predict_octave(dist, m.lms.dist_max)
    return ok, uv, octave, view_cos


def track_local_map(
    m: ma.MapArrays,
    frame: FrameData,
    Rcw: jax.Array,
    tcw: jax.Array,
    assoc: jax.Array,
    cam: Camera,
    width: float,
    height: float,
    th: float = 1.0,
) -> tuple[TrackOutput, ma.MapArrays]:
    """Match frustum-visible map points into remaining features and
    re-optimize. Also updates landmark visible/found statistics."""
    vis, uv_pred, octave, view_cos = frustum_gate(m, Rcw, tcw, cam, width, height)
    # exclude already-matched landmarks and features
    L = m.lms.pos.shape[0]
    already = jnp.zeros((L,), bool).at[jnp.clip(assoc, 0)].set(assoc >= 0)
    query_valid = vis & ~already
    feat_free = frame.feats.valid & (assoc < 0)

    radius = jnp.where(view_cos > 0.998, 2.5, 4.0) * th * 1.2 ** octave.astype(uv_pred.dtype)
    res = matching.search_by_projection(
        m.lms.pm1,
        frame.feats.desc_pm1,
        uv_pred,
        frame.xy_und,
        radius,
        query_valid,
        feat_free,
        oct_query=octave,
        oct_frame=frame.feats.octave,
        oct_lo=-1,
        oct_hi=0,
        max_dist=matching.TH_HIGH,
        ratio=0.8,
    )
    res = matching.mutual_filter(res, frame.xy_und.shape[0])

    N = frame.xy_und.shape[0]
    feat_idx = jnp.where(res.valid, res.idx, N - 1)
    lm_ids = jnp.arange(L)
    assoc = assoc.at[feat_idx].set(
        jnp.where(res.valid & (assoc[feat_idx] < 0), lm_ids, assoc[feat_idx])
    )

    out = _optimize_and_gate(m, frame, Rcw, tcw, assoc, cam)

    # statistics: visible++ for frustum-passed, found++ for final inliers
    found_now = jnp.zeros((L,), bool).at[jnp.clip(out.assoc, 0)].set(out.assoc >= 0)
    lms = m.lms._replace(
        visible=m.lms.visible + (query_valid | already).astype(jnp.int32),
        found=m.lms.found + found_now.astype(jnp.int32),
    )
    return out, m._replace(lms=lms)


def need_new_keyframe(
    n_inliers,
    ref_kf_tracked,
    frames_since_kf,
    mapping_idle: bool = True,
    min_frames: int = 0,
    max_frames: int = 30,
    min_inliers: int = 15,
):
    """Keyframe decision (host-side scalars). Simplified Tracking::
    NeedNewKeyFrame: insert if tracking weakens vs the reference keyframe
    or too long since the last insertion."""
    c1 = frames_since_kf >= max_frames
    c2 = (frames_since_kf >= min_frames) and mapping_idle
    weak = n_inliers < 0.9 * ref_kf_tracked
    return bool((c1 or (c2 and weak)) and n_inliers > min_inliers)
