"""Per-frame tracking kernels: motion-model tracking, local-map tracking,
frustum culling, keyframe policy.

Array re-design of the reference `Tracking` thread's per-frame work
(`/root/reference/src/Tracking.cc:978-1553`): each stage is one jitted
fixed-shape program over the map tables; the host state machine lives in
pipeline/system.py.

- `track_motion_model`  <- Tracking::TrackWithMotionModel (Tracking.cc:1984)
- `track_reference_keyframe` <- TrackReferenceKeyFrame (Tracking.cc:1921),
  the fallback rung when motion-model/IMU tracking fails; its matcher
  (`match_reference_keyframe`) also serves TrackReferenceKeyFrameWithIMU
  (Tracking.cc:508-565)
- `track_local_map`     <- TrackLocalMap + SearchLocalPoints + isInFrustum
  (Tracking.cc:2054,2315-2365; Frame::isInFrustum, Frame.cc)
- `need_new_keyframe`   <- NeedNewKeyFrame (Tracking.cc:2101-2208)
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
    angle_last: jax.Array | None = None,  # (N,) last frame keypoint angles
) -> TrackOutput:
    """Project last frame's landmarks at the velocity-predicted pose, match
    in a window, optimize the pose (4x10 with gating).

    angle_last enables the rotation-histogram consistency filter the
    reference applies in SearchByProjection-by-last-frame
    (ORBmatcher.cc mbCheckOrientation): query i is last-frame feature i,
    so its keypoint angle gates the match against the current feature's."""
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
    if angle_last is not None:
        res = matching.rotation_consistency(angle_last, frame.feats.angle, res)

    # scatter matches into a per-feature assoc row
    N = frame.xy_und.shape[0]
    assoc = jnp.full((N,), -1, jnp.int32)
    feat_idx = jnp.where(res.valid, res.idx, N - 1)
    assoc = assoc.at[feat_idx].set(jnp.where(res.valid, lm_id, assoc[feat_idx]))

    return _optimize_and_gate(m, frame, Rp, tp, assoc, cam)


def match_reference_keyframe(
    m: ma.MapArrays,
    frame: FrameData,
    ref_kf,  # () int32 keyframe index
    ratio: float = 0.7,
) -> jax.Array:
    """(N,) landmark-id assoc row from descriptor-matching the frame
    against the reference keyframe's landmark-bearing features.

    The matching rung of TrackReferenceKeyFrame[WithIMU]
    (Tracking.cc:508-565, :1066): ORBmatcher::SearchByBoW(KF, Frame) with
    ratio 0.7 + rotation-histogram consistency. The BoW feature-vector node
    constraint is a CPU pruning device; the dense Hamming matrix on the MXU
    subsumes it."""
    k = jnp.asarray(ref_kf, jnp.int32)
    lm_id = m.assoc[k]
    has = (lm_id >= 0) & m.kfs.feat_valid[k] & m.lms.valid[jnp.clip(lm_id, 0)]
    dist = matching.hamming_matrix(m.kfs.feat_pm1[k], frame.feats.desc_pm1)
    allowed = has[:, None] & frame.feats.valid[None, :]
    res = matching.best_match(
        dist, allowed, max_dist=matching.TH_LOW, ratio=ratio
    )
    N = frame.xy_und.shape[0]
    res = matching.mutual_filter(res, N)
    res = matching.rotation_consistency(
        m.kfs.feat_angle[k], frame.feats.angle, res
    )
    assoc = jnp.full((N,), -1, jnp.int32)
    feat_idx = jnp.where(res.valid, res.idx, N - 1)
    assoc = assoc.at[feat_idx].set(jnp.where(res.valid, lm_id, assoc[feat_idx]))
    return assoc


def track_reference_keyframe(
    m: ma.MapArrays,
    frame: FrameData,
    ref_kf,  # () int32
    Rcw_seed: jax.Array,  # seed pose (the last frame's pose)
    tcw_seed: jax.Array,
    cam: Camera,
) -> TrackOutput:
    """Vision TrackReferenceKeyFrame (Tracking.cc:1066 + :1921-1982): BoW
    match vs the reference keyframe's landmarks, then pose optimization
    seeded at the last frame's pose."""
    assoc = match_reference_keyframe(m, frame, ref_kf)
    return _optimize_and_gate(m, frame, Rcw_seed, tcw_seed, assoc, cam)


def _optimize_and_gate(m, frame, Rp, tp, assoc, cam) -> TrackOutput:
    """Pose-optimize against associated landmarks; clear outlier assocs.

    Schedule: the reference's 4 rounds x 10 LM iterations with chi2
    re-gating between rounds (Optimizer::PoseOptimization,
    Optimizer.cc:2548) — pose_optimize_vision's defaults. A round-4
    experiment with 4x5 (halving the serial LM dependency chain) was
    reverted: the full 4x10 schedule is what tests/test_mono_e2e.py's
    accuracy bound is validated against."""
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
    x_max: float,
    y_max: float,
    x_min: float = 0.0,
    y_min: float = 0.0,
):
    """(L,) visibility + (L, 2) projections + (L,) predicted octave.

    Frame::isInFrustum: positive depth, in-image, distance within
    [0.8 dmin, 1.2 dmax], viewing angle < 60 deg from the mean normal.
    The image bounds are the UNDISTORTED bounds (Frame::ComputeImageBounds
    mnMinX..mnMaxY) — [0, W) x [0, H) for a distortion-free camera.
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
        & (uv[:, 0] >= x_min) & (uv[:, 0] < x_max)
        & (uv[:, 1] >= y_min) & (uv[:, 1] < y_max)
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
    x_min: float = 0.0,
    y_min: float = 0.0,
) -> tuple[TrackOutput, ma.MapArrays]:
    """Match frustum-visible map points into remaining features and
    re-optimize. Also updates landmark visible/found statistics.

    width/height are the upper undistorted image bounds (x_max/y_max);
    x_min/y_min the lower (nonzero when the camera has distortion)."""
    vis, uv_pred, octave, view_cos = frustum_gate(
        m, Rcw, tcw, cam, width, height, x_min=x_min, y_min=y_min
    )
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
    lm_ids = jnp.arange(L, dtype=assoc.dtype)
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


def ref_kf_tracked_landmarks(m: ma.MapArrays, kf_id, min_obs) -> jax.Array:
    """Reference keyframe's landmarks with >= min_obs observations
    (KeyFrame::TrackedMapPoints(nMinObs), used as nRefMatches by
    Tracking::NeedNewKeyFrame, Tracking.cc:2126)."""
    k = jnp.asarray(kf_id, jnp.int32)
    row = m.assoc[k]
    lm = jnp.clip(row, 0)
    ok = (
        (row >= 0)
        & m.kfs.feat_valid[k]
        & m.lms.valid[lm]
        & (m.lms.n_obs[lm] >= min_obs)
    )
    return jnp.sum(ok)


class FrameStepOut(NamedTuple):
    """Everything one tracked frame produces, in a single device program."""

    Rcw: jax.Array
    tcw: jax.Array
    assoc: jax.Array  # (N,)
    vel_R: jax.Array  # updated motion model Tcl
    vel_t: jax.Array
    Rcr: jax.Array  # pose relative to the reference keyframe
    tcr: jax.Array
    scalars: jax.Array  # (4,) int32: [n_inliers, n_first_pass, used_ref_kf, n_ref_matches]


def fused_frame_step(
    m: ma.MapArrays,
    frame: FrameData,
    Rcw_last: jax.Array,
    tcw_last: jax.Array,
    assoc_last: jax.Array,
    angle_last: jax.Array,
    R_vel: jax.Array,
    t_vel: jax.Array,
    ref_pose_kf,  # () int32: newest keyframe (relative-trajectory anchor)
    ref_kf,  # () int32: newest VALID keyframe (fallback rung + nRefMatches)
    min_obs,  # () int32
    cam: Camera,
    width: float,
    height: float,
    x_min: float = 0.0,
    y_min: float = 0.0,
    only_local: bool = False,
) -> tuple[FrameStepOut, ma.MapArrays]:
    """One whole per-frame tracking step as a single XLA program.

    Fuses the reference's per-frame Tracking::Track sequence — motion-model
    tracking (Tracking.cc:1983), the TrackReferenceKeyFrame fallback rung
    (Tracking.cc:1141), TrackLocalMap (Tracking.cc:2052), motion-model
    velocity update (Tracking.cc:1240-1246) and the relative-to-reference
    pose bookkeeping (Tracking.cc:1525-1541) — into one dispatch. The host
    receives ONE small scalar vector per frame; everything else stays
    device-resident. MonoSystem._track drives this per frame; the VI twin
    is vi_system.fused_vi_frame_step. Note the relative pose (Rcr, tcr) is
    computed against the PRE-insertion reference keyframe — a frame that
    becomes a keyframe afterwards records an identity relative pose on the
    host instead (MonoSystem._track).
    """
    from jax import lax

    # one common dtype across both cond branches (x64 test mode mixes host
    # f64 poses with f32 tables otherwise)
    dt = m.kfs.Rcw.dtype
    Rcw_last = jnp.asarray(Rcw_last, dt)
    tcw_last = jnp.asarray(tcw_last, dt)
    R_vel = jnp.asarray(R_vel, dt)
    t_vel = jnp.asarray(t_vel, dt)

    if only_local:
        # onlyTrackLocalMap mode: velocity-model seed, no frame-to-frame pass
        Rp, tp = lie.se3_mul(R_vel, t_vel, Rcw_last, tcw_last)
        out = TrackOutput(
            Rcw=Rp, tcw=tp,
            assoc=jnp.full_like(assoc_last, -1),
            n_inliers=jnp.zeros((), jnp.int32),
        )
        used_ref = jnp.zeros((), jnp.int32)
        th_lm = 5.0
    else:
        mm = track_motion_model(
            m, frame, Rcw_last, tcw_last, assoc_last, R_vel, t_vel, cam,
            angle_last=angle_last,
        )
        out = lax.cond(
            mm.n_inliers < 10,
            lambda: track_reference_keyframe(
                m, frame, ref_kf, Rcw_last, tcw_last, cam
            ),
            lambda: mm,
        )
        used_ref = (mm.n_inliers < 10).astype(jnp.int32)
        th_lm = 1.0

    out2, m2 = track_local_map(
        m, frame, out.Rcw, out.tcw, out.assoc, cam, width, height,
        th=th_lm, x_min=x_min, y_min=y_min,
    )
    ref_cnt = ref_kf_tracked_landmarks(m2, ref_kf, min_obs)

    Rl_inv, tl_inv = lie.se3_inv(Rcw_last, tcw_last)
    vel_R, vel_t = lie.se3_mul(out2.Rcw, out2.tcw, Rl_inv, tl_inv)

    k = jnp.asarray(ref_pose_kf, jnp.int32)
    Rr_inv, tr_inv = lie.se3_inv(m2.kfs.Rcw[k], m2.kfs.tcw[k])
    Rcr, tcr = lie.se3_mul(out2.Rcw, out2.tcw, Rr_inv, tr_inv)

    scalars = jnp.stack(
        [out2.n_inliers, out.n_inliers, used_ref, ref_cnt]
    ).astype(jnp.int32)
    return (
        FrameStepOut(
            Rcw=out2.Rcw, tcw=out2.tcw, assoc=out2.assoc,
            vel_R=vel_R, vel_t=vel_t, Rcr=Rcr, tcr=tcr, scalars=scalars,
        ),
        m2,
    )


def need_new_keyframe(
    n_inliers,
    n_ref_matches,
    frames_since_kf,
    n_kfs: int = 2,
    frames_since_reloc: int = 1 << 30,
    mapping_idle: bool = True,
    min_frames: int = 0,
    max_frames: int = 30,
    min_inliers: int = 15,
    monocular: bool = True,
    need_close_insert: bool = False,
    max_interval_inserts: bool = True,
):
    """Keyframe decision, host-side scalars (Tracking::NeedNewKeyFrame,
    Tracking.cc:2101-2208).

    - reloc gate: no insertion within mMaxFrames frames of a relocalization
      once the map is mature (nKFs > mMaxFrames);
    - c1a: > mMaxFrames since the last keyframe;
    - c1b: > mMinFrames and local mapping idle (the synchronous pipeline is
      always idle: every keyframe is fully processed before the next frame,
      so the reference's InterruptBA/queue<3 arm never arises);
    - c1c (stereo/RGB-D): tracking weak (< 0.25 nRefMatches) or close
      points need inserting;
    - c2: < thRefRatio * nRefMatches (0.9 mono / 0.75 stereo; 0.4 while the
      map has < 2 keyframes) and > 15 inliers.
    """
    if frames_since_reloc < max_frames and n_kfs > max_frames:
        return False
    th_ref = 0.9 if monocular else 0.75
    if n_kfs < 2:
        th_ref = 0.4
    c1a = frames_since_kf >= max_frames
    c1b = (frames_since_kf >= min_frames) and mapping_idle
    c1c = (not monocular) and (
        n_inliers < 0.25 * n_ref_matches or need_close_insert
    )
    c2 = (
        n_inliers < th_ref * n_ref_matches or need_close_insert
    ) and n_inliers > min_inliers
    # Divergence from the reference's `(c1a||c1b||c1c)&&c2`: c1a (max
    # interval exceeded) inserts on its own once tracking is healthy.
    # Under the reference's rule a sequence tracked ABOVE the 0.9 ratio
    # never inserts at all — on easy synthetic orbits keyframes then come
    # ~0.5/s, too sparse for loop-closing's 3-consecutive consistency
    # vote (LoopClosing.cc:200-270) to fire within a revisit arc. Real
    # handheld sequences decay the ratio quickly, which is why the
    # reference never hits this; a bounded max spacing also keeps the
    # fixed-capacity map's place-recognition density predictable.
    # `max_interval_inserts=False` restores the reference's exact gate
    # (for parity runs and capacity-sensitive configs — the fixed-cadence
    # insertions raise steady-state pressure on the keyframe table;
    # round-4 ADVICE low #4).
    if max_interval_inserts:
        return bool(
            (c1a and n_inliers > min_inliers) or ((c1b or c1c) and c2)
        )
    return bool((c1a or c1b or c1c) and c2)
