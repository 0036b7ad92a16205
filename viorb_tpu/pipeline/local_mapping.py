"""Local mapping kernels: new-landmark triangulation, local BA over the map
tables, landmark culling.

Array re-design of the reference `LocalMapping` thread
(`/root/reference/src/LocalMapping.cc`): `CreateNewMapPoints` (:2223),
`MapPointCulling` (:2174), and the local-BA dispatch (:1827-1997). The
pipeline is synchronous and deterministic — the reference's thread/queue
interplay (mbAbortBA, AcceptKeyFrames polling) disappears; stages run as
explicit jitted calls from pipeline/system.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..map import arrays as ma
from ..ops import matching
from ..pipeline import initializer
from ..solver import ba
from ..solver.ba import Camera
from ..utils import lie


def fundamental_from_poses(Rcw1, tcw1, Rcw2, tcw2, cam: Camera):
    """F12 mapping points in image 1 to epipolar lines in image 2.

    (ORBmatcher computes F12 = K1^-T [t12]x R12 K2^-1 — LocalMapping::
    ComputeF12; we build the same from the two camera poses.)
    """
    R12 = Rcw1 @ Rcw2.T
    t12 = -R12 @ tcw2 + tcw1
    # E such that x2^T E' ... build line in image 2 for point in image 1:
    # l2 = F21 x1 with F21 = K^-T [t21]x R21 K^-1
    R21 = R12.T
    t21 = -R21 @ t12
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], Rcw1.dtype)
    Kinv = jnp.linalg.inv(K)
    F21 = Kinv.T @ lie.hat(t21) @ R21 @ Kinv
    return F21


def triangulate_new_points(
    m: ma.MapArrays,
    kf_new: jax.Array,  # () int index of the new keyframe
    kf_nb: jax.Array,  # () int index of a covisible neighbor
    cam: Camera,
    scale: float = 1.2,
) -> ma.MapArrays:
    """Epipolar-match unassociated features between two keyframes,
    triangulate, validate, and append landmarks (CreateNewMapPoints).

    Checks preserved from LocalMapping.cc:2223-2509: parallax (cos <
    0.9998), positive depth in both views, reprojection chi2 < 5.991 * sigma2,
    scale-consistency ratio between the two observation distances.
    """
    K1 = kf_new
    K2 = kf_nb
    kfs = m.kfs
    f1_pm1 = kfs.feat_pm1[K1]
    f2_pm1 = kfs.feat_pm1[K2]
    xy1 = kfs.feat_xy[K1]
    xy2 = kfs.feat_xy[K2]
    free1 = kfs.feat_valid[K1] & (m.assoc[K1] < 0)
    free2 = kfs.feat_valid[K2] & (m.assoc[K2] < 0)

    R1, t1 = kfs.Rcw[K1], kfs.tcw[K1]
    R2, t2 = kfs.Rcw[K2], kfs.tcw[K2]
    F21 = fundamental_from_poses(R1, t1, R2, t2, cam)

    dist = matching.hamming_matrix(f1_pm1, f2_pm1)
    allowed = matching.epipolar_mask(F21, xy1, xy2, kfs.feat_sigma2[K2])
    allowed = allowed & free1[:, None] & free2[None, :]
    res = matching.best_match(dist, allowed, max_dist=matching.TH_LOW, ratio=0.9)
    res = matching.mutual_filter(res, xy2.shape[0])

    # triangulate matches in normalized coords
    Kmat = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]], xy1.dtype)
    Kinv = jnp.linalg.inv(Kmat)
    N = xy1.shape[0]
    idx2 = jnp.clip(res.idx, 0)
    ones = jnp.ones((N, 1), xy1.dtype)
    x1n = (jnp.concatenate([xy1, ones], -1) @ Kinv.T)[:, :2]
    x2n = (jnp.concatenate([xy2[idx2], ones], -1) @ Kinv.T)[:, :2]
    X = initializer.triangulate(R1, t1, R2, t2, x1n, x2n)

    # validity checks
    c1 = -R1.T @ t1
    c2 = -R2.T @ t2
    r1 = X - c1
    r2 = X - c2
    d1 = jnp.linalg.norm(r1, axis=-1)
    d2 = jnp.linalg.norm(r2, axis=-1)
    cos_par = jnp.sum(r1 * r2, -1) / jnp.maximum(d1 * d2, 1e-12)
    z1 = (X @ R1.T + t1)[:, 2]
    z2 = (X @ R2.T + t2)[:, 2]

    def reproj_chi2(R, t, xy, sigma2):
        Pc = X @ R.T + t
        u = cam.fx * Pc[:, 0] / jnp.maximum(Pc[:, 2], 1e-6) + cam.cx
        v = cam.fy * Pc[:, 1] / jnp.maximum(Pc[:, 2], 1e-6) + cam.cy
        return ((u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2) / sigma2

    chi1 = reproj_chi2(R1, t1, xy1, kfs.feat_sigma2[K1])
    chi2_ = reproj_chi2(R2, t2, xy2[idx2], kfs.feat_sigma2[K2][idx2])

    ratio_d = d1 / jnp.maximum(d2, 1e-9)
    ratio_oct = (
        scale ** (kfs.feat_octave[K1].astype(xy1.dtype))
        / scale ** (kfs.feat_octave[K2][idx2].astype(xy1.dtype))
    )
    ratio_factor = 1.5 * scale
    ok = (
        res.valid
        & (cos_par < 0.9998) & (cos_par > 0)
        & (z1 > 0) & (z2 > 0)
        & (chi1 < 5.991) & (chi2_ < 5.991)
        & (ratio_d * ratio_factor > ratio_oct)
        & (ratio_d < ratio_oct * ratio_factor)
        & jnp.all(jnp.isfinite(X), axis=-1)
    )

    # landmark attributes: descriptor from kf_new, normal = mean dir, scale
    # distances from octave of the first observation
    n_vec = (r1 / jnp.maximum(d1, 1e-9)[:, None] + r2 / jnp.maximum(d2, 1e-9)[:, None]) * 0.5
    # MapPoint ctor: mfMaxDistance = dist * 1.2^level, mfMinDistance =
    # mfMaxDistance / 1.2^(nlevels-1); margins (0.8/1.2) live in isInFrustum.
    level = kfs.feat_octave[K1].astype(xy1.dtype)
    dist_max = d1 * scale**level
    dist_min = dist_max / (scale**7)

    return ma.add_landmarks(
        m,
        pos=X,
        pm1=f1_pm1,
        normal=n_vec,
        dist_min=dist_min,
        dist_max=dist_max,
        kf_a=K1,
        kf_b=K2,
        feat_a=jnp.arange(N),
        feat_b=idx2,
        ok=ok,
    )


def gather_ba_problem(
    m: ma.MapArrays, kf_ids: jax.Array, cam: Camera, stereo: bool = False
):
    """Build BAObservations from full assoc rows of the selected keyframes.

    kf_ids: (W,) int (padded with -1). Observation slots = W * N_FEAT.
    Landmark index space = the global table (invalid slots masked).
    stereo=True attaches the stored right-u rows so BA uses the 3-row
    stereo residual (keeps the map metric — without it local BA is free
    to drift the scale that the tracking stereo residuals then reject).
    """
    W = kf_ids.shape[0]
    Kv = jnp.clip(kf_ids, 0)
    N = m.assoc.shape[1]
    assoc = m.assoc[Kv]  # (W, N)
    lm = jnp.clip(assoc, 0)
    valid = (
        (assoc >= 0)
        & m.kfs.feat_valid[Kv]
        & (kf_ids >= 0)[:, None]
        & m.lms.valid[lm]
    )
    ur = m.kfs.feat_uright[Kv].reshape(-1) if stereo else None
    obs = ba.BAObservations(
        cam_idx=jnp.repeat(jnp.arange(W), N),
        lm_idx=lm.reshape(-1),
        uv=m.kfs.feat_xy[Kv].reshape(W * N, 2),
        inv_sigma2=(1.0 / m.kfs.feat_sigma2[Kv]).reshape(-1),
        valid=valid.reshape(-1),
        u_right=ur,
        has_right=None if ur is None else ur >= 0,
    )
    return obs


def local_ba_vision(
    m: ma.MapArrays,
    window_ids: jax.Array,  # (W,) keyframe indices, -1 padded
    fixed_mask: jax.Array,  # (W,) bool — keyframes held constant
    cam: Camera,
    stereo: bool = False,
) -> ma.MapArrays:
    """Vision local BA over selected keyframes; writes results back into the
    map tables (LocalBundleAdjustment, Optimizer.cc:2763)."""
    W = window_ids.shape[0]
    Kv = jnp.clip(window_ids, 0)
    obs = gather_ba_problem(m, window_ids, cam, stereo=stereo)
    state = ba.VisionBAState(
        Rcw=m.kfs.Rcw[Kv], tcw=m.kfs.tcw[Kv], points=m.lms.pos
    )
    fixed = fixed_mask | (window_ids < 0)
    out, obs2 = ba.bundle_adjust_vision(state, obs, cam, fixed)

    # write back cameras (only live, non-fixed entries)
    live = (window_ids >= 0) & ~fixed_mask
    Rcw = m.kfs.Rcw.at[Kv].set(jnp.where(live[:, None, None], out.Rcw, m.kfs.Rcw[Kv]))
    tcw = m.kfs.tcw.at[Kv].set(jnp.where(live[:, None], out.tcw, m.kfs.tcw[Kv]))
    # write back all landmarks (untouched ones got zero update)
    lms = m.lms._replace(pos=out.points)
    # clear associations gated as outliers
    N = m.assoc.shape[1]
    gated = obs.valid & ~obs2.valid  # outliers discovered by BA
    assoc = m.assoc.at[
        jnp.repeat(Kv, N), jnp.tile(jnp.arange(N), W)
    ].set(jnp.where(gated, -1, m.assoc[Kv].reshape(-1)))
    return m._replace(kfs=m.kfs._replace(Rcw=Rcw, tcw=tcw), lms=lms, assoc=assoc)


def cull_landmarks(m: ma.MapArrays, current_kf: jax.Array) -> ma.MapArrays:
    """MapPointCulling (LocalMapping.cc:2174): drop landmarks with poor
    found/visible ratio or too few observations shortly after creation."""
    age = current_kf - m.lms.first_kf
    ratio = m.lms.found.astype(jnp.float32) / jnp.maximum(m.lms.visible, 1).astype(jnp.float32)
    bad = (ratio < 0.25) & (age >= 2)
    bad = bad | ((age >= 2) & (age <= 3) & (m.lms.n_obs <= 2))
    valid = m.lms.valid & ~bad
    return m._replace(lms=m.lms._replace(valid=valid))


def keyframe_redundancy(
    m: ma.MapArrays,
    min_supporters: int = 3,
    redundancy_ratio: float = 0.9,
    scale_slack: int = 1,
) -> jax.Array:
    """(K,) bool: keyframe is redundant — >= 90% of its tracked landmarks
    are observed by >= 3 other keyframes at the same or finer octave
    (LocalMapping::KeyFrameCulling, LocalMapping.cc:2692; thresholds
    nObs>=3, mnScaleLevels<=scaleLevel+1, 0.9 redundancy).

    One pass for ALL keyframes: a per-(KF, landmark) observation-octave
    table, reduced to per-landmark counts of observers at-or-below each
    octave threshold, then gathered per observation — no per-KF loops.
    """
    K, N = m.assoc.shape
    L = m.lms.pos.shape[0]
    n_oct = 9  # pyramid levels + 1 slack bin

    # observation octave per (KF, landmark); 127 = not observed
    rows = jnp.repeat(jnp.arange(K)[:, None], N, 1)
    cols = jnp.clip(m.assoc, 0)
    obs_ok = (m.assoc >= 0) & m.kfs.feat_valid & m.kfs.valid[:, None]
    oct_val = jnp.where(obs_ok, m.kfs.feat_octave, 127)
    oct_t = jnp.full((K, L), 127, jnp.int32).at[rows, cols].min(oct_val)

    # cnt_le[l, t] = number of keyframes observing l at octave <= t
    thresh = jnp.arange(n_oct)[None, None, :]  # (1, 1, T)
    cnt_le = jnp.sum(oct_t[:, :, None] <= thresh, axis=0)  # (L, T)

    # per observation (k, n): supporters among OTHER keyframes
    o = jnp.minimum(m.kfs.feat_octave + scale_slack, n_oct - 1)
    support = cnt_le[cols, o] - 1  # own observation always counts once
    enough = (support >= min_supporters) & obs_ok

    tracked = jnp.sum(obs_ok, axis=1)
    covered = jnp.sum(enough, axis=1)
    return (
        (covered >= redundancy_ratio * tracked) & (tracked > 0) & m.kfs.valid
    )


def cull_keyframe(m: ma.MapArrays, kf_id) -> ma.MapArrays:
    """Remove one keyframe (KeyFrame::SetBadFlag, array form): release its
    landmark observations and clear its slot. The slot is append-only —
    `kfs.valid` gates every downstream covisibility/BA/trajectory query."""
    k = jnp.asarray(kf_id, jnp.int32)
    row = m.assoc[k]
    lm = jnp.clip(row, 0)
    dec = ((row >= 0) & m.kfs.feat_valid[k]).astype(jnp.int32)
    n_obs = m.lms.n_obs.at[lm].add(-dec)
    kfs = m.kfs._replace(
        valid=m.kfs.valid.at[k].set(False),
        feat_valid=m.kfs.feat_valid.at[k].set(False),
    )
    assoc = m.assoc.at[k].set(-1)
    return m._replace(kfs=kfs, assoc=assoc, lms=m.lms._replace(n_obs=n_obs))
