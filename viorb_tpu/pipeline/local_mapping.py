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
    n_levels: int = 8,
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
        # padded-neighbor gate: a -1 id disables the whole pass (the
        # batched keyframe_mapping_program pads its neighbor list)
        & (jnp.asarray(kf_nb) >= 0) & (jnp.asarray(kf_new) >= 0)
    )

    # landmark attributes: descriptor from kf_new, normal = mean dir, scale
    # distances from octave of the first observation
    n_vec = (r1 / jnp.maximum(d1, 1e-9)[:, None] + r2 / jnp.maximum(d2, 1e-9)[:, None]) * 0.5
    # MapPoint ctor: mfMaxDistance = dist * 1.2^level, mfMinDistance =
    # mfMaxDistance / 1.2^(nlevels-1); margins (0.8/1.2) live in isInFrustum.
    level = kfs.feat_octave[K1].astype(xy1.dtype)
    dist_max = d1 * scale**level
    dist_min = dist_max / (scale ** (n_levels - 1))

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


def compact_window_landmarks(obs: ba.BAObservations, L: int, max_active: int):
    """Remap the window's observed landmarks into a dense [0, max_active)
    index space (jnp.nonzero with a static size).

    The window observes far fewer distinct landmarks than the global table
    holds, yet every Schur landmark op (block build/inverse, square-root
    fill-in scatter, back-substitution) would otherwise run at the full
    table size PER LM ITERATION — at L=16k vs ~2k active that is ~8x
    wasted landmark algebra (round-4 TPU profiling: local BA was the
    single most expensive per-keyframe program). Landmarks beyond
    max_active (never observed in practice for reference-sized windows)
    are dropped from this BA round: their observations are masked and
    their positions held. The true active count is returned so the host
    can surface an overflow instead of silently truncating (round-4
    ADVICE low #5).

    Returns (obs_compact, act_idx (max_active,) with fill L, keep mask,
    n_active scalar).
    """
    presence = jnp.zeros((L,), bool).at[obs.lm_idx].max(obs.valid)
    act = jnp.nonzero(presence, size=max_active, fill_value=L)[0]
    inv = jnp.full((L + 1,), -1, jnp.int32).at[act].set(
        jnp.arange(max_active, dtype=jnp.int32)
    )
    lm_small = inv[obs.lm_idx]
    obs_c = obs._replace(
        lm_idx=jnp.clip(lm_small, 0), valid=obs.valid & (lm_small >= 0)
    )
    return obs_c, act, act < L, presence.sum().astype(jnp.int32)


def local_ba_vision(
    m: ma.MapArrays,
    window_ids: jax.Array,  # (W,) keyframe indices, -1 padded
    fixed_mask: jax.Array,  # (W,) bool — keyframes held constant
    cam: Camera,
    stereo: bool = False,
    max_active_lms: int = 4096,
) -> ma.MapArrays:
    """Vision local BA over selected keyframes; writes results back into the
    map tables (LocalBundleAdjustment, Optimizer.cc:2763). The landmark
    dimension is compacted to the window's active set first
    (compact_window_landmarks)."""
    W = window_ids.shape[0]
    Kv = jnp.clip(window_ids, 0)
    L = m.lms.pos.shape[0]
    La = min(max_active_lms, L)
    obs = gather_ba_problem(m, window_ids, cam, stereo=stereo)
    obs_c, act, keep, n_active = compact_window_landmarks(obs, L, La)
    act_c = jnp.clip(act, 0, L - 1)
    state = ba.VisionBAState(
        Rcw=m.kfs.Rcw[Kv], tcw=m.kfs.tcw[Kv], points=m.lms.pos[act_c]
    )
    fixed = fixed_mask | (window_ids < 0)
    # The reference's 5 + 10 LM schedule (Optimizer.cc:2790). Trimmed
    # schedules were tried for TPU latency and rejected: 3+5 under-
    # converges before the inter-round chi2 gate and guts the map; 5+5
    # left the window slightly under-refined, thinning per-frame inlier
    # ratios enough to double the keyframe cadence on half-resolution
    # sequences (round-4 A/B) — a net end-to-end LOSS.
    out, obs2 = ba.bundle_adjust_vision(state, obs_c, cam, fixed)

    # write back cameras (only live, non-fixed entries)
    live = (window_ids >= 0) & ~fixed_mask
    Rcw = m.kfs.Rcw.at[Kv].set(jnp.where(live[:, None, None], out.Rcw, m.kfs.Rcw[Kv]))
    tcw = m.kfs.tcw.at[Kv].set(jnp.where(live[:, None], out.tcw, m.kfs.tcw[Kv]))
    # scatter the active landmarks back (fill slots rewrite their old value)
    pos = m.lms.pos.at[act_c].set(
        jnp.where(keep[:, None], out.points, m.lms.pos[act_c])
    )
    lms = m.lms._replace(pos=pos)
    # clear associations gated as outliers
    N = m.assoc.shape[1]
    gated = obs_c.valid & ~obs2.valid  # outliers discovered by BA
    assoc = m.assoc.at[
        jnp.repeat(Kv, N), jnp.tile(jnp.arange(N), W)
    ].set(jnp.where(gated, -1, m.assoc[Kv].reshape(-1)))
    m = m._replace(kfs=m.kfs._replace(Rcw=Rcw, tcw=tcw), lms=lms, assoc=assoc)
    return m, n_active


def fuse_into_keyframe(
    m: ma.MapArrays,
    kf_id: jax.Array,  # () int32 target keyframe
    lm_cand: jax.Array,  # (L,) bool candidate landmarks to fuse in
    cam: Camera,
    x_max: float,
    y_max: float,
    x_min: float = 0.0,
    y_min: float = 0.0,
    th: float = 3.0,
    scale: float = 1.2,
    prefer_query: bool = False,
) -> ma.MapArrays:
    """One ORBmatcher::Fuse pass (include/ORBmatcher.h Fuse; called from
    LocalMapping::SearchInNeighbors, LocalMapping.cc:2514-2594).

    prefer_query=True makes the QUERY landmark always survive a merge —
    the loop-closure SearchAndFuse direction (`pRep->Replace(
    mvpLoopMapPoints[i])`, LoopClosing.cc:672: the loop-side landmark
    replaces the keyframe's current landmark unconditionally).

    Project the candidate landmarks into the target keyframe, window-match
    against its features (radius 3 * scale^predicted_level, octave in
    [pred-1, pred], TH_LOW), then per match:
    - the matched feature already holds a DIFFERENT landmark -> merge: the
      landmark with more observations survives (MapPoint::Replace), every
      assoc entry of the loser is rewritten to the winner;
    - the feature is free -> add the observation.

    Observation counts are left stale; run `dedup_and_recount` after the
    fuse passes (it also drops duplicate same-landmark entries within one
    keyframe row — the reference's Replace erases those).
    """
    from . import tracking

    k = jnp.clip(jnp.asarray(kf_id, jnp.int32), 0)
    L = m.lms.pos.shape[0]
    N = m.assoc.shape[1]
    vis, uv, octave, _ = tracking.frustum_gate(
        m, m.kfs.Rcw[k], m.kfs.tcw[k], cam, x_max, y_max,
        x_min=x_min, y_min=y_min,
    )
    # skip landmarks already observed by this keyframe (pMP->IsInKeyFrame);
    # a -1 target id disables the whole pass (padded batched callers)
    row = m.assoc[k]
    already = jnp.zeros((L,), bool).at[jnp.clip(row, 0)].set(row >= 0)
    query = vis & lm_cand & ~already & m.lms.valid & (jnp.asarray(kf_id) >= 0)

    radius = th * scale ** octave.astype(uv.dtype)
    res = matching.search_by_projection(
        m.lms.pm1,
        m.kfs.feat_pm1[k],
        uv,
        m.kfs.feat_xy[k],
        radius,
        query,
        m.kfs.feat_valid[k],
        oct_query=octave,
        oct_frame=m.kfs.feat_octave[k],
        oct_lo=-1,
        oct_hi=0,
        max_dist=matching.TH_LOW,
    )
    res = matching.mutual_filter(res, N)

    q = jnp.arange(L, dtype=jnp.int32)  # query landmark ids (row index)
    f = jnp.clip(res.idx, 0)
    existing = m.assoc[k, f]
    merge = res.valid & (existing >= 0) & (existing != q)
    # winner = more observations (ties: the existing landmark survives,
    # matching Replace's pMP->Replace(pMPinKF) direction on equal counts)
    if prefer_query:
        q_wins = jnp.ones_like(merge)
    else:
        q_wins = m.lms.n_obs[q] > m.lms.n_obs[jnp.clip(existing, 0)]
    winner = jnp.where(q_wins, q, existing)
    loser = jnp.where(q_wins, existing, q)

    # landmark id LUT with an L dump slot for non-merges
    lut = jnp.arange(L + 1, dtype=jnp.int32)
    lut = lut.at[jnp.where(merge, loser, L)].set(jnp.where(merge, winner, L))
    assoc = jnp.where(m.assoc >= 0, lut[jnp.clip(m.assoc, 0)], m.assoc)

    loser_mask = jnp.zeros((L,), bool).at[jnp.clip(loser, 0)].max(merge)
    lms = m.lms._replace(valid=m.lms.valid & ~loser_mask)

    # free feature -> new observation
    add = res.valid & (existing < 0)
    f_add = jnp.where(add, f, N - 1)
    row_k = assoc[k]
    row_k = row_k.at[f_add].set(jnp.where(add, q, row_k[f_add]))
    assoc = assoc.at[k].set(row_k)
    return m._replace(assoc=assoc, lms=lms)


def keyframe_mapping_program(
    m: ma.MapArrays,
    kf_new: jax.Array,  # () int32 the freshly inserted keyframe
    neighbors: jax.Array,  # (B,) int32 covisible neighbor ids, -1 padded
    cam: Camera,
    x_max: float,
    y_max: float,
    x_min: float = 0.0,
    y_min: float = 0.0,
    scale: float = 1.2,
    n_levels: int = 8,
) -> ma.MapArrays:
    """The whole LocalMapping stage for one new keyframe as a single XLA
    program: CreateNewMapPoints against each covisible neighbor,
    SearchInNeighbors duplicate fusion across the neighborhood, observation
    dedup + recount, distinctive-descriptor refresh, landmark geometry
    update, and MapPointCulling (LocalMapping.cc:2174-2594).

    Replaces the host-sequenced 3 triangulation + 4 fuse + 3 cleanup
    dispatches of the round-2 pipeline (VERDICT "amortize keyframe
    insertion"): one dispatch, all intermediates device-resident. Padded
    (-1) neighbor slots are gated no-ops inside each stage.
    """
    kf_new = jnp.asarray(kf_new, jnp.int32)
    # 3 triangulation neighbors + 4 fuse targets. A 2-neighbor variant
    # saved ~14 ms of device time per keyframe but starved the map
    # (round-4 A/B on the rendered orbit: fewer landmarks -> lower
    # per-frame inlier ratios -> the NeedNewKeyFrame 0.9-ratio gate fired
    # ~60% more often -> net SLOWER end-to-end and worse ATE).
    B = neighbors.shape[0]
    for i in range(B):
        m = triangulate_new_points(
            m, kf_new, neighbors[i], cam, scale=scale, n_levels=n_levels
        )
    # SearchInNeighbors: fuse into each neighborhood member the landmarks
    # seen by the OTHER members (LocalMapping.cc:2514-2594)
    targets = jnp.concatenate([kf_new[None], neighbors])
    for t_i in range(B + 1):
        others = jnp.concatenate([targets[:t_i], targets[t_i + 1 :]])
        cand = ma.landmarks_of_keyframes(m, others)
        m = fuse_into_keyframe(
            m, targets[t_i], cand, cam, x_max, y_max,
            x_min=x_min, y_min=y_min, scale=scale,
        )
    m = dedup_and_recount(m)
    m = compute_distinctive_descriptors(m)
    m = ma.update_landmark_geometry(m, jnp.arange(m.lms.pos.shape[0]))
    m = cull_landmarks(m, kf_new)
    return m


def dedup_and_recount(m: ma.MapArrays) -> ma.MapArrays:
    """Repair the observation table after fuse passes: keep only the first
    feature per (keyframe, landmark) pair (MapPoint::Replace erases the
    duplicate observation when the winner is already in the keyframe) and
    recount n_obs from the table."""
    K, N = m.assoc.shape
    L = m.lms.pos.shape[0]
    lm = jnp.clip(m.assoc, 0)
    ok = (
        (m.assoc >= 0)
        & m.kfs.feat_valid
        & m.kfs.valid[:, None]
        & m.lms.valid[lm]
    )
    rows = jnp.arange(K, dtype=jnp.int32)[:, None]
    cols = jnp.arange(N, dtype=jnp.int32)[None, :]
    first = jnp.full((K, L), N, jnp.int32).at[rows, lm].min(
        jnp.where(ok, cols, N)
    )
    keep = ok & (first[rows, lm] == cols)
    assoc = jnp.where(keep, m.assoc, -1)
    lm_e = jnp.where(keep, lm, L).reshape(-1)
    n_obs = (
        jnp.zeros((L + 1,), jnp.int32)
        .at[lm_e]
        .add(keep.reshape(-1).astype(jnp.int32))[:L]
    )
    return m._replace(assoc=assoc, lms=m.lms._replace(n_obs=n_obs))


def compute_distinctive_descriptors(
    m: ma.MapArrays, max_obs: int = 8
) -> ma.MapArrays:
    """Refresh each landmark's representative descriptor to the observation
    with minimum median Hamming distance to the landmark's other
    observations (MapPoint::ComputeDistinctiveDescriptors, MapPoint.cc:257).

    Array form over the WHOLE map in one program: flatten all (keyframe,
    feature) observations, group by landmark, keep up to `max_obs`
    descriptors per landmark in a (L, P, 256) table, and get all pairwise
    Hamming distances as one batched int8 MXU matmul.

    Group-by WITHOUT a sort: a keyframe observes a landmark at most once
    (dedup_and_recount invariant), so an observation's slot within its
    landmark group is the number of LOWER-id keyframes observing that
    landmark — an exclusive cumsum over the (K, L) observation-count
    matrix. The previous 128k-element argsort dominated the whole mapping
    program (~40 ms of its ~100 ms on a v5e chip, round-4 profiling).
    """
    K, N = m.assoc.shape
    L = m.lms.pos.shape[0]
    P = max_obs
    M = K * N

    ok2d = (m.assoc >= 0) & m.kfs.feat_valid & m.kfs.valid[:, None]
    lm2d = jnp.where(ok2d, m.assoc, L)
    pm1 = m.kfs.feat_pm1.reshape(M, 256)

    rows = jnp.arange(K, dtype=jnp.int32)[:, None]
    obs_cnt = (
        jnp.zeros((K, L + 1), jnp.int32)
        .at[rows, lm2d]
        .add(ok2d.astype(jnp.int32))
    )
    rank2d_tbl = jnp.cumsum(obs_cnt, axis=0) - obs_cnt  # exclusive prefix
    rank = jnp.take_along_axis(rank2d_tbl, lm2d, axis=1).reshape(-1)
    lm = lm2d.reshape(-1)
    slot_ok = (rank < P) & (lm < L)

    li = jnp.where(slot_ok, lm, L)
    pi = jnp.clip(rank, 0, P - 1)
    desc = jnp.zeros((L + 1, P, 256), jnp.int8).at[li, pi].set(
        jnp.where(slot_ok[:, None], pm1, 0)
    )[:L]
    cnt = (
        jnp.zeros((L + 1,), jnp.int32).at[li].add(slot_ok.astype(jnp.int32))[:L]
    )

    # pairwise Hamming distances per landmark: one batched int8 matmul
    dots = jax.lax.dot_general(
        desc, desc,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32,
    )  # (L, P, P)
    dist = (256 - dots).astype(jnp.float32) * 0.5
    pr = jnp.arange(P)
    pair_ok = (pr[None, :, None] < cnt[:, None, None]) & (
        pr[None, None, :] < cnt[:, None, None]
    )
    dist = jnp.where(pair_ok, dist, jnp.inf)

    # median distance per observation (self-distance 0 included, like the
    # reference's vDists median at index 0.5*(N-1))
    dist_sorted = jnp.sort(dist, axis=-1)
    med_idx = jnp.clip((cnt - 1) // 2, 0, P - 1)
    med = jnp.take_along_axis(
        dist_sorted, med_idx[:, None, None].repeat(P, 1), axis=-1
    )[..., 0]  # (L, P)
    med = jnp.where(pr[None, :] < cnt[:, None], med, jnp.inf)
    best = jnp.argmin(med, axis=-1)  # (L,)

    # select row `best` of each (P, 256) block as a masked sum — a
    # take_along_axis gather here lowers to a 16k x 256-tuple gather that
    # costs ~50 ms on a v5e chip (round-4 profiling); the select+reduce is
    # a single fused pass over the 33 MB table
    sel = (pr[None, :] == best[:, None]).astype(desc.dtype)  # (L, P)
    # dtype pinned: jnp.sum would promote int8 -> int64 under x64 tests
    new_pm1 = jnp.sum(desc * sel[:, :, None], axis=1, dtype=desc.dtype)
    use = (cnt >= 1) & m.lms.valid
    pm1_out = jnp.where(use[:, None], new_pm1, m.lms.pm1)
    return m._replace(lms=m.lms._replace(pm1=pm1_out))


def cull_landmarks(m: ma.MapArrays, current_kf: jax.Array) -> ma.MapArrays:
    """MapPointCulling (LocalMapping.cc:2174): drop landmarks with poor
    found/visible ratio or too few observations shortly after creation.

    Also clears every assoc entry pointing at a culled landmark — culled
    slots return to the free list (ma.add_landmarks) and must carry no
    stale references when recycled."""
    age = current_kf - m.lms.first_kf
    ratio = m.lms.found.astype(jnp.float32) / jnp.maximum(m.lms.visible, 1).astype(jnp.float32)
    bad = (ratio < 0.25) & (age >= 2)
    bad = bad | ((age >= 2) & (age <= 3) & (m.lms.n_obs <= 2))
    bad = bad & m.lms.valid
    valid = m.lms.valid & ~bad
    assoc = jnp.where(
        (m.assoc >= 0) & bad[jnp.clip(m.assoc, 0)], -1, m.assoc
    )
    return m._replace(lms=m.lms._replace(valid=valid), assoc=assoc)


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
    landmark observations and clear its slot. Keyframe slots stay
    append-only (`kfs.valid` gates every downstream query); landmarks left
    with fewer than 2 observations are invalidated and their remaining
    assoc entries cleared (MapPoint::EraseObservation's nObs guard), which
    returns their slots to the landmark free list."""
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
    starved = m.lms.valid & (n_obs < 2)
    valid = m.lms.valid & ~starved
    assoc = jnp.where(
        (assoc >= 0) & starved[jnp.clip(assoc, 0)], -1, assoc
    )
    return m._replace(
        kfs=kfs, assoc=assoc, lms=m.lms._replace(n_obs=n_obs, valid=valid)
    )
