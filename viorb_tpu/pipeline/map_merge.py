"""Multi-session map merging: align, concatenate, fuse, jointly optimize.

The reference has no map persistence at all (`SaveMap/LoadMap` are an
explicit TODO, `/root/reference/include/System.h:185-187`), so multi-session
mapping is a capability the TPU build adds on top of the reference's own
loop-closing machinery (BASELINE.json config 5: "Multi-session EuRoC
MH_01-05 merged map, distributed BA sharded across N>=2 hosts"). Every
geometric ingredient reuses the loop-closing stack:

1. `detect_overlap`   — BoW retrieval of session-1 keyframes that look like
   session-2 keyframes (KeyFrameDatabase::DetectLoopCandidates semantics,
   across maps instead of within one);
2. `compute_cross_sim3` — descriptor matching + Sim3 RANSAC + LM refine
   between one keyframe of each session (LoopClosing::ComputeSim3
   semantics, across maps), lifted to a world-frame similarity
   S_w1<-w2 = T_c1w1^-1 * S_c1c2 * T_c2w2;
3. `apply_sim3`       — move all of session 2 (poses, landmarks, NavStates)
   into session 1's world frame (the whole-session analog of CorrectLoop's
   covisible-group propagation);
4. `concat_maps`      — append session 2's keyframe/landmark tables into
   one fixed-shape MapArrays (landmark ids shifted);
5. `fuse_duplicates`  — matched landmark pairs collapse to the session-1
   landmark (SearchAndFuse semantics);
6. joint global BA    — single-chip (`loop_closing.global_bundle_adjustment`)
   or landmark-sharded across a device mesh
   (`parallel.dist_ba.distributed_bundle_adjust_vision`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..map import arrays as ma
from ..ops import bow, matching
from ..solver import sim3 as sim3_mod
from ..solver.ba import Camera, VisionBAState
from . import local_mapping, loop_closing


# ----------------------------------------------------------------------------
# 1. Cross-session overlap detection (BoW).
# ----------------------------------------------------------------------------


def detect_overlap(
    m1: ma.MapArrays,
    m2: ma.MapArrays,
    top_per_kf: int = 3,
    max_pairs: int = 10,
    vocabulary_path: str | None = None,
) -> list[tuple[int, int]]:
    """Candidate (kf2, kf1) pairs: for each session-2 keyframe, the
    session-1 keyframes whose BoW vectors match best. Pairs are returned
    most-promising first (by how often a kf1 is retrieved and its rank)."""
    n1, n2 = int(m1.n_kfs), int(m2.n_kfs)
    index = bow.make_index(n1, vocabulary_path=vocabulary_path)
    for k in range(n1):
        index.add(k, m1.kfs.feat_pm1[k], m1.kfs.feat_valid[k])
    votes: dict[tuple[int, int], float] = {}
    for k2 in range(n2):
        cands = index.query_frame(
            m2.kfs.feat_pm1[k2], m2.kfs.feat_valid[k2], n1, top=top_per_kf
        )
        for rank, k1 in enumerate(cands):
            votes[(k2, int(k1))] = votes.get((k2, int(k1)), 0.0) + (
                top_per_kf - rank
            )
    pairs = sorted(votes, key=lambda p: -votes[p])
    return pairs[:max_pairs]


# ----------------------------------------------------------------------------
# 2. Cross-session Sim3.
# ----------------------------------------------------------------------------


class CrossSim3(NamedTuple):
    # world-frame similarity session-2 -> session-1: X_w1 = s * R @ X_w2 + t
    R: np.ndarray
    t: np.ndarray
    s: float
    kf1: int
    kf2: int
    n_inliers: int
    # matched landmark pairs (lm1_id, lm2_id) — inlier correspondences
    lm_pairs: np.ndarray  # (P, 2) int


def compute_cross_sim3(
    m1: ma.MapArrays,
    m2: ma.MapArrays,
    kf1: int,
    kf2: int,
    cam: Camera,
    key: jax.Array,
    fix_scale: bool = False,
    min_inliers: int = 20,
) -> CrossSim3 | None:
    """Sim3 between session-1 keyframe kf1 and session-2 keyframe kf2 from
    their landmark-bearing feature matches (ComputeSim3 across two maps)."""
    dist = matching.hamming_matrix(m1.kfs.feat_pm1[kf1], m2.kfs.feat_pm1[kf2])
    has1 = (m1.assoc[kf1] >= 0) & m1.kfs.feat_valid[kf1]
    has2 = (m2.assoc[kf2] >= 0) & m2.kfs.feat_valid[kf2]
    allowed = has1[:, None] & has2[None, :]
    res = matching.best_match(
        dist, allowed, max_dist=matching.TH_LOW, ratio=0.75
    )
    res = matching.mutual_filter(res, dist.shape[1])
    if int(res.valid.sum()) < min_inliers:
        return None

    lm1 = jnp.clip(m1.assoc[kf1], 0)
    lm2 = jnp.clip(m2.assoc[kf2][jnp.clip(res.idx, 0)], 0)
    ok = res.valid & m1.lms.valid[lm1] & m2.lms.valid[lm2]
    # camera-frame positions in each session
    X1 = (
        jnp.einsum("ij,nj->ni", m1.kfs.Rcw[kf1], m1.lms.pos[lm1])
        + m1.kfs.tcw[kf1]
    )
    X2 = (
        jnp.einsum("ij,nj->ni", m2.kfs.Rcw[kf2], m2.lms.pos[lm2])
        + m2.kfs.tcw[kf2]
    )
    sig1 = m1.kfs.feat_sigma2[kf1]
    sig2 = m2.kfs.feat_sigma2[kf2][jnp.clip(res.idx, 0)]
    r = sim3_mod.sim3_ransac(
        X1, X2, ok, sig1, sig2, cam, key, fix_scale=fix_scale
    )
    if int(r.n_inliers) < min_inliers:
        return None
    R12, t12, s12, inl, n_inl = sim3_mod.optimize_sim3(
        r.R12, r.t12, r.s12, X1, X2, r.inliers, sig1, sig2, cam,
        fix_scale=fix_scale,
    )
    if int(n_inl) < min_inliers:
        return None

    # lift S_c1c2 to the world-frame similarity S_w1<-w2:
    # X_c1 = R1w X_w1 + t1w,  X_c2 = R2w X_w2 + t2w,  X_c1 = s R12 X_c2 + t12
    # => X_w1 = R1w^T (s R12 R2w X_w2 + s R12 t2w + t12 - t1w)
    R1w = np.asarray(m1.kfs.Rcw[kf1]).astype(np.float64)
    t1w = np.asarray(m1.kfs.tcw[kf1]).astype(np.float64)
    R2w = np.asarray(m2.kfs.Rcw[kf2]).astype(np.float64)
    t2w = np.asarray(m2.kfs.tcw[kf2]).astype(np.float64)
    R12n = np.asarray(R12).astype(np.float64)
    t12n = np.asarray(t12).astype(np.float64)
    s = float(s12)
    Rw = R1w.T @ R12n @ R2w
    tw = R1w.T @ (s * (R12n @ t2w) + t12n - t1w)

    inl_np = np.asarray(inl)
    pairs = np.stack(
        [np.asarray(lm1)[inl_np], np.asarray(lm2)[inl_np]], axis=1
    )
    return CrossSim3(
        R=Rw, t=tw, s=s, kf1=kf1, kf2=kf2,
        n_inliers=int(n_inl), lm_pairs=pairs,
    )


# ----------------------------------------------------------------------------
# 3. Whole-session similarity transform.
# ----------------------------------------------------------------------------


def apply_sim3(m: ma.MapArrays, R: np.ndarray, t: np.ndarray, s: float) -> ma.MapArrays:
    """Move an entire map through the world similarity X' = s R X + t.

    Camera poses: Rcw' = Rcw R^T, tcw' = s*tcw - Rcw' t (keeps image
    observations fixed; depths scale by s). NavStates follow the body:
    P' = s R P + t, Rwb' = R Rwb, v' = s R v (velocity scales like the map,
    as in Map::UpdateScale after VIO init)."""
    Rj = jnp.asarray(R, m.kfs.Rcw.dtype)
    tj = jnp.asarray(t, m.kfs.tcw.dtype)
    sj = jnp.asarray(s, m.kfs.tcw.dtype)
    Rcw_new = jnp.einsum("kij,lj->kil", m.kfs.Rcw, Rj)  # Rcw @ R^T
    tcw_new = sj * m.kfs.tcw - jnp.einsum("kij,j->ki", Rcw_new, tj)
    nav = m.kfs.nav
    nav = nav._replace(
        p=sj * jnp.einsum("ij,kj->ki", Rj, nav.p) + tj[None],
        R=jnp.einsum("ij,kjl->kil", Rj, nav.R),
        v=sj * jnp.einsum("ij,kj->ki", Rj, nav.v),
    )
    kfs = m.kfs._replace(Rcw=Rcw_new, tcw=tcw_new, nav=nav)
    lms = m.lms._replace(
        pos=sj * jnp.einsum("ij,lj->li", Rj, m.lms.pos) + tj[None],
        normal=jnp.einsum("ij,lj->li", Rj, m.lms.normal),
        dist_min=m.lms.dist_min * sj,
        dist_max=m.lms.dist_max * sj,
    )
    return m._replace(kfs=kfs, lms=lms)


# ----------------------------------------------------------------------------
# 4. Concatenation.
# ----------------------------------------------------------------------------


def concat_maps(
    m1: ma.MapArrays, m2: ma.MapArrays, cap: ma.Capacities | None = None
) -> ma.MapArrays:
    """One MapArrays holding both sessions: session-2 keyframes appended
    after session-1's, landmark ids shifted by session-1's count."""
    n1, n2 = int(m1.n_kfs), int(m2.n_kfs)
    l1, l2 = int(m1.n_lms), int(m2.n_lms)
    N = m1.assoc.shape[1]
    assert m2.assoc.shape[1] == N, "feature capacity mismatch"
    if cap is None:
        # round the landmark capacity up to a multiple of 64 so the merged
        # map shards evenly for distributed BA (partition_observations
        # requires n_landmarks % n_shards == 0)
        L = -(-(l1 + l2 + 1) // 64) * 64
        cap = ma.Capacities(max_kfs=n1 + n2, max_lms=L, n_feat=N)
    assert cap.max_kfs >= n1 + n2 and cap.max_lms >= l1 + l2 + 1

    out = ma.empty_map(cap, dtype=m1.kfs.tcw.dtype)

    def put(dst, src1, n_a, src2, n_b):
        dst = dst.at[:n_a].set(src1[:n_a])
        return dst.at[n_a : n_a + n_b].set(src2[:n_b])

    kfs = out.kfs._replace(
        **{
            f: put(getattr(out.kfs, f), getattr(m1.kfs, f), n1,
                   getattr(m2.kfs, f), n2)
            for f in out.kfs._fields
            if f != "nav"
        },
        nav=jax.tree.map(
            lambda d, a, b: put(d, a, n1, b, n2),
            out.kfs.nav, m1.kfs.nav, m2.kfs.nav,
        ),
    )
    lms = out.lms._replace(
        **{
            f: put(getattr(out.lms, f), getattr(m1.lms, f), l1,
                   getattr(m2.lms, f), l2)
            for f in out.lms._fields
            if f != "first_kf"
        },
        first_kf=put(
            out.lms.first_kf, m1.lms.first_kf, l1, m2.lms.first_kf + n1, l2
        ),
    )
    a2 = jnp.where(m2.assoc[:n2] >= 0, m2.assoc[:n2] + l1, -1)
    assoc = out.assoc.at[:n1].set(m1.assoc[:n1]).at[n1 : n1 + n2].set(a2)
    return out._replace(
        kfs=kfs, lms=lms, assoc=assoc,
        n_kfs=jnp.asarray(n1 + n2, jnp.int32),
        n_lms=jnp.asarray(l1 + l2, jnp.int32),
    )


# ----------------------------------------------------------------------------
# 5. Duplicate-landmark fusion.
# ----------------------------------------------------------------------------


def fuse_duplicates(m: ma.MapArrays, lm_pairs: np.ndarray) -> ma.MapArrays:
    """Collapse each (keep_id, dup_id) pair: every association pointing at
    dup is rewritten to keep; the duplicate slot is invalidated
    (MapPoint::Replace / LoopClosing::SearchAndFuse semantics)."""
    if len(lm_pairs) == 0:
        return m
    L = m.lms.pos.shape[0]
    lut = np.arange(L)
    lut[lm_pairs[:, 1]] = lm_pairs[:, 0]
    # resolve chains keep<-dup<-dup2 (rare; one extra hop suffices here)
    lut = lut[lut]
    assoc = np.asarray(m.assoc)
    assoc = np.where(assoc >= 0, lut[np.maximum(assoc, 0)], assoc)
    valid = np.array(m.lms.valid)
    n_obs = np.array(m.lms.n_obs)
    n_obs[lm_pairs[:, 0]] += n_obs[lm_pairs[:, 1]]
    valid[lm_pairs[:, 1]] = False
    return m._replace(
        assoc=jnp.asarray(assoc),
        lms=m.lms._replace(
            valid=jnp.asarray(valid), n_obs=jnp.asarray(n_obs)
        ),
    )


# ----------------------------------------------------------------------------
# 6. Full merge driver.
# ----------------------------------------------------------------------------


class MergeResult(NamedTuple):
    map: ma.MapArrays
    kf1: int
    kf2: int
    n_inliers: int
    n_fused: int
    scale: float


def merge_sessions(
    m1: ma.MapArrays,
    m2: ma.MapArrays,
    cam: Camera,
    key: jax.Array,
    fix_scale: bool = False,
    run_global_ba: bool = True,
    mesh=None,
    vocabulary_path: str | None = None,
    cap: ma.Capacities | None = None,
) -> MergeResult | None:
    """Merge session 2 into session 1's world frame. Returns None when no
    overlap with a valid Sim3 is found. With `mesh`, the joint global BA
    runs landmark-sharded over the device mesh (distributed Schur BA)."""
    pairs = detect_overlap(m1, m2, vocabulary_path=vocabulary_path)
    cross = None
    for k2, k1 in pairs:
        key, sub = jax.random.split(key)
        cross = compute_cross_sim3(m1, m2, k1, k2, cam, sub, fix_scale=fix_scale)
        if cross is not None:
            break
    if cross is None:
        return None

    m2_aligned = apply_sim3(m2, cross.R, cross.t, cross.s)
    merged = concat_maps(m1, m2_aligned, cap=cap)
    l1 = int(m1.n_lms)
    n1 = int(m1.n_kfs)
    pairs_glob = cross.lm_pairs.copy()
    pairs_glob[:, 1] += l1  # session-2 ids shifted by concat
    merged = fuse_duplicates(merged, pairs_glob)

    if run_global_ba:
        if mesh is None:
            merged = loop_closing.global_bundle_adjustment(merged, cam)
        else:
            merged = _distributed_global_ba(merged, cam, mesh)
    return MergeResult(
        map=merged, kf1=cross.kf1, kf2=cross.kf2 + n1,
        n_inliers=cross.n_inliers, n_fused=len(pairs_glob),
        scale=cross.s,
    )


def _distributed_global_ba(m: ma.MapArrays, cam: Camera, mesh) -> ma.MapArrays:
    """Full-map BA sharded by landmark blocks over the mesh (the merged-map
    analog of LoopClosing::RunGlobalBundleAdjustment, scaled out)."""
    from ..parallel import dist_ba

    n = int(m.n_kfs)
    K = m.assoc.shape[0]
    ids = jnp.arange(K, dtype=jnp.int32)
    ids = jnp.where(ids < n, ids, -1)
    fixed = ids <= 0
    obs = local_mapping.gather_ba_problem(m, jnp.clip(ids, 0), cam)
    valid = np.asarray(obs.valid & (ids >= 0)[obs.cam_idx])
    L = m.lms.pos.shape[0]
    n_shards = mesh.shape["lm"]
    obs_sh, _ = dist_ba.partition_observations(
        np.asarray(obs.cam_idx), np.asarray(obs.lm_idx),
        np.asarray(obs.uv), np.asarray(obs.inv_sigma2), valid,
        L, n_shards,
        obs_per_shard=int(np.ceil(max(valid.sum(), 1) / n_shards)) + 8,
    )
    state = VisionBAState(Rcw=m.kfs.Rcw, tcw=m.kfs.tcw, points=m.lms.pos)
    out, _ = dist_ba.distributed_bundle_adjust_vision(
        state, obs_sh, cam, fixed, mesh
    )
    kfs = m.kfs._replace(Rcw=out.Rcw, tcw=out.tcw)
    return m._replace(kfs=kfs, lms=m.lms._replace(pos=out.points))
