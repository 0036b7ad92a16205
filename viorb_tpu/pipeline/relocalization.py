"""Relocalization after tracking loss (Tracking::Relocalization).

Mirrors `/root/reference/src/Tracking.cc:2565-2727`:
1. BoW candidate keyframes (KeyFrameDatabase::DetectRelocalizationCandidates,
   KeyFrameDatabase.cc: common-word >= 0.8*max filter + covisibility-group
   score accumulation, 0.75*best cut);
2. per candidate: descriptor matching between the frame and the keyframe's
   landmarks (SearchByBoW, >= 15 matches required);
3. EPnP RANSAC (solver/pnp.py) for an initial pose;
4. LM pose optimization; if < 50 inliers, grow matches by projection
   search (th=10 then th=3) and re-optimize; success at >= 50 inliers.

The VI-mode post-relocalization bias/velocity recomputation
(Tracking::RecomputeIMUBiasAndCurrentNavstate, Tracking.cc:111-279) lives in
`recompute_bias_after_reloc` below.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..map import arrays as ma
from ..ops import bow, imu as imu_ops, matching
from ..solver import pnp, pose as pose_opt
from ..solver.ba import Camera
from ..utils import lie
from .tracking import FrameData


def detect_reloc_candidates(
    index,
    frame_pm1: jax.Array,
    frame_valid: jax.Array,
    n_kfs: int,
    top: int = 5,
    covis: np.ndarray | None = None,
) -> list[int]:
    """Relocalization candidates for a (non-keyframe) query frame.

    DetectRelocalizationCandidates semantics: no covisibility exclusion (any
    keyframe may relocalize the frame), common-word gating, then
    covisibility-group score accumulation with the 0.75*best cut
    (KeyFrameDatabase.cc). Works with either index backend
    (LSH `DescriptorIndex` or native `VocabDescriptorIndex`)."""
    return index.query_frame(frame_pm1, frame_valid, n_kfs, top, covis=covis)


class RelocResult(NamedTuple):
    Rcw: np.ndarray
    tcw: np.ndarray
    assoc: np.ndarray  # (N,) landmark id per frame feature (-1 none)
    n_inliers: int
    kf_id: int


import functools


@functools.lru_cache(maxsize=None)
def _attempt_kernel(cam: Camera, min_matches: int, min_inliers: int):
    """One relocalization candidate attempt — matching, EPnP RANSAC, LM
    pose optimization, conditional projection-search growth + re-opt — as
    ONE jitted program. (Eagerly-executed pose_optimize_vision fori_loops
    abort/segfault the XLA:CPU compiler at image-e2e sizes, and cost
    seconds of remote round-trips on the TPU tunnel.)"""

    def attempt(m, frame, kf, key):
        dist = matching.hamming_matrix(frame.feats.desc_pm1, m.kfs.feat_pm1[kf])
        kf_has = (m.assoc[kf] >= 0) & m.kfs.feat_valid[kf]
        allowed = frame.feats.valid[:, None] & kf_has[None, :]
        res = matching.best_match(
            dist, allowed, max_dist=matching.TH_LOW, ratio=0.75
        )
        res = matching.mutual_filter(res, dist.shape[1])
        n_match = res.valid.sum().astype(jnp.int32)

        lm_ids = jnp.where(
            res.valid, m.assoc[kf][jnp.clip(res.idx, 0)], -1
        )
        ok = res.valid & (lm_ids >= 0) & m.lms.valid[jnp.clip(lm_ids, 0)]
        Pw = m.lms.pos[jnp.clip(lm_ids, 0)]

        r = pnp.pnp_ransac(
            Pw, frame.xy_und, ok, frame.feats.sigma2, cam, key
        )
        obs = pose_opt.PoseObs(
            pts=Pw,
            uv=frame.xy_und,
            inv_sigma2=1.0 / frame.feats.sigma2,
            valid=ok & r.inliers,
        )
        Rcw, tcw, inl, n_inl = pose_opt.pose_optimize_vision(
            r.Rcw, r.tcw, obs, cam
        )
        assoc = jnp.where(inl & ok, lm_ids, -1)

        def grow(args):
            Rcw, tcw, assoc, n_inl = args
            # grow by projection search at the optimized pose (th=10)
            pc = m.lms.pos @ Rcw.T + tcw
            z = jnp.maximum(pc[:, 2], 1e-6)
            uv_pred = jnp.stack(
                [cam.fx * pc[:, 0] / z + cam.cx,
                 cam.fy * pc[:, 1] / z + cam.cy], -1,
            )
            res2 = matching.search_by_projection(
                m.lms.pm1, frame.feats.desc_pm1, uv_pred, frame.xy_und,
                radius=10.0,
                valid_query=m.lms.valid & (pc[:, 2] > 0),
                valid_frame=frame.feats.valid,
                max_dist=matching.TH_HIGH,
            )
            add_assoc = jnp.full_like(assoc, -1)
            lm_arange = jnp.arange(m.lms.pos.shape[0], dtype=assoc.dtype)
            add_assoc = add_assoc.at[jnp.clip(res2.idx, 0)].max(
                jnp.where(res2.valid, lm_arange, -1)
            )
            assoc2 = jnp.where(assoc >= 0, assoc, add_assoc)
            obs2 = pose_opt.PoseObs(
                pts=m.lms.pos[jnp.clip(assoc2, 0)],
                uv=frame.xy_und,
                inv_sigma2=1.0 / frame.feats.sigma2,
                valid=(assoc2 >= 0) & frame.feats.valid,
            )
            Rcw2, tcw2, inl2, n2 = pose_opt.pose_optimize_vision(
                Rcw, tcw, obs2, cam
            )
            return Rcw2, tcw2, jnp.where(inl2, assoc2, -1), n2.astype(n_inl.dtype)

        Rcw, tcw, assoc, n_inl = jax.lax.cond(
            (n_inl < min_inliers) & r.success & (n_match >= min_matches),
            grow, lambda a: a, (Rcw, tcw, assoc, n_inl),
        )
        success = (
            r.success & (n_match >= min_matches) & (n_inl >= min_inliers)
        )
        scalars = jnp.stack([
            n_match, n_inl.astype(jnp.int32), success.astype(jnp.int32)
        ])
        return Rcw, tcw, assoc.astype(jnp.int32), scalars

    return jax.jit(attempt)


def relocalize(
    m: ma.MapArrays,
    frame: FrameData,
    cam: Camera,
    index: bow.DescriptorIndex,
    key: jax.Array,
    min_matches: int = 15,
    min_inliers: int = 50,
) -> RelocResult | None:
    """Full relocalization attempt for one frame; None if it fails."""
    n_kfs = int(m.n_kfs)
    covis = np.asarray(ma.covisibility_matrix(m))[:n_kfs, :n_kfs]
    cands = detect_reloc_candidates(
        index, frame.feats.desc_pm1, frame.feats.valid, n_kfs, covis=covis
    )
    attempt = _attempt_kernel(cam, min_matches, min_inliers)
    for kf in cands:
        key, sub = jax.random.split(key)
        Rcw, tcw, assoc, scalars = attempt(
            m, frame, jnp.asarray(kf, jnp.int32), sub
        )
        n_match, n_inl, success = (int(x) for x in jax.device_get(scalars))
        if success:
            return RelocResult(
                Rcw=np.asarray(Rcw), tcw=np.asarray(tcw),
                assoc=np.asarray(assoc), n_inliers=n_inl, kf_id=int(kf),
            )
    return None


# ----------------------------------------------------------------------------
# Post-relocalization IMU bias/velocity recomputation (VI mode).
# ----------------------------------------------------------------------------


def recompute_bias_after_reloc(
    Rwb: jax.Array,  # (F, 3, 3) body rotations of the buffered frames
    pwb: jax.Array,  # (F, 3) body positions
    pre: imu_ops.PreintState,  # (F-1,) preintegrations between frames
    gw: jax.Array,
    noise: imu_ops.ImuNoise,
):
    """Gyro bias + accel bias + terminal velocity from ~20 relocalized
    frames (Tracking::RecomputeIMUBiasAndCurrentNavstate,
    Tracking.cc:111-279): gyro bias by the rotation-residual LS
    (OptimizeInitialGyroBias), accel bias by the position-consistency
    linear system with known gravity and scale=1, velocity of the last
    frame from the last preintegration interval.
    """
    from . import vio_init

    F = Rwb.shape[0]
    dtype = Rwb.dtype

    # 1. gyro bias (linear LS on rotation residuals). estimate_gyro_bias
    # indexes pre[i] as the interval ENDING at state i, so prepend a zero
    # slot to our (F-1,) interval array.
    pre_aligned = jax.tree.map(
        lambda z, a: jnp.concatenate([z[None], a], 0),
        imu_ops.PreintState.zero((), dtype), pre,
    )
    bg = vio_init.estimate_gyro_bias(
        Rwb, pre_aligned, jnp.eye(3, dtype=dtype)
    )  # Rcb=I: states already in body frame

    # 2. re-correct deltas with bg via the stored bias Jacobians
    dP = pre.dP + jnp.einsum("nij,j->ni", pre.J_P_bg, bg)
    dV = pre.dV + jnp.einsum("nij,j->ni", pre.J_V_bg, bg)

    # 3. accel bias from position consistency (scale known = 1):
    #    p_{i+1} = p_i + v_i dt + 0.5 g dt^2 + R_i (dP_i + J_P_ba dba)
    # eliminate v_i using the velocity relation over pairs of intervals
    # (the reference solves the stacked linear system with SVD); build
    # one LS over all consecutive triples.
    dt = pre.dt
    rows = []
    rhs = []
    for i in range(F - 2):
        dt1, dt2 = dt[i], dt[i + 1]
        R1, R2 = Rwb[i], Rwb[i + 1]
        p1, p2, p3 = pwb[i], pwb[i + 1], pwb[i + 2]
        # lambda * dba = phi  (3x3 system per triple)
        lam = (
            R1 @ pre.J_P_ba[i] * dt2
            - R1 @ pre.J_V_ba[i] * dt1 * dt2
            - R2 @ pre.J_P_ba[i + 1] * dt1
        )
        phi = (
            (p2 - p1) * dt2
            - (p3 - p2) * dt1
            + R2 @ dP[i + 1] * dt1
            - R1 @ dP[i] * dt2
            + R1 @ dV[i] * dt1 * dt2
            + 0.5 * gw * (dt1 * dt1 * dt2 + dt1 * dt2 * dt2)
        )
        rows.append(lam)
        rhs.append(phi)
    A = jnp.concatenate(rows, 0)  # (3(F-2), 3)
    b = jnp.concatenate(rhs, 0)
    dba, *_ = jnp.linalg.lstsq(A, b)

    # 4. terminal velocity from the last interval
    dP_c = dP + jnp.einsum("nij,j->ni", pre.J_P_ba, dba)
    dV_c = dV + jnp.einsum("nij,j->ni", pre.J_V_ba, dba)
    i = F - 2
    v_last_prev = (
        pwb[i + 1] - pwb[i] - 0.5 * gw * dt[i] ** 2 - Rwb[i] @ dP_c[i]
    ) / jnp.maximum(dt[i], 1e-6)
    v_last = v_last_prev + gw * dt[i] + Rwb[i] @ dV_c[i]
    return bg, dba, v_last
