"""Hamming-distance descriptor matching as MXU matmuls.

Replaces the reference `ORBmatcher` (`/root/reference/src/ORBmatcher.cc`,
`include/ORBmatcher.h:48-83`) — per-feature loops over grid cells with
popcount distance — with one dense distance matrix per search:

    hamming(a, b) = (256 - dot(a_pm1, b_pm1)) / 2

where a_pm1 in {-1,+1}^256 (int8). The (N, 256) x (256, M) int8 matmul is
exactly MXU-shaped; all gating (search windows, octave compatibility,
already-matched masks) becomes additive penalties on the distance matrix,
and the best/second-best + ratio + rotation-histogram logic is a handful of
row reductions.

Constants mirror ORBmatcher.cc:37-39: TH_LOW=50, TH_HIGH=100,
HISTO_LENGTH=30 rotation bins (top-3 kept).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TH_LOW = 50
TH_HIGH = 100
HISTO_LENGTH = 30
BIG = 1e9


def hamming_matrix(pm1_a: jax.Array, pm1_b: jax.Array) -> jax.Array:
    """(N, 256) x (M, 256) int8 {-1,+1} -> (N, M) float32 Hamming distance."""
    dots = jax.lax.dot_general(
        pm1_a, pm1_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (256 - dots).astype(jnp.float32) * 0.5


class MatchResult(NamedTuple):
    idx: jax.Array  # (N,) best column per row (-1 if no match)
    dist: jax.Array  # (N,) best distance
    valid: jax.Array  # (N,) bool


def best_match(
    dist: jax.Array,
    allowed: jax.Array,
    max_dist: float = TH_LOW,
    ratio: float | None = None,
) -> MatchResult:
    """Row-wise best match with optional best/second-best ratio test.

    `allowed` (N, M) bool gates candidates; disallowed entries get +BIG.
    The ratio test mirrors ORBmatcher's `mfNNratio` check (best <
    ratio * second, applied when second exists).
    """
    d = jnp.where(allowed, dist, BIG)
    best_d, best_i = jax.lax.top_k(-d, 2)
    best_d = -best_d  # (N, 2) ascending
    ok = best_d[:, 0] <= max_dist
    if ratio is not None:
        second_ok = best_d[:, 1] >= BIG * 0.5  # no real second candidate
        ok = ok & (second_ok | (best_d[:, 0] < ratio * best_d[:, 1]))
    return MatchResult(
        idx=jnp.where(ok, best_i[:, 0], -1),
        dist=best_d[:, 0],
        valid=ok,
    )


def fused_match(
    pm1_a: jax.Array,
    pm1_b: jax.Array,
    allowed: jax.Array,
    max_dist: float = TH_LOW,
    ratio: float | None = None,
) -> MatchResult:
    """`best_match(hamming_matrix(a, b), allowed, ...)` without the (N, M)
    distance matrix round-trip to HBM: on TPU the distance matmul and the
    top-2 reduction run fused in one Pallas kernel (ops/pallas_match.py);
    elsewhere this is exactly the dense path."""
    from . import pallas_match

    if pallas_match.available():
        best_d, second_d, best_i = pallas_match.fused_top2(
            pm1_a, pm1_b, allowed
        )
        ok = best_d <= max_dist
        if ratio is not None:
            second_ok = second_d >= BIG * 0.5
            ok = ok & (second_ok | (best_d < ratio * second_d))
        return MatchResult(
            idx=jnp.where(ok, best_i, -1), dist=best_d, valid=ok
        )
    return best_match(
        hamming_matrix(pm1_a, pm1_b), allowed, max_dist=max_dist, ratio=ratio
    )


def mutual_filter(res_ab: MatchResult, n_b: int) -> MatchResult:
    """Enforce one-to-one: if two rows claim the same column, keep the
    closer one (the reference erases the previous match when a better one
    appears, e.g. SearchForInitialization)."""
    n_a = res_ab.idx.shape[0]
    col = jnp.where(res_ab.valid, res_ab.idx, n_b)
    # best distance per column
    col_best = jnp.full((n_b + 1,), jnp.inf).at[col].min(res_ab.dist)
    keep = res_ab.valid & (res_ab.dist <= col_best[col])
    # tie-break duplicates deterministically: first row wins
    first_row = jnp.full((n_b + 1,), n_a).at[col].min(
        jnp.where(keep, jnp.arange(n_a), n_a)
    )
    keep = keep & (first_row[col] == jnp.arange(n_a))
    return res_ab._replace(valid=keep, idx=jnp.where(keep, res_ab.idx, -1))


def rotation_consistency(
    angle_a: jax.Array, angle_b: jax.Array, match: MatchResult
) -> MatchResult:
    """Keep only matches whose angle difference falls in the top-3 of 30
    histogram bins (ORBmatcher::ComputeThreeMaxima semantics)."""
    da = (angle_a - angle_b[match.idx]) % (2 * jnp.pi)
    bins = jnp.floor(da / (2 * jnp.pi) * HISTO_LENGTH).astype(jnp.int32) % HISTO_LENGTH
    counts = jnp.zeros(HISTO_LENGTH, jnp.int32).at[bins].add(match.valid.astype(jnp.int32))
    top3 = jax.lax.top_k(counts, 3)[1]
    # reference also drops bins with <10% of the max count
    cmax = jnp.max(counts)
    good_bin = jnp.zeros(HISTO_LENGTH, bool).at[top3].set(counts[top3] * 10 >= cmax)
    keep = match.valid & good_bin[bins]
    return match._replace(valid=keep, idx=jnp.where(keep, match.idx, -1))


# ----------------------------------------------------------------------------
# Search routines (gating mask builders + the generic matcher above)
# ----------------------------------------------------------------------------


def window_mask(
    uv_query: jax.Array,  # (N, 2) predicted positions in the target image
    uv_target: jax.Array,  # (M, 2) feature positions
    radius: jax.Array,  # (N,) or scalar search radius in px
    oct_query: jax.Array | None = None,  # (N,) expected octave
    oct_target: jax.Array | None = None,  # (M,)
    oct_lo: int = 0,
    oct_hi: int = 0,
) -> jax.Array:
    """(N, M) bool: target feature within radius and octave window.

    Mirrors Frame::GetFeaturesInArea + the per-call octave gates of the
    SearchByProjection overloads (ORBmatcher.cc): candidate octave must be
    in [oct_query + oct_lo, oct_query + oct_hi].
    """
    d2 = jnp.sum((uv_query[:, None, :] - uv_target[None, :, :]) ** 2, axis=-1)
    r = jnp.broadcast_to(jnp.asarray(radius), uv_query.shape[:1])
    m = d2 <= (r**2)[:, None]
    if oct_query is not None and oct_target is not None:
        lo = oct_query[:, None] + oct_lo
        hi = oct_query[:, None] + oct_hi
        m = m & (oct_target[None, :] >= lo) & (oct_target[None, :] <= hi)
    return m


def search_by_projection(
    pm1_query: jax.Array,  # (N, 256) int8 descriptors of the map points
    pm1_frame: jax.Array,  # (M, 256) frame descriptors
    uv_pred: jax.Array,  # (N, 2) projected positions
    uv_frame: jax.Array,  # (M, 2)
    radius,  # per-query or scalar radius
    valid_query: jax.Array,
    valid_frame: jax.Array,
    oct_query=None,
    oct_frame=None,
    oct_lo=0,
    oct_hi=0,
    max_dist=TH_HIGH,
    ratio=None,
) -> MatchResult:
    """Generic projection-window search (all 4 SearchByProjection overloads
    reduce to this with different radii/octave gates/ratio settings).

    On TPU the whole gate (window radius, octave range, validity) is
    evaluated inside the fused Pallas kernel, so the (N, M) mask never
    exists in HBM; elsewhere the dense mask + top-k path runs."""
    from . import pallas_match

    if pallas_match.available():
        N, M = pm1_query.shape[0], pm1_frame.shape[0]
        rad = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (N,))
        no_oct = oct_query is None or oct_frame is None
        best_d, second_d, best_i = pallas_match.fused_top2_window(
            pm1_query, pm1_frame, uv_pred, uv_frame, rad,
            jnp.zeros((N,), jnp.float32) if no_oct else oct_query,
            jnp.zeros((M,), jnp.float32) if no_oct else oct_frame,
            valid_query, valid_frame,
            oct_lo=-100 if no_oct else oct_lo,
            oct_hi=100 if no_oct else oct_hi,
        )
        ok = best_d <= max_dist
        if ratio is not None:
            second_ok = second_d >= BIG * 0.5
            ok = ok & (second_ok | (best_d < ratio * second_d))
        return MatchResult(idx=jnp.where(ok, best_i, -1), dist=best_d, valid=ok)

    allowed = window_mask(uv_pred, uv_frame, radius, oct_query, oct_frame, oct_lo, oct_hi)
    allowed = allowed & valid_query[:, None] & valid_frame[None, :]
    return best_match(hamming_matrix(pm1_query, pm1_frame), allowed, max_dist=max_dist, ratio=ratio)


def search_for_initialization(
    feats_a, feats_b, window: float = 100.0, ratio: float = 0.9
) -> MatchResult:
    """Level-0 window search between two init frames
    (ORBmatcher::SearchForInitialization)."""
    dist = hamming_matrix(feats_a.desc_pm1, feats_b.desc_pm1)
    allowed = window_mask(feats_a.xy, feats_b.xy, window)
    allowed = allowed & (feats_a.octave[:, None] == 0) & (feats_b.octave[None, :] == 0)
    allowed = allowed & feats_a.valid[:, None] & feats_b.valid[None, :]
    res = best_match(dist, allowed, max_dist=TH_LOW, ratio=ratio)
    res = mutual_filter(res, feats_b.xy.shape[0])
    return rotation_consistency(feats_a.angle, feats_b.angle, res)


def epipolar_mask(
    F12: jax.Array,  # (3,3) fundamental matrix from image 1 to 2
    uv1: jax.Array,  # (N, 2)
    uv2: jax.Array,  # (M, 2)
    sigma2_2: jax.Array,  # (M,) level variance of features in image 2
    thresh: float = 3.84,
) -> jax.Array:
    """(N, M) bool: point-to-epipolar-line distance test
    (ORBmatcher::CheckDistEpipolarLine: dsqr < 3.84 * sigma2)."""
    ones1 = jnp.ones_like(uv1[:, :1])
    p1 = jnp.concatenate([uv1, ones1], axis=-1)  # (N, 3)
    lines = p1 @ F12.T  # (N, 3) epipolar lines in image 2
    num = lines[:, None, 0] * uv2[None, :, 0] + lines[:, None, 1] * uv2[None, :, 1] + lines[:, None, 2:3][..., 0]
    den = lines[:, 0:1] ** 2 + lines[:, 1:2] ** 2
    dsqr = num**2 / jnp.maximum(den, 1e-12)
    return dsqr < thresh * sigma2_2[None, :]


def search_for_triangulation(
    feats1, feats2, F12: jax.Array, ratio: float | None = None
) -> MatchResult:
    """Epipolar-constrained matching of unmatched features
    (ORBmatcher::SearchForTriangulation; the BoW-node pre-gating is replaced
    by the dense distance matrix, which subsumes it)."""
    dist = hamming_matrix(feats1.desc_pm1, feats2.desc_pm1)
    allowed = epipolar_mask(F12, feats1.xy, feats2.xy, feats2.sigma2)
    allowed = allowed & feats1.valid[:, None] & feats2.valid[None, :]
    res = best_match(dist, allowed, max_dist=TH_LOW, ratio=ratio)
    res = mutual_filter(res, feats2.xy.shape[0])
    return rotation_consistency(feats1.angle, feats2.angle, res)
