"""Covisibility-group score accumulation in candidate retrieval
(KeyFrameDatabase::DetectLoopCandidates / DetectRelocalizationCandidates,
round-2 VERDICT item 8): a covisible cluster of medium scores out-votes a
lone high scorer (perceptual aliasing suppression)."""

import numpy as np

from viorb_tpu.ops import bow


def test_group_accumulate_outvotes_lone_scorer():
    # candidates: KF 0 lone (score .5); KFs 1,2,3 covisible cluster
    # (scores .4, .35, .3). Per-KF 0.75-cut keeps {0, 1}; group
    # accumulation ranks the cluster (acc 1.05) first and CUTS the lone
    # scorer (0.5 < 0.75 * 1.05).
    sc = np.array([0.5, 0.4, 0.35, 0.3, 0.1])
    cand = np.array([True, True, True, True, False])
    covis = np.zeros((5, 5), np.int32)
    for a, b in [(1, 2), (1, 3), (2, 3)]:
        covis[a, b] = covis[b, a] = 30  # >= 15 shared landmarks
    out = bow._group_accumulate(sc, cand, covis, top=5)
    assert out[0] == 1, out  # cluster's best member leads
    assert 0 not in out, out  # lone scorer suppressed

    # without covisibility info the old per-KF gate keeps the lone scorer
    cw = np.full(5, 10)
    legacy = bow._gate_reloc(cw, sc, top=5)
    assert legacy[0] == 0


def test_group_accumulate_dedups_best_member():
    # two candidates in the SAME group must produce one retrieval entry
    # (the group's best member), not two
    sc = np.array([0.2, 0.4, 0.38])
    cand = np.array([True, True, True])
    covis = np.zeros((3, 3), np.int32)
    covis[1, 2] = covis[2, 1] = 40
    out = bow._group_accumulate(sc, cand, covis, top=5)
    assert out.count(1) == 1
    assert 2 not in out  # group represented by its best member only


def test_query_frame_group_path():
    """End-to-end through DescriptorIndex.query_frame: the reloc candidate
    list changes when the covisibility matrix is supplied — the cluster
    member wins over an aliased lone keyframe."""
    rng = np.random.default_rng(0)
    idx = bow.DescriptorIndex(max_kfs=8)
    base = rng.integers(0, 2, (64, 256)).astype(bool)

    def pm1_of(bits):
        return np.where(bits, 1, -1).astype(np.int8)

    def perturb(bits, n):
        b = bits.copy()
        for _ in range(n):
            r = rng.integers(0, 64, 1)
            c = rng.integers(0, 256, 8)
            b[r, c] ^= True
        return b

    valid = np.ones(64, bool)
    # KF 0: aliased lone keyframe (fairly close to the query)
    idx.add(0, pm1_of(perturb(base, 6)), valid)
    # KFs 1-3: the true place, a covisible cluster (closer as a group)
    for k in (1, 2, 3):
        idx.add(k, pm1_of(perturb(base, 8)), valid)
    covis = np.zeros((4, 4), np.int32)
    for a, b in [(1, 2), (1, 3), (2, 3)]:
        covis[a, b] = covis[b, a] = 30

    q = pm1_of(perturb(base, 2))
    with_groups = idx.query_frame(q, valid, 4, covis=covis)
    assert with_groups, "group path returned no candidates"
    assert with_groups[0] in (1, 2, 3), with_groups
