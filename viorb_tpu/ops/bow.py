"""Place recognition: bag-of-binary-codes over ORB descriptors.

Replaces DBoW2's `TemplatedVocabulary` + `KeyFrameDatabase`
(`/root/reference/Thirdparty/DBoW2`, `src/KeyFrameDatabase.cc`). The
reference's ORBvoc tree (k=10, L=6) is a hierarchical quantizer mapping a
256-bit descriptor to one of ~1e6 leaf words; scoring is L1 between
tf-idf-weighted sparse word histograms. The vocabulary blob is not shipped
with the repo (.MISSING_LARGE_BLOBS), so the build substitutes a
vocabulary-free quantizer with the same API shape:

- `quantize`: word id = descriptor bits gathered at `n_bits` fixed random
  positions (bit-sampling LSH — an implicit balanced binary tree of depth
  n_bits). One gather + pack, batched over all features; no tree walk.
- `bow_vector`: normalized word histogram per keyframe — one scatter-add.
- `score_l1`: DBoW2 L1 score s(v, w) = 2 - |v - w|_1 ... computed as the
  standard 1 - 0.5|v-w|_1 on L1-normalized vectors, batched K x K as one
  matrix op (ScoringObject.cc L1Scoring).
- `DescriptorIndex.query`: loop/reloc candidate retrieval with the
  reference's common-word and min-score gating semantics
  (KeyFrameDatabase::DetectLoopCandidates, KeyFrameDatabase.cc).

Multiple independent codebooks (n_tables) vote to soften LSH variance —
the analog of the vocabulary's direct index levels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class BowParams(NamedTuple):
    n_bits: int = 12  # words per table = 2^n_bits
    n_tables: int = 4
    seed: int = 7


def bit_positions(params: BowParams) -> np.ndarray:
    """(n_tables, n_bits) fixed random bit positions in [0, 256)."""
    rng = np.random.default_rng(params.seed)
    return np.stack(
        [rng.choice(256, params.n_bits, replace=False) for _ in range(params.n_tables)]
    )


def quantize(pm1: jax.Array, positions: jax.Array) -> jax.Array:
    """Word ids for each descriptor: (N, 256) +/-1 descriptors ->
    (n_tables, N) int32 word ids."""
    bits = (pm1 > 0).astype(jnp.int32)  # (N, 256)
    sel = bits[:, positions]  # (N, T, B)
    weights = (2 ** jnp.arange(positions.shape[1], dtype=jnp.int32))[None, None, :]
    return jnp.sum(sel * weights, axis=-1).T  # (T, N)


def bow_vector(pm1: jax.Array, valid: jax.Array, positions: jax.Array, n_words: int):
    """(T, W) L1-normalized word histogram of one keyframe's descriptors."""
    words = quantize(pm1, positions)  # (T, N)
    T = words.shape[0]
    hist = jnp.zeros((T, n_words), jnp.float32)
    hist = hist.at[jnp.arange(T)[:, None], words].add(valid[None, :].astype(jnp.float32))
    norm = jnp.maximum(hist.sum(-1, keepdims=True), 1e-9)
    return hist / norm


def score_l1(v: jax.Array, db: jax.Array) -> jax.Array:
    """L1 similarity of one (T, W) query against (K, T, W) database:
    s = 1 - 0.5 * |v - w|_1, averaged over tables -> (K,)."""
    d = jnp.abs(db - v[None]).sum(-1)  # (K, T)
    return (1.0 - 0.5 * d).mean(-1)


def common_words(v: jax.Array, db: jax.Array) -> jax.Array:
    """Number of shared (table, word) bins with nonzero mass -> (K,).
    The analog of KeyFrameDatabase's shared-word counting."""
    return ((v[None] > 0) & (db > 0)).sum((-1, -2))


class DescriptorIndex:
    """Host-side keyframe database over the bow vectors (array-backed)."""

    def __init__(self, max_kfs: int, params: BowParams = BowParams()):
        self.params = params
        self.positions = jnp.asarray(bit_positions(params))
        self.n_words = 2**params.n_bits
        self.vectors = jnp.zeros(
            (max_kfs, params.n_tables, self.n_words), jnp.float32
        )
        self.n = 0

    def add(self, kf_id: int, pm1: jax.Array, valid: jax.Array):
        v = bow_vector(pm1, valid, self.positions, self.n_words)
        self.vectors = self.vectors.at[kf_id].set(v)
        self.n = max(self.n, kf_id + 1)

    def vector(self, kf_id: int) -> jax.Array:
        return self.vectors[kf_id]

    def compact(self, live_old: np.ndarray):
        """Renumber: new id i holds old id live_old[i] (keyframe-slot
        compaction, map/arrays.compact_keyframes)."""
        n_new = len(live_old)
        keep = self.vectors[np.asarray(live_old)]
        self.vectors = (
            jnp.zeros_like(self.vectors).at[:n_new].set(keep)
        )
        self.n = n_new

    def query(
        self,
        kf_id: int,
        exclude: np.ndarray,  # (K,) bool — covisible KFs + self
        min_score: float,
        top: int = 10,
        covis: np.ndarray | None = None,
        cw: np.ndarray | None = None,
        sc: np.ndarray | None = None,
    ) -> list[int]:
        """Loop-candidate retrieval (DetectLoopCandidates semantics):
        candidates share >= 0.8 * max common words with the query among
        non-excluded KFs and score >= min_score; with a covisibility
        matrix, scores accumulate over each candidate's covisibility group
        (KeyFrameDatabase.cc accAcc 0.75 cut). cw/sc accept precomputed
        common-word/score vectors (LoopCloser.detect batches them into one
        device fetch)."""
        if cw is None:
            v = self.vectors[kf_id]
            db = self.vectors[: self.n]
            cw = np.asarray(common_words(v, db))
            sc = np.asarray(score_l1(v, db))
        else:
            cw = np.asarray(cw[: self.n])
            sc = np.asarray(sc[: self.n])
        mask = ~np.asarray(exclude[: self.n])
        mask[kf_id] = False
        if not mask.any():
            return []
        max_cw = cw[mask].max()
        ok = mask & (cw >= 0.8 * max_cw) & (sc >= min_score)
        if covis is not None:
            n = min(self.n, covis.shape[0])
            return _group_accumulate(sc[:n], ok[:n], covis, top)
        ids = np.where(ok)[0]
        return list(ids[np.argsort(-sc[ids])][:top])

    def query_frame(
        self,
        pm1: jax.Array,
        valid: jax.Array,
        n_kfs: int,
        top: int = 5,
        covis: np.ndarray | None = None,
    ) -> list[int]:
        """Relocalization-candidate retrieval for a (non-keyframe) query
        frame (DetectRelocalizationCandidates semantics: no covisibility
        exclusion, common-word >= 0.8*max gating, then covisibility-group
        accumulation with the 0.75*best cut, KeyFrameDatabase.cc)."""
        v = bow_vector(pm1, valid, self.positions, self.n_words)
        db = self.vectors[: min(self.n, n_kfs)]
        if db.shape[0] == 0:
            return []
        cw = np.asarray(common_words(v, db))
        sc = np.asarray(score_l1(v, db))
        return _gate_reloc(cw, sc, top, covis=covis)

    def min_covisible_score(self, kf_id: int, covis: np.ndarray) -> float:
        """Minimum bow score between the query and its covisible keyframes
        (the reference's adaptive min-score, LoopClosing.cc:172-186)."""
        ids = np.where(covis[: self.n])[0]
        ids = ids[ids != kf_id]
        if len(ids) == 0:
            return 0.0
        sc = np.asarray(score_l1(self.vectors[kf_id], self.vectors[ids]))
        return float(sc.min())


def _group_accumulate(
    sc: np.ndarray,
    cand_mask: np.ndarray,
    covis: np.ndarray,
    top: int,
    rel_cut: float = 0.75,
    group_size: int = 10,
    min_shared: int = 15,
) -> list[int]:
    """Covisibility-group score accumulation
    (KeyFrameDatabase::DetectLoopCandidates /
    DetectRelocalizationCandidates, KeyFrameDatabase.cc): each candidate's
    score is accumulated over its <=10 best covisible keyframes that are
    also candidates; the group is represented by its best-scoring member;
    groups below 0.75x the best accumulated score are cut. A lone high
    scorer is out-voted by a covisible cluster — exactly the behavior that
    suppresses perceptual-aliasing false positives."""
    ids = np.where(cand_mask)[0]
    if len(ids) == 0:
        return []
    results: list[tuple[float, int]] = []
    for c in ids:
        w = covis[c].astype(np.int64).copy()
        w[c] = 0
        nb = np.argsort(-w)[:group_size]
        nb = nb[w[nb] >= min_shared]
        group = np.concatenate([[c], nb])
        in_cand = cand_mask[group]
        members = group[in_cand]
        acc = float(sc[members].sum())
        best_kf = int(members[np.argmax(sc[members])])
        results.append((acc, best_kf))
    best_acc = max(a for a, _ in results)
    seen: set[int] = set()
    out: list[int] = []
    for a, k in sorted(results, reverse=True):
        if a >= rel_cut * best_acc and k not in seen:
            seen.add(k)
            out.append(k)
    return out[:top]


def _gate_reloc(
    cw: np.ndarray, sc: np.ndarray, top: int, covis: np.ndarray | None = None
) -> list[int]:
    """Shared reloc-candidate gating: common-word >= 0.8*max, then the
    covisibility-group accumulation with the 0.75*best cut (falls back to
    per-KF 0.75*best gating when no covisibility info is supplied)."""
    max_cw = cw.max()
    if max_cw == 0:
        return []
    mask = cw >= 0.8 * max_cw
    if covis is not None:
        n = min(len(sc), covis.shape[0])
        return _group_accumulate(sc[:n], mask[:n], covis, top)
    ids = np.where(mask)[0]
    ids = ids[np.argsort(-sc[ids])]
    if len(ids) == 0:
        return []
    best = sc[ids[0]]
    ids = ids[sc[ids] >= 0.75 * best]
    return list(ids[:top])


def _pack_descriptors(pm1, valid) -> np.ndarray:
    """(N, 256) +/-1 descriptors -> (M, 32) packed uint8 rows of the valid
    subset, plus the valid row count."""
    bits = np.asarray(pm1 > 0, np.uint8)
    mask = np.asarray(valid, bool)
    return np.packbits(bits[mask], axis=1, bitorder="little")


class VocabDescriptorIndex:
    """Keyframe database over a trained binary vocabulary tree, backed by
    the C++ native runtime (native/src/bow.cpp): DBoW2 TemplatedVocabulary
    quantization + KeyFrameDatabase inverted file, with exactly the
    reference's tf-idf L1 scoring (ScoringObject.cc L1Scoring).

    Drop-in for `DescriptorIndex` (same add/query/query_frame/
    min_covisible_score API); selected by passing a vocabulary path to the
    system/LoopCloser config."""

    def __init__(self, max_kfs: int, vocabulary):
        from ..native import InvertedIndex, Vocabulary

        if isinstance(vocabulary, str):
            vocabulary = Vocabulary.load(vocabulary)
        self.vocab = vocabulary
        self.n_words = self.vocab.n_words
        self.index = InvertedIndex(self.n_words, max_kfs)
        self.n = 0
        self._added = np.zeros(max_kfs, bool)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _quantize(self, pm1, valid):
        packed = _pack_descriptors(pm1, valid)
        if len(packed) == 0:
            return np.empty(0, np.int32), np.empty(0, np.float32)
        return self.vocab.quantize(packed)

    def add(self, kf_id: int, pm1, valid):
        if self._added[kf_id]:
            self.index.clear_doc(kf_id)
        words, weights = self._quantize(pm1, valid)
        self.index.add(kf_id, words, weights)
        self._added[kf_id] = True
        self._cache[kf_id] = (words, weights)
        self.n = max(self.n, kf_id + 1)

    def query(
        self,
        kf_id: int,
        exclude: np.ndarray,
        min_score: float,
        top: int = 10,
        covis: np.ndarray | None = None,
    ) -> list[int]:
        sc, cw = self.index.query(*self._query_vec(kf_id))
        sc, cw = sc[: self.n], cw[: self.n]
        mask = ~np.asarray(exclude[: self.n])
        mask[kf_id] = False
        mask &= self._added[: self.n]
        if not mask.any():
            return []
        max_cw = cw[mask].max()
        if max_cw == 0:
            return []
        ok = mask & (cw >= 0.8 * max_cw) & (sc >= min_score)
        if covis is not None:
            n = min(self.n, covis.shape[0])
            return _group_accumulate(sc[:n], ok[:n], covis, top)
        ids = np.where(ok)[0]
        return list(ids[np.argsort(-sc[ids])][:top])

    def _query_vec(self, kf_id: int):
        # the C ABI does not expose a doc's sparse vector back, so the last
        # quantization per keyframe is kept host-side for re-query
        return self._cache[kf_id]

    def query_frame(
        self, pm1, valid, n_kfs: int, top: int = 5,
        covis: np.ndarray | None = None,
    ) -> list[int]:
        words, weights = self._quantize(pm1, valid)
        if len(words) == 0 or self.n == 0:
            return []
        sc, cw = self.index.query(words, weights)
        k = min(self.n, n_kfs)
        return _gate_reloc(cw[:k], sc[:k], top, covis=covis)

    def min_covisible_score(self, kf_id: int, covis: np.ndarray) -> float:
        ids = np.where(np.asarray(covis[: self.n]) & self._added[: self.n])[0]
        ids = ids[ids != kf_id]
        if len(ids) == 0:
            return 0.0
        return min(self.index.pair_score(kf_id, int(i)) for i in ids)

    def compact(self, live_old: np.ndarray):
        """Renumber docs after keyframe-slot compaction (re-adds the cached
        sparse vectors under the new ids)."""
        cached = [self._cache.get(int(o)) for o in live_old]
        for k in range(self.n):
            if self._added[k]:
                self.index.clear_doc(k)
        self._added[:] = False
        self._cache = {}
        for new_id, vec in enumerate(cached):
            if vec is None:
                continue
            words, weights = vec
            self.index.add(new_id, words, weights)
            self._added[new_id] = True
            self._cache[new_id] = vec
        self.n = len(live_old)


def make_index(
    max_kfs: int,
    params: BowParams = BowParams(),
    vocabulary_path: str | None = None,
):
    """Index factory: trained-vocabulary native backend when a vocabulary
    file is supplied (and the native toolchain is available), else the
    vocabulary-free LSH index."""
    if vocabulary_path:
        from .. import native

        if native.available():
            return VocabDescriptorIndex(max_kfs, vocabulary_path)
    return DescriptorIndex(max_kfs, params)
