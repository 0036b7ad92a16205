"""Native C++ bag-of-words backend: vocabulary tree training/quantization,
inverted-index scoring, and the VocabDescriptorIndex drop-in
(native/src/bow.cpp — the DBoW2 TemplatedVocabulary + KeyFrameDatabase
equivalent, /root/reference/Thirdparty/DBoW2, src/KeyFrameDatabase.cc)."""

import numpy as np
import pytest

from viorb_tpu import native
from viorb_tpu.ops import bow

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def make_scenes(rng, n_scenes=6, per_scene=300, flip_bits=12):
    """Clustered binary descriptors: each scene has 40 'landmark' patterns;
    each observation flips a few bits (ORB descriptor noise model)."""
    scenes = []
    for _ in range(n_scenes):
        protos = rng.integers(0, 2, (40, 256), dtype=np.uint8)
        obs = protos[rng.integers(0, 40, per_scene)]
        flips = rng.random((per_scene, 256)) < (flip_bits / 256)
        scenes.append(np.packbits(obs ^ flips, axis=1, bitorder="little"))
    return scenes


def test_vocab_train_quantize_deterministic():
    rng = np.random.default_rng(0)
    descs = np.concatenate(make_scenes(rng), axis=0)
    voc = native.Vocabulary.train(descs, k=8, levels=3, seed=1)
    assert voc.n_words > 100  # a real tree, not a degenerate one
    w1, t1 = voc.quantize(descs[:256])
    w2, t2 = voc.quantize(descs[:256])
    np.testing.assert_array_equal(w1, w2)
    assert (w1 >= 0).all() and (w1 < voc.n_words).all()
    assert (t1 > 0).all()  # idf weights of populated words


def test_vocab_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    descs = np.concatenate(make_scenes(rng, n_scenes=3), axis=0)
    voc = native.Vocabulary.train(descs, k=6, levels=3, seed=2)
    path = str(tmp_path / "voc.viorb")
    voc.save(path)
    voc2 = native.Vocabulary.load(path)
    assert voc2.n_words == voc.n_words
    w1, t1 = voc.quantize(descs[:512])
    w2, t2 = voc2.quantize(descs[:512])
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_allclose(t1, t2)


def test_index_scoring_same_scene_beats_other_scene():
    rng = np.random.default_rng(2)
    scenes = make_scenes(rng)
    voc = native.Vocabulary.train(np.concatenate(scenes), k=8, levels=3, seed=0)
    ix = native.InvertedIndex(voc.n_words, 16)
    # two docs per scene
    for s, d in enumerate(scenes):
        half = len(d) // 2
        ix.add(2 * s, *voc.quantize(d[:half]))
        ix.add(2 * s + 1, *voc.quantize(d[half:]))
    # query with a fresh view of scene 0
    q = voc.quantize(scenes[0][: len(scenes[0]) // 2])
    sc, cw = ix.query(*q)
    # self-match ~1; same-scene second doc beats every other scene's docs
    assert sc[0] > 0.99
    assert sc[1] > max(sc[2:12]), (sc[:12],)
    assert cw[0] > 0
    # pair score symmetric and matches query path
    assert ix.pair_score(0, 1) == pytest.approx(float(sc[1]), abs=1e-5)
    assert ix.pair_score(1, 0) == pytest.approx(ix.pair_score(0, 1), abs=1e-6)


def test_index_clear_doc():
    rng = np.random.default_rng(3)
    scenes = make_scenes(rng, n_scenes=2)
    voc = native.Vocabulary.train(np.concatenate(scenes), k=6, levels=2, seed=0)
    ix = native.InvertedIndex(voc.n_words, 4)
    q0 = voc.quantize(scenes[0])
    ix.add(0, *q0)
    ix.add(1, *voc.quantize(scenes[1]))
    sc, _ = ix.query(*q0)
    assert sc[0] > 0.99
    ix.clear_doc(0)
    sc, _ = ix.query(*q0)
    assert sc[0] == 0.0
    assert sc[1] > 0.0  # other doc untouched


def _feats(packed):
    """Packed (N, 32) uint8 -> the (N, 256) +/-1 float view the pipeline
    passes around (OrbFeatures.desc_pm1 layout)."""
    bits = np.unpackbits(packed, axis=1, bitorder="little").astype(np.float32)
    return bits * 2.0 - 1.0, np.ones(len(packed), bool)


def test_vocab_descriptor_index_loop_semantics(tmp_path):
    rng = np.random.default_rng(4)
    scenes = make_scenes(rng)
    voc = native.Vocabulary.train(np.concatenate(scenes), k=8, levels=3, seed=0)
    path = str(tmp_path / "voc.viorb")
    voc.save(path)

    ix = bow.VocabDescriptorIndex(max_kfs=16, vocabulary=path)
    # KFs 0..5: scenes 0..2 twice (loop: KF 0 and KF 3 see scene 0, etc.)
    for kf in range(6):
        s = kf % 3
        d = scenes[s][(kf // 3) * 100 : (kf // 3) * 100 + 100]
        pm1, valid = _feats(d)
        ix.add(kf, pm1, valid)

    # loop query from KF 3 (scene 0), excluding temporal neighbors 2..4
    exclude = np.zeros(16, bool)
    exclude[2:5] = True
    cands = ix.query(3, exclude, min_score=0.0, top=5)
    assert 0 in cands, cands  # the revisited scene-0 keyframe

    # min covisible score over {4, 5}
    covis = np.zeros(16, bool)
    covis[4] = covis[5] = True
    ms = ix.min_covisible_score(3, covis)
    assert 0.0 < ms < 1.0

    # reloc-style frame query finds scene-1 keyframes
    pm1, valid = _feats(scenes[1][200:260])
    rc = ix.query_frame(pm1, valid, n_kfs=6)
    assert rc and set(rc) <= {1, 4}, rc

    # re-adding a keyframe replaces its postings (SetBadFlag/erase path)
    pm1b, validb = _feats(scenes[2][:80])
    ix.add(0, pm1b, validb)
    cands = ix.query(3, exclude, min_score=0.0, top=5)
    assert 0 not in cands, cands


def test_make_index_factory(tmp_path):
    rng = np.random.default_rng(5)
    descs = np.concatenate(make_scenes(rng, n_scenes=2), axis=0)
    voc = native.Vocabulary.train(descs, k=6, levels=2, seed=0)
    path = str(tmp_path / "voc.viorb")
    voc.save(path)
    assert isinstance(bow.make_index(8, vocabulary_path=path),
                      bow.VocabDescriptorIndex)
    assert isinstance(bow.make_index(8), bow.DescriptorIndex)
