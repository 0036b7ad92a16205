"""ctypes bindings for the C++ native runtime (native/src/*.cpp).

The shared library is built on first import via the Makefile (g++, no
external dependencies). `available()` reports whether the native path is
usable; callers fall back to the pure-JAX implementations when it is not
(e.g. no toolchain in the deployment image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libviorb_native.so"))

_lib = None
_err = None


def _build_and_load():
    global _lib, _err
    if _lib is not None:
        return _lib
    try:
        src = os.path.join(_NATIVE_DIR, "src", "bow.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _err = e
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c = ctypes
    lib.vocab_train.restype = c.c_void_p
    lib.vocab_train.argtypes = [u8p, c.c_int, c.c_int, c.c_int, c.c_uint]
    lib.vocab_n_words.restype = c.c_int
    lib.vocab_n_words.argtypes = [c.c_void_p]
    lib.vocab_n_nodes.restype = c.c_int
    lib.vocab_n_nodes.argtypes = [c.c_void_p]
    lib.vocab_quantize.argtypes = [c.c_void_p, u8p, c.c_int, i32p, f32p]
    lib.vocab_save.restype = c.c_int
    lib.vocab_save.argtypes = [c.c_void_p, c.c_char_p]
    lib.vocab_load.restype = c.c_void_p
    lib.vocab_load.argtypes = [c.c_char_p]
    lib.vocab_free.argtypes = [c.c_void_p]
    lib.index_create.restype = c.c_void_p
    lib.index_create.argtypes = [c.c_int, c.c_int]
    lib.index_add.argtypes = [c.c_void_p, c.c_int, i32p, f32p, c.c_int]
    lib.index_query.argtypes = [c.c_void_p, i32p, f32p, c.c_int, f32p, i32p]
    lib.index_pair_score.restype = c.c_float
    lib.index_pair_score.argtypes = [c.c_void_p, c.c_int, c.c_int]
    lib.index_clear_doc.argtypes = [c.c_void_p, c.c_int]
    lib.index_free.argtypes = [c.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _build_and_load() is not None


class Vocabulary:
    """Trained binary vocabulary tree (DBoW2 TemplatedVocabulary equiv)."""

    def __init__(self, handle):
        self._h = handle
        lib = _build_and_load()
        self.n_words = lib.vocab_n_words(handle)

    @classmethod
    def train(cls, descriptors: np.ndarray, k: int = 10, levels: int = 6,
              seed: int = 0) -> "Vocabulary":
        """descriptors: (N, 32) uint8 packed 256-bit ORB."""
        lib = _build_and_load()
        d = np.ascontiguousarray(descriptors, np.uint8)
        assert d.ndim == 2 and d.shape[1] == 32, d.shape
        h = lib.vocab_train(d, len(d), k, levels, seed)
        return cls(h)

    @classmethod
    def load(cls, path: str) -> "Vocabulary":
        lib = _build_and_load()
        h = lib.vocab_load(path.encode())
        if not h:
            raise IOError(f"cannot load vocabulary: {path}")
        return cls(h)

    def save(self, path: str):
        lib = _build_and_load()
        if lib.vocab_save(self._h, path.encode()) != 0:
            raise IOError(f"cannot save vocabulary: {path}")

    def quantize(self, descriptors: np.ndarray):
        """(N, 32) uint8 -> (word_ids (N,) int32, idf_weights (N,) f32)."""
        lib = _build_and_load()
        d = np.ascontiguousarray(descriptors, np.uint8)
        n = len(d)
        words = np.empty(n, np.int32)
        weights = np.empty(n, np.float32)
        lib.vocab_quantize(self._h, d, n, words, weights)
        return words, weights

    def __del__(self):
        lib = _lib
        if lib is not None and getattr(self, "_h", None):
            lib.vocab_free(self._h)
            self._h = None


class InvertedIndex:
    """Word -> keyframe posting lists with L1 tf-idf scoring
    (KeyFrameDatabase's mvInvertedFile equivalent, in C++)."""

    def __init__(self, n_words: int, max_docs: int):
        lib = _build_and_load()
        self._h = lib.index_create(n_words, max_docs)
        self.max_docs = max_docs

    def add(self, doc: int, words: np.ndarray, weights: np.ndarray):
        lib = _build_and_load()
        lib.index_add(
            self._h, doc,
            np.ascontiguousarray(words, np.int32),
            np.ascontiguousarray(weights, np.float32),
            len(words),
        )

    def query(self, words: np.ndarray, weights: np.ndarray):
        """-> (scores (max_docs,) f32, common_words (max_docs,) i32)."""
        lib = _build_and_load()
        scores = np.empty(self.max_docs, np.float32)
        common = np.empty(self.max_docs, np.int32)
        lib.index_query(
            self._h,
            np.ascontiguousarray(words, np.int32),
            np.ascontiguousarray(weights, np.float32),
            len(words), scores, common,
        )
        return scores, common

    def pair_score(self, a: int, b: int) -> float:
        lib = _build_and_load()
        return float(lib.index_pair_score(self._h, a, b))

    def clear_doc(self, doc: int):
        lib = _build_and_load()
        lib.index_clear_doc(self._h, doc)

    def __del__(self):
        lib = _lib
        if lib is not None and getattr(self, "_h", None):
            lib.index_free(self._h)
            self._h = None
