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
        src_dir = os.path.join(_NATIVE_DIR, "src")
        srcs = [
            os.path.join(src_dir, f)
            for f in (os.listdir(src_dir) if os.path.isdir(src_dir) else [])
            if f.endswith(".cpp")
        ]
        if not os.path.exists(_LIB_PATH) or any(
            os.path.getmtime(s) > os.path.getmtime(_LIB_PATH) for s in srcs
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
    lib.loader_create.restype = c.c_void_p
    lib.loader_create.argtypes = [c.c_char_p, c.c_int, c.c_int]
    lib.loader_count.restype = c.c_int
    lib.loader_count.argtypes = [c.c_void_p]
    lib.loader_next_dims.restype = c.c_int
    lib.loader_next_dims.argtypes = [c.c_void_p, i32p]
    lib.loader_fetch.restype = c.c_int
    lib.loader_fetch.argtypes = [c.c_void_p, f32p, c.c_int, c.c_int]
    lib.loader_free.argtypes = [c.c_void_p]
    lib.decode_image_dims.restype = c.c_int
    lib.decode_image_dims.argtypes = [c.c_char_p, i32p]
    lib.decode_image.restype = c.c_int
    lib.decode_image.argtypes = [c.c_char_p, f32p, c.c_int, c.c_int]
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


def decode_image(path: str) -> "np.ndarray | None":
    """Synchronous native PNG/PGM grayscale decode -> (H, W) float32 in
    [0, 255]; None if the native path is unavailable or decode fails."""
    lib = _build_and_load()
    if lib is None:
        return None
    hw = np.empty(2, np.int32)
    if lib.decode_image_dims(path.encode(), hw) != 1:
        return None
    out = np.empty((int(hw[0]), int(hw[1])), np.float32)
    if lib.decode_image(path.encode(), out, int(hw[0]), int(hw[1])) != 1:
        return None
    return out


class ImageLoader:
    """Ordered prefetching image loader (C++ worker threads decode ahead).

    Native-runtime equivalent of the reference's IO thread + callback
    queue feeding Tracking (`ros_vio.cc:122-162`): the consumer iterates
    frames in order while up to `n_threads` decodes run `capacity` frames
    ahead, so the per-frame tracking step never blocks on host IO.
    """

    def __init__(self, paths, n_threads: int = 4, capacity: int = 16):
        lib = _build_and_load()
        if lib is None:
            raise RuntimeError(f"native runtime unavailable: {_err}")
        blob = "\n".join(paths).encode()
        self._h = lib.loader_create(blob, n_threads, capacity)
        self.n = lib.loader_count(self._h)

    def __iter__(self):
        lib = _build_and_load()
        hw = np.empty(2, np.int32)
        while True:
            r = lib.loader_next_dims(self._h, hw)
            if r == -1:
                return
            if r == 0:  # decode failure: surface as None, keep order
                yield None
                continue
            out = np.empty((int(hw[0]), int(hw[1])), np.float32)
            if lib.loader_fetch(self._h, out, int(hw[0]), int(hw[1])) != 1:
                yield None
                continue
            yield out

    def __del__(self):
        lib = _lib
        if lib is not None and getattr(self, "_h", None):
            lib.loader_free(self._h)
            self._h = None
