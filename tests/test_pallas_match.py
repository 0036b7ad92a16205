"""Fused Pallas Hamming-matching kernel vs the dense reference path.

Runs the kernel in interpreter mode on CPU (the compiled path runs on the
real TPU via bench.py); results must be bit-identical to
hamming_matrix + top-2, including tie-breaking (lowest column index)."""

import jax
import jax.numpy as jnp
import numpy as np

from viorb_tpu.ops import matching, pallas_match


def dense_top2(pm1_a, pm1_b, allowed):
    d = jnp.where(allowed, matching.hamming_matrix(pm1_a, pm1_b), pallas_match.BIG)
    nd, ni = jax.lax.top_k(-d, 2)
    return -nd[:, 0], -nd[:, 1], ni[:, 0]


def rand_case(rng, n, m, p_allow=0.7):
    a = jnp.asarray(rng.choice([-1, 1], (n, 256)).astype(np.int8))
    b = jnp.asarray(rng.choice([-1, 1], (m, 256)).astype(np.int8))
    allowed = jnp.asarray(rng.random((n, m)) < p_allow)
    return a, b, allowed


def check(a, b, allowed):
    b1, b2, bi = pallas_match.fused_top2(a, b, allowed, interpret=True)
    r1, r2, ri = dense_top2(a, b, allowed)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(r2))
    # index comparison only where a real match exists
    real = np.asarray(r1) < pallas_match.BIG / 2
    np.testing.assert_array_equal(np.asarray(bi)[real], np.asarray(ri)[real])


def test_single_tile():
    rng = np.random.default_rng(0)
    check(*rand_case(rng, 64, 100))


def test_multi_tile_merge():
    # M spans several 256-column tiles: exercises the running top-2 merge
    rng = np.random.default_rng(1)
    check(*rand_case(rng, 300, 700))


def test_duplicate_descriptors_tie_break():
    # identical candidate columns across different tiles: the kernel must
    # pick the lowest index, like top_k on the dense matrix
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.choice([-1, 1], (32, 256)).astype(np.int8))
    b_one = rng.choice([-1, 1], (1, 256)).astype(np.int8)
    b = jnp.asarray(np.repeat(b_one, 600, axis=0))  # all columns identical
    allowed = jnp.ones((32, 600), bool)
    b1, b2, bi = pallas_match.fused_top2(a, b, allowed, interpret=True)
    assert (np.asarray(bi) == 0).all()
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_all_disallowed_rows():
    rng = np.random.default_rng(3)
    a, b, allowed = rand_case(rng, 40, 50)
    allowed = allowed.at[7].set(False)
    b1, b2, bi = pallas_match.fused_top2(a, b, allowed, interpret=True)
    assert float(b1[7]) >= pallas_match.BIG / 2
    res = matching.fused_match(a, b, allowed, max_dist=256.0)
    assert not bool(res.valid[7])


def test_window_kernel_matches_dense_gating():
    rng = np.random.default_rng(5)
    N, M = 300, 500
    a = jnp.asarray(rng.choice([-1, 1], (N, 256)).astype(np.int8))
    b = jnp.asarray(rng.choice([-1, 1], (M, 256)).astype(np.int8))
    uv_a = jnp.asarray(rng.uniform(0, 640, (N, 2)).astype(np.float32))
    uv_b = jnp.asarray(rng.uniform(0, 640, (M, 2)).astype(np.float32))
    rad = jnp.asarray(rng.uniform(30, 120, N).astype(np.float32))
    oct_a = jnp.asarray(rng.integers(0, 8, N), jnp.float32)
    oct_b = jnp.asarray(rng.integers(0, 8, M), jnp.float32)
    va = jnp.asarray(rng.random(N) < 0.9)
    vb = jnp.asarray(rng.random(M) < 0.9)

    b1, b2, bi = pallas_match.fused_top2_window(
        a, b, uv_a, uv_b, rad, oct_a, oct_b, va, vb,
        oct_lo=-1, oct_hi=1, interpret=True,
    )
    allowed = matching.window_mask(uv_a, uv_b, rad, oct_a, oct_b, -1, 1)
    allowed = allowed & va[:, None] & vb[None, :]
    r1, r2, ri = dense_top2(a, b, allowed)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(r2))
    real = np.asarray(r1) < pallas_match.BIG / 2
    assert real.sum() > 50  # the gate leaves real matches to compare
    np.testing.assert_array_equal(np.asarray(bi)[real], np.asarray(ri)[real])


def test_fused_match_equals_best_match():
    rng = np.random.default_rng(4)
    a, b, allowed = rand_case(rng, 128, 333)
    ref = matching.best_match(
        matching.hamming_matrix(a, b), allowed, max_dist=100.0, ratio=0.9
    )
    # CPU backend: fused_match falls back to the dense path
    got = matching.fused_match(a, b, allowed, max_dist=100.0, ratio=0.9)
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(got.valid))
    np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(got.idx))
