"""Pallas TPU kernel: fused Hamming matching (distance matmul + top-2).

The dense path (`matching.hamming_matrix` + `matching.best_match`) writes
an (N, M) float32 distance matrix to HBM and reads it back for the top-k
reduction — ~2 * N*M*4 bytes of HBM traffic per search, repeated several
times per frame (projection search, initialization, triangulation). This
kernel fuses the MXU distance matmul with the per-row best/second-best
running reduction, flash-attention style: the distance tile only ever
lives in VMEM, and the outputs are three (N,) vectors.

Semantics match the dense path (ORBmatcher's best/second-best + ratio
test, /root/reference/src/ORBmatcher.cc): disallowed entries are +BIG,
distances are exact. In interpreter mode results are bit-identical
(ties select the lowest column index); on real TPU hardware Mosaic's
argmin may resolve an *equal-distance* tie to a different, equally-valid
candidate — best/second distances are always identical to the dense path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e9
_TN = 256  # query rows per tile
_TM = 256  # candidate columns per tile


def _match_kernel(a_ref, b_ref, allowed_ref, out_ref):
    """Grid (nI, nJ), j fastest. out_ref block (8, TN) persists across j:
    row 0 = best distance, row 1 = second-best, row 2 = best index."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = jnp.full((_TN,), BIG, jnp.float32)
        out_ref[1, :] = jnp.full((_TN,), BIG, jnp.float32)
        out_ref[2, :] = jnp.full((_TN,), -1.0, jnp.float32)

    # (TN, TM) Hamming distances on the MXU: d = (256 - <a, b>) / 2.
    # b arrives pre-transposed (256, TM) — Mosaic wants the standard
    # row-major contraction, not a dim1 x dim1 dot. Precision must be
    # DEFAULT explicitly: the package sets jax_default_matmul_precision=
    # highest globally, which Mosaic rejects for bf16 operands ("Bad lhs
    # type"); one bf16 pass is exact for {-1,+1} inputs.
    dots = jnp.dot(
        a_ref[:], b_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = (256.0 - dots) * 0.5
    d = jnp.where(allowed_ref[:] != 0, d, BIG)

    # per-tile best + second-best per row (ties -> lowest column)
    t1 = jnp.min(d, axis=1)
    ti_local = jnp.argmin(d, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == ti_local[:, None], BIG, d)
    t2 = jnp.min(d2, axis=1)
    ti = (ti_local + j * _TM).astype(jnp.float32)

    # merge running (r1, r2, ri) with tile (t1, t2, ti):
    # second-smallest of the union = min(max(r1, t1), r2, t2)
    r1, r2, ri = out_ref[0, :], out_ref[1, :], out_ref[2, :]
    new2 = jnp.minimum(jnp.maximum(r1, t1), jnp.minimum(r2, t2))
    take = t1 < r1  # strict: earlier tile wins ties (lowest index)
    out_ref[0, :] = jnp.where(take, t1, r1)
    out_ref[1, :] = new2
    out_ref[2, :] = jnp.where(take, ti, ri)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_top2(
    pm1_a: jax.Array,
    pm1_b: jax.Array,
    allowed: jax.Array,
    interpret: bool = False,
):
    """Row-wise (best_dist, second_dist, best_idx) of the masked Hamming
    distance matrix, computed tile-by-tile in VMEM.

    pm1_a: (N, 256) {-1,+1}; pm1_b: (M, 256) {-1,+1}; allowed: (N, M) bool.
    """
    N, M = pm1_a.shape[0], pm1_b.shape[0]
    Np = -(-N // _TN) * _TN
    Mp = -(-M // _TM) * _TM
    a = jnp.zeros((Np, 256), jnp.bfloat16).at[:N].set(pm1_a.astype(jnp.bfloat16))
    bT = jnp.zeros((256, Mp), jnp.bfloat16).at[:, :M].set(
        pm1_b.astype(jnp.bfloat16).T
    )
    al = jnp.zeros((Np, Mp), jnp.int8).at[:N, :M].set(allowed.astype(jnp.int8))

    out = pl.pallas_call(
        _match_kernel,
        grid=(Np // _TN, Mp // _TM),
        in_specs=[
            pl.BlockSpec((_TN, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, _TM), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _TN), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Mp * 256,
            bytes_accessed=(Np + Mp) * 256 * 2 + Np * Mp + 8 * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, bT, al)
    return out[0, :N], out[1, :N], out[2, :N].astype(jnp.int32)


def available() -> bool:
    """Whether the compiled (non-interpret) kernel can run here."""
    return jax.default_backend() == "tpu"


# ----------------------------------------------------------------------------
# Window-gated variant: the (N, M) allowed mask is computed inside the
# kernel from per-row/per-column geometry, so the full mask never exists in
# HBM at all — only (N, 8) query properties and (8, M) candidate properties
# travel. This is the hot SearchByProjection shape (window radius + octave
# gate, ORBmatcher.cc SearchByProjection overloads).
# ----------------------------------------------------------------------------


def _window_kernel(oct_lo, oct_hi, a_ref, b_ref, pa_ref, pb_ref, out_ref):
    """pa (TN, 8): [u, v, r^2, octave, valid, 0, 0, 0] per query row.
    pb (8, TM):   [u, v, octave, valid, 0...] per candidate column."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = jnp.full((_TN,), BIG, jnp.float32)
        out_ref[1, :] = jnp.full((_TN,), BIG, jnp.float32)
        out_ref[2, :] = jnp.full((_TN,), -1.0, jnp.float32)

    dots = jnp.dot(
        a_ref[:], b_ref[:],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = (256.0 - dots) * 0.5

    du = pa_ref[:, 0:1] - pb_ref[0:1, :]
    dv = pa_ref[:, 1:2] - pb_ref[1:2, :]
    inside = du * du + dv * dv <= pa_ref[:, 2:3]
    octa = pa_ref[:, 3:4]
    octb = pb_ref[2:3, :]
    oct_ok = (octb >= octa + oct_lo) & (octb <= octa + oct_hi)
    ok = inside & oct_ok & (pa_ref[:, 4:5] > 0) & (pb_ref[3:4, :] > 0)
    d = jnp.where(ok, d, BIG)

    t1 = jnp.min(d, axis=1)
    ti_local = jnp.argmin(d, axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    d2 = jnp.where(cols == ti_local[:, None], BIG, d)
    t2 = jnp.min(d2, axis=1)
    ti = (ti_local + j * _TM).astype(jnp.float32)

    r1, r2, ri = out_ref[0, :], out_ref[1, :], out_ref[2, :]
    new2 = jnp.minimum(jnp.maximum(r1, t1), jnp.minimum(r2, t2))
    take = t1 < r1
    out_ref[0, :] = jnp.where(take, t1, r1)
    out_ref[1, :] = new2
    out_ref[2, :] = jnp.where(take, ti, ri)


@functools.partial(
    jax.jit, static_argnames=("oct_lo", "oct_hi", "interpret")
)
def fused_top2_window(
    pm1_a: jax.Array,
    pm1_b: jax.Array,
    uv_a: jax.Array,  # (N, 2) predicted positions
    uv_b: jax.Array,  # (M, 2) candidate positions
    radius_a: jax.Array,  # (N,) search radius per query
    oct_a: jax.Array,  # (N,) query octave (0s when ungated)
    oct_b: jax.Array,  # (M,) candidate octave
    valid_a: jax.Array,  # (N,)
    valid_b: jax.Array,  # (M,)
    oct_lo: int = -100,
    oct_hi: int = 100,
    interpret: bool = False,
):
    """fused_top2 with the window/octave/validity gate evaluated in-kernel."""
    N, M = pm1_a.shape[0], pm1_b.shape[0]
    Np = -(-N // _TN) * _TN
    Mp = -(-M // _TM) * _TM
    a = jnp.zeros((Np, 256), jnp.bfloat16).at[:N].set(pm1_a.astype(jnp.bfloat16))
    bT = jnp.zeros((256, Mp), jnp.bfloat16).at[:, :M].set(
        pm1_b.astype(jnp.bfloat16).T
    )
    pa = jnp.zeros((Np, 8), jnp.float32)
    pa = pa.at[:N, 0].set(uv_a[:, 0].astype(jnp.float32))
    pa = pa.at[:N, 1].set(uv_a[:, 1].astype(jnp.float32))
    pa = pa.at[:N, 2].set((radius_a * radius_a).astype(jnp.float32))
    pa = pa.at[:N, 3].set(oct_a.astype(jnp.float32))
    pa = pa.at[:N, 4].set(valid_a.astype(jnp.float32))
    pb = jnp.zeros((8, Mp), jnp.float32)
    pb = pb.at[0, :M].set(uv_b[:, 0].astype(jnp.float32))
    pb = pb.at[1, :M].set(uv_b[:, 1].astype(jnp.float32))
    pb = pb.at[2, :M].set(oct_b.astype(jnp.float32))
    pb = pb.at[3, :M].set(valid_b.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_window_kernel, float(oct_lo), float(oct_hi)),
        grid=(Np // _TN, Mp // _TM),
        in_specs=[
            pl.BlockSpec((_TN, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, _TN), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Mp * 256,
            bytes_accessed=(Np + Mp) * (256 * 2 + 32) + 8 * Np * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, bT, pa, pb)
    return out[0, :N], out[1, :N], out[2, :N].astype(jnp.int32)
