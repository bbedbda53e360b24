"""Pallas (Mosaic) BIGRAM multiset-intersection kernel — EXTENSION kernel.

The bigram measures (jaccard_bigram / sorensen_dice_bigram, not in the
reference) were the all-nine extension path's bottleneck: the XLA
occurrence-rank scan (ops/multiset_loop.bigram_intersection_loop) ran at
372 M pairs/s alone vs 1.3 B for the unigram Pallas kernel
(BENCH_EXTENSIONS.json, round 4). This kernel applies the same recipe that
won for the unigram multiset (ops/multiset_pallas.py): i32 char tiles in
VMEM, fully-unrolled static loops, accumulators pinned in vector registers.

Two extra tricks over a naive widening of the unigram kernel:

  * for 8-bit (ASCII) tiles, each bigram packs into ONE 16-bit token
    (lo char | hi char << 8), so the per-(i, j) test is a single compare
    instead of two compares + and — ~25% fewer lane ops. Pads keep tokens
    distinct: PAD_A (0xFF) / PAD_B (0xFE) bytes never collide with real
    chars < 0x80 or each other, so boundary/pad bigrams never match across
    sides (same maskless-pad design as every kernel in this package,
    utils/encode.py). int32 tiles keep the two-compare form (codepoints
    don't pack).
  * the row-equality stat `eq` and the hamming stat `ham_m`, which the
    bigram measures' finalizer and the all-nine fused set also need
    (ops/stats.STAT_FIELDS), fold in for L lane ops: ham_m is the
    positional match count and eq = (la == lb) & (ham_m == la) — exactly
    ops/stats.row_equal's contract.

Contract: inter2 = Σ_g min(cnt_a(g), cnt_b(g)) over adjacent-pair bigrams,
identical integer results to bigram_intersection_loop (rows with < 2 chars
on a side have no bigrams on that side; pads make cross-side compares past
either length false automatically). Unrolled widths <= 63 (the narrow
ladder); wider buckets keep the XLA scan. Off-TPU backends run the
identical kernel via the Pallas interpreter (exactness tests use this);
the pipeline only selects this kernel on TPU.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.ops.jaro_pallas_scan import _block_rows_for
from strsim_tpu.utils.encode import PAD_A, PAD_B

Array = jax.Array

_SUB = 8
_MAX_WIDTH = 64
DEFAULT_BLOCK_ROWS = 8192


def supports_width(L: int) -> bool:
    """True iff the unrolled kernel covers padded width L."""
    return L <= _MAX_WIDTH


def _kernel(a_ref, b_ref, la_ref, lb_ref, i2_ref, ham_ref, eq_ref,
            *, L: int, byte_tokens: bool):
    """a_ref/b_ref: [1, L, 8, BR8] i32 chars; la/lb: [1, 8, BR8] i32;
    outputs inter2 / ham_m / eq: [1, 8, BR8] i32."""
    i32 = jnp.int32
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    one = np.int32(1)
    zero = np.int32(0)

    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    # ham_m: positional matches (pads differ per side -> no masking);
    # eq = lengths equal and every position matches (ops/stats.row_equal)
    ham = jnp.zeros(shape, i32)
    for i in range(L):
        ham = ham + jnp.where(a_rows[i] == b_rows[i], one, zero)
    ham_ref[0] = ham
    eq_ref[0] = ((la == lb) & (ham == la)).astype(i32)

    if L < 2:
        i2_ref[0] = jnp.zeros(shape, i32)
        return

    if byte_tokens:
        # one 16-bit token per bigram: single compare per (i, j)
        m8 = np.int32(0xFF)
        tok_a = [
            (a_rows[i] & m8) | ((a_rows[i + 1] & m8) << 8) for i in range(L - 1)
        ]
        tok_b = [
            (b_rows[j] & m8) | ((b_rows[j + 1] & m8) << 8) for j in range(L - 1)
        ]

        def match_b(i, j):
            return tok_b[j] == tok_a[i]

        def match_a(i, k):
            return tok_a[k] == tok_a[i]
    else:
        def match_b(i, j):
            return (b_rows[j] == a_rows[i]) & (b_rows[j + 1] == a_rows[i + 1])

        def match_a(i, k):
            return (a_rows[k] == a_rows[i]) & (a_rows[k + 1] == a_rows[i + 1])

    inter = jnp.zeros(shape, i32)
    for i in range(L - 1):  # static unroll: occurrence-rank identity
        cnt_b = jnp.zeros(shape, i32)
        for j in range(L - 1):
            cnt_b = cnt_b + jnp.where(match_b(i, j), one, zero)
        occ = jnp.zeros(shape, i32)
        for k in range(i):
            occ = occ + jnp.where(match_a(i, k), one, zero)
        hit = (occ < cnt_b) & (i < la - 1)
        inter = inter + jnp.where(hit, one, zero)
    i2_ref[0] = inter


def bigram_stats_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """(inter2, ham_m, eq) per row pair — drop-in for
    ops.multiset_loop.bigram_intersection_loop + the XLA ham/eq stats on the
    same [B, L] padded tiles. L <= 63."""
    B, L = a.shape
    if not supports_width(L):
        raise ValueError(f"bigram pallas kernel requires width <= {_MAX_WIDTH}, got {L}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32
    byte_tokens = a.dtype.itemsize == 1 and b.dtype.itemsize == 1

    pad_rows = 0
    if B % _SUB:
        pad_rows = _SUB - B % _SUB
        zi = jnp.zeros((pad_rows,), len_a.dtype)
        a = jnp.concatenate([a, jnp.full((pad_rows, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((pad_rows, L), PAD_B, b.dtype)], axis=0)
        len_a = jnp.concatenate([len_a, zi])
        len_b = jnp.concatenate([len_b, zi])
        B = B + pad_rows

    BR = _block_rows_for(B, block_rows)
    BR8 = BR // _SUB
    G = B // BR

    a4 = a.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = b.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)

    def tile_spec(rows):
        return pl.BlockSpec(
            (1, rows, _SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )

    row_spec = pl.BlockSpec(
        (1, _SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )

    i2, ham, eq = pl.pallas_call(
        functools.partial(_kernel, L=L, byte_tokens=byte_tokens),
        out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),) * 3,
        grid=(G,),
        in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
        out_specs=(row_spec,) * 3,
        interpret=interpret,
    )(a4, b4, la3, lb3)
    outs = [x.reshape(B) for x in (i2, ham, eq)]
    if pad_rows:
        outs = [x[: B - pad_rows] for x in outs]
    return tuple(outs)
