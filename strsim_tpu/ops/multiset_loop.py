"""Streaming multiset-intersection kernels.

Same occurrence-rank identity as stats.multiset_intersection but evaluated as
a scan with [·, B] working state instead of one [L, L, B] compare table: per
step it counts matches of a_i in b and prior occurrences of a_i in a, then
accumulates 1[occ < cnt_b]. Total work is the same 2·L²·B lane ops, but peak
memory stays far below the full table — so multiset blocks can be as large as
the levenshtein/jaro blocks and the per-call dispatch overhead amortizes over
256k-row batches (the [L, L, B] variant forces 4k-row blocks at L = 64).

Two granularities:
  * multiset_intersection_loop — one i-position per step ([L, B] state), the
    round-2 default until the chunked variant was measured;
  * multiset_intersection_chunked — PRODUCTION: G i-positions per step as one
    fused [G, L, B] compare-reduce, statically inlined for L <= 63 (L/G steps,
    indices constant-fold) and a dynamic chunk loop beyond. Amortizes the
    scan's per-step fixed cost G-fold. Measured on v5e 262144-row blocks
    (tools/ab_multiset_chunked.py): w7 1836 vs 1464 M pairs/s (+25% over the
    1-step loop), w15 1251 vs 1156 (+8%), w31 433 vs ~364 (the capped table),
    w63 109 vs 91 (table) / 71 (loop).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.ops.levenshtein_myers import _SCAN_UNROLL_MAX, small_width_loop
from strsim_tpu.utils.encode import PAD_A

Array = jax.Array


def multiset_intersection_loop(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Array:
    """Σ_c min(cnt_a(c), cnt_b(c)) per row; [R, L] padded tiles in, [R] out."""
    del len_b  # pads encode b's validity
    B, L = a.shape
    aT = a.T  # [L, B] batch-in-lanes
    bT = b.T
    kk = jnp.arange(L, dtype=jnp.int32)[:, None]  # [L, 1]

    def body(i, inter):
        a_i = lax.dynamic_slice_in_dim(aT, i, 1, axis=0)  # [1, B]
        cnt_b = jnp.sum(bT == a_i, axis=0)                # [B]
        occ = jnp.sum((aT == a_i) & (kk < i), axis=0)     # [B]
        valid = i < len_a
        return inter + ((occ < cnt_b) & valid).astype(jnp.int32)

    if L <= _SCAN_UNROLL_MAX:
        # no while loop at small widths (see levenshtein_myers.small_width_loop):
        # `valid` masks steps past each row's length, so this is bit-exact and
        # avoids the while-loop's per-step fixed cost — which dominates here
        # (the [L, B] compare-reduce per step is only ~3 us of lane work)
        return small_width_loop(L, body, jnp.zeros((B,), jnp.int32))
    # dynamic trip count: steps beyond the block's longest a are no-ops
    i_max = jnp.clip(jnp.max(len_a), 0, L)
    return lax.fori_loop(0, i_max, body, jnp.zeros((B,), jnp.int32))


def _chunk_for(L: int) -> int:
    """Measured-winner chunk width per bucket band (docstring table)."""
    if L <= 8:
        return 4
    if L <= 16:
        return 8
    return 16


def multiset_intersection_chunked(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Array:
    """Σ_c min(cnt_a(c), cnt_b(c)) per row; [R, L] padded tiles in, [R] out.
    G i-positions per step as one fused [G, L, B] compare-reduce."""
    del len_b  # pads encode b's validity
    B, L = a.shape
    G = min(_chunk_for(L), L)
    aT = a.T  # [L, B]
    bT = b.T
    steps = -(-L // G)
    Lp = steps * G
    aTp = aT
    if Lp > L:
        aTp = jnp.concatenate(
            [aT, jnp.full((Lp - L, B), PAD_A, dtype=aT.dtype)], axis=0
        )
    kk = jnp.arange(L, dtype=jnp.int32)  # positions k in a
    g = jnp.arange(G, dtype=jnp.int32)

    def chunk(i0, inter):
        ai = lax.dynamic_slice_in_dim(aTp, i0, G, axis=0)  # [G, B]
        iv = i0 + g  # [G] chunk's i-positions (static or traced)
        cnt_b = jnp.sum(ai[:, None, :] == bT[None, :, :], axis=1)  # [G, B]
        before = (kk[None, :] < iv[:, None])[:, :, None]  # [G, L, 1]
        occ = jnp.sum((ai[:, None, :] == aT[None, :, :]) & before, axis=1)
        valid = iv[:, None] < len_a[None, :]  # [G, B]
        return inter + jnp.sum((occ < cnt_b) & valid, axis=0, dtype=jnp.int32)

    inter0 = jnp.zeros((B,), jnp.int32)
    if L <= 63:
        inter = inter0
        for s in range(steps):  # static inline; indices constant-fold
            inter = chunk(s * G, inter)
        return inter
    # wide/extend buckets: dynamic trip count over chunks — steps past the
    # block's longest a are no-ops (blocks are length-sorted)
    s_max = (jnp.clip(jnp.max(len_a), 0, L) + G - 1) // G
    return lax.fori_loop(
        0, s_max, lambda s, acc: chunk(s * G, acc), inter0
    )


def bigram_intersection_loop(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Array:
    """EXTENSION kernel: multiset intersection over BIGRAMS (adjacent char
    pairs). Same occurrence-rank scan as the unigram kernel with the equality
    test widened to two positions; row i has len-1 bigrams. Pads differ per
    side, so comparisons past either length are automatically false."""
    B, L = a.shape
    if L < 2:
        return jnp.zeros((B,), jnp.int32)
    aT = a.T  # [L, B]
    bT = b.T
    a0, a1 = aT[:-1, :], aT[1:, :]   # bigram (a[i], a[i+1]) at row i, [L-1, B]
    b0, b1 = bT[:-1, :], bT[1:, :]
    kk = jnp.arange(L - 1, dtype=jnp.int32)[:, None]

    def body(i, inter):
        g0 = lax.dynamic_slice_in_dim(a0, i, 1, axis=0)
        g1 = lax.dynamic_slice_in_dim(a1, i, 1, axis=0)
        cnt_b = jnp.sum((b0 == g0) & (b1 == g1), axis=0)
        occ = jnp.sum((a0 == g0) & (a1 == g1) & (kk < i), axis=0)
        valid = i < (len_a - 1)
        return inter + ((occ < cnt_b) & valid).astype(jnp.int32)

    if L - 1 <= _SCAN_UNROLL_MAX:
        return small_width_loop(L - 1, body, jnp.zeros((B,), jnp.int32))
    i_max = jnp.clip(jnp.max(len_a) - 1, 0, L - 1)
    return lax.fori_loop(0, i_max, body, jnp.zeros((B,), jnp.int32))
