"""Streaming multiset-intersection kernel.

Same occurrence-rank identity as stats.multiset_intersection but evaluated as
an L-step scan with [L, B] working state instead of one [L, L, B] compare
table: per step i it counts matches of a_i in b and prior occurrences of a_i
in a, then accumulates 1[occ < cnt_b]. Total work is the same 2·L²·B lane
ops, but peak memory is L·B — so multiset blocks can be as large as the
levenshtein/jaro blocks and the per-call dispatch overhead amortizes over
256k-row batches (the [L, L, B] variant forces 4k-row blocks at L = 64).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.ops.levenshtein_myers import _SCAN_UNROLL_MAX, small_width_loop

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
