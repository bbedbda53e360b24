"""Bit-parallel Jaro match/transposition statistics — round-2 production kernel.

Same contract and greedy semantics as ops.stats.jaro_match_stats (reference
src/expressions/strsim.rs:200-243: for each a-char in order, flag the FIRST
unflagged equal b-char inside the window [i-bound, i+bound] ∩ [0, len_b)), but
the loop-carried flag state is packed into bitmasks: one uint32 word per 32
b-positions instead of an [L, B] bool tensor. The greedy "first unflagged
match" becomes lowest-set-bit extraction (cand & -cand).

Why: round 1 measured the jaro scan to be bound by its loop-carried flag
tensors bouncing through HBM every step (docs/ROOFLINE.md). Packing flags into
W = ceil(L/32) words cuts the carry to O(W·B) and the per-step work to O(W·B)
lane ops; the O(L²·B) equality table moves into a fully parallel fused
precompute (EqB) with no sequential dependence.

The transposition count (strsim.rs:220-237: r-th matched a-char vs r-th
flagged b-char) is evaluated LOOP-FREE after the scan: ranks come from
popcounts of the final masks, and the mismatch count is one [L, L, B]
compare+reduce that XLA fuses — no sequential pass at all.

Exactness: every statistic stays integer (m, t); the host finalizer is
unchanged (ops/finalize.py), so bit-for-float parity is preserved. Valid for
rows with len_a >= 1 and len_b >= 1, including the len-1/len-1 direct-compare
special case (strsim.rs:197-199) which is patched exactly as in the round-1
kernel.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


Array = jax.Array

_WORD = 32
_ALL_ONES = np.uint32(0xFFFFFFFF)


def _satmask(k: Array) -> Array:
    """Per-lane uint32 mask of the k lowest bits, saturating: k<=0 -> 0,
    k>=32 -> all ones. k is int32 (any range)."""
    kc = jnp.clip(k, 0, _WORD - 1).astype(jnp.uint32)
    base = (np.uint32(1) << kc) - 1
    return jnp.where(k >= _WORD, _ALL_ONES, jnp.where(k <= 0, np.uint32(0), base))


def jaro_match_stats_bitmask(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Tuple[Array, Array]:
    """(m, t): greedy match count and raw transposition count (pre-halving).

    a, b: [B, L] padded tiles; len_a, len_b: [B] int32. Rows with an empty
    side yield m = 0 (resolved by the finalizer).
    """
    B, L = a.shape
    W = -(-L // _WORD)
    u32, i32 = jnp.uint32, jnp.int32
    aT, bT = a.T, b.T  # [L, B] batch-in-lanes

    # Sublane fold: scan state carried as [W, 8, B/8] so the minor two dims
    # fill (8, 128) register tiles — with [W=1, B] state the size-1 dim lands
    # on the 8-sublane axis and 7/8 of the VPU idles every step. Measured on
    # v5e (tools/ab_jaro_sublane.py): +11%/+22%/+32% at w7/w15/w31. The
    # loop-free transposition reduce keeps the [L, L, B] layout (full tiles).
    S = 8 if B % 8 == 0 else 1
    bshape = (B,) if S == 1 else (S, B // S)

    la = len_a.reshape(bshape).astype(i32)
    lb = len_b.reshape(bshape).astype(i32)
    bound = jnp.maximum(la, lb) // 2 - 1  # strsim.rs:200

    # EqB[i, w] = bitmask over b-positions j in word w of (b_j == a_i).
    # Pads differ per side, so bits past either length are 0 automatically.
    # Compare only the L REAL b rows (bits j >= L are identically 0): per
    # word w this slices rows [32w, min(32(w+1), L)) instead of padding b up
    # to 32W rows — at w15 that halves the build's compare work, the largest
    # term in the kernel's cost model (docs/ROOFLINE.md).
    bits = np.uint32(1) << jnp.arange(_WORD, dtype=u32)
    words = []
    for w in range(W):
        j0, j1 = w * _WORD, min((w + 1) * _WORD, L)
        eq4 = bT[None, j0:j1, :] == aT[:, None, :]  # [L_i, j1-j0, B]
        words.append(
            jnp.sum(
                jnp.where(eq4, bits[None, : j1 - j0, None], np.uint32(0)),
                axis=1,
                dtype=u32,
            )
        )
    EqB = jnp.stack(words, axis=1).reshape(L, W, *bshape)  # [L_i, W, *bshape]

    def body(i, state):
        flagged, matched, m = state  # [W,*bshape] u32 x2, [*bshape] i32
        eqb = lax.dynamic_slice_in_dim(EqB, i, 1, axis=0)[0]  # [W, *bshape]
        # strsim.rs:208 iterates only the first len_b + bound chars of a
        active = (i < la) & (i < lb + bound)
        lo = i - bound  # i32 (may be negative)
        hi = jnp.minimum(i + bound, lb - 1)  # i32

        found = jnp.zeros(bshape, bool)
        new_flagged = []
        for w in range(W):  # static unroll, low word -> high
            # window bits lo..hi restricted to word w
            win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
            cand = eqb[w] & ~flagged[w] & win & jnp.where(active, _ALL_ONES, 0)
            # greedy: only the lowest set bit across ALL words may flag;
            # suppress this word's candidates if a lower word already found
            cand = jnp.where(found, np.uint32(0), cand)
            lsb = cand & (~cand + np.uint32(1))
            new_flagged.append(flagged[w] | lsb)
            found = found | (cand != 0)

        flagged = jnp.stack(new_flagged)
        # i may be a traced loop index (fori_loop) or a static Python int
        # (static-unroll branch); asarray handles both
        iw = jnp.asarray(i // _WORD, dtype=i32)
        ib = jnp.asarray(i % _WORD, dtype=u32)
        setbit = jnp.where(found, np.uint32(1) << ib, np.uint32(0))
        if W == 1:
            matched = matched.at[0].set(matched[0] | setbit)
        else:
            ww = jnp.arange(W, dtype=i32).reshape((W,) + (1,) * len(bshape))
            matched = matched | jnp.where(ww == iw, setbit[None], np.uint32(0))
        m = m + found.astype(i32)
        return flagged, matched, m

    state0 = (
        jnp.zeros((W, *bshape), u32),
        jnp.zeros((W, *bshape), u32),
        jnp.zeros(bshape, i32),
    )
    # dynamic trip count (strsim.rs:208's take(len_b + bound), maxed over
    # rows). Static-unroll/scan variants were measured and REJECTED for this
    # kernel: w7 inline 0.47 vs 0.33 ms/block, w15 scan ~equal — the fori
    # loop is not the jaro scan's bottleneck (see docs/ROOFLINE.md).
    i_max = jnp.clip(jnp.max(jnp.minimum(la, lb + bound)), 0, L)
    flagged, matched, m = lax.fori_loop(0, i_max, body, state0)

    m = m.reshape(B)
    t = _transposition_from_masks(
        aT, bT, matched.reshape(W, B), flagged.reshape(W, B)
    )

    # len-1 vs len-1: direct char compare before any window math
    # (strsim.rs:197-199; bound = -1 makes the window empty above)
    one_one = (len_a == 1) & (len_b == 1)
    eq11 = aT[0, :] == bT[0, :]
    m = jnp.where(one_one, eq11.astype(i32), m)
    t = jnp.where(one_one, 0, t)
    return m, t


def _transposition_from_masks(
    aT: Array, bT: Array, matched: Array, flagged: Array
) -> Array:
    """Loop-free Jaro transposition count from packed match masks.

    The r-th matched a-position pairs with the r-th flagged b-position
    (strsim.rs:220-237). rank(position) = popcount of mask bits strictly
    below it; the mismatch count is then a single [L, L, B] masked
    compare+reduce — fully parallel, fused by XLA.
    """
    L, B = aT.shape
    W = matched.shape[0]
    u32, i32 = jnp.uint32, jnp.int32

    # all index/mask tensors built from traced iotas (no embedded host
    # constants — AOT lowering must see exactly the two user inputs)
    jj = jnp.arange(L, dtype=i32)
    jw = jj // _WORD  # word index per b/a position
    jb = (jj % _WORD).astype(u32)
    ww = jnp.arange(W, dtype=i32)
    below = _satmask(jj[:, None] - ww[None, :] * _WORD)  # [L, W]

    def expand(mask):  # [W, B] -> bits [L, B], ranks [L, B]
        sel = mask[jw, :]  # [L, B] (gather over <=16 words)
        bit = (sel >> jb[:, None]) & 1
        pc = lax.population_count(mask[None, :, :] & below[:, :, None])  # [L, W, B]
        rank = jnp.sum(pc, axis=1).astype(i32)
        return bit.astype(bool), rank

    fa, ra = expand(matched)
    fb, rb = expand(flagged)
    pair = (
        fa[:, None, :]
        & fb[None, :, :]
        & (ra[:, None, :] == rb[None, :, :])
        & (aT[:, None, :] != bT[None, :, :])
    )
    return jnp.sum(pair, axis=(0, 1)).astype(i32)
