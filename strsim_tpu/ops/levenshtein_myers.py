"""Bit-parallel Levenshtein (Myers/Hyyrö) — the round-2 production kernel.

Same contract as ops.stats.levenshtein_distance (unit-cost edit distance per
row pair, reference semantics src/expressions/strsim.rs:146-160) but a
structurally different formulation: instead of the anti-diagonal wavefront
(2L-1 sequential steps with [L+1, B] loop-carried DP state), the DP column is
encoded as *bit vectors* — Pv/Mv hold the +1/-1 deltas between adjacent DP
cells — and one step of Myers' algorithm advances a whole column with ~18
word operations [Myers 1999, JACM 46(3); Hyyrö 2003 bit-vector formulation].

Why this is the right shape for TPU/XLA:
  * sequential steps drop from 2L-1 to len_b (~half), and the loop-carried
    state drops from O(L·B) int32 to O(ceil(L/32)·B) uint32 — the wavefront's
    HBM carry traffic (the measured round-1 bottleneck, docs/ROOFLINE.md) is
    cut by ~32x;
  * per-step work is O(W·B) lane ops (W = words per row), so padded bucket
    width stops mattering inside the scan — only the fully-parallel Eq
    precompute (one fused compare/weight/reduce pass, no loop carry) is
    O(L²·B), and it is plain VPU compare+select+add that XLA fuses.

Batch-in-lanes layout as everywhere else: state is [W, B] with the batch on
the 128-lane minor axis. For looped widths (L > _STATIC_UNROLL_MAX) the batch
is additionally folded into (8, B/8) so the loop state's minor two dims fill
an (8, 128) register tile exactly — with [W=1, B] state the size-1 dim lands
on the 8-sublane axis and 7/8 of the VPU idles every step (measured on v5e:
+42% at w15, +54% at w31, tools/ab_myers_sublane.py; at w7 the fully-inlined
unpacked form measured faster, so S stays 1 there).

Exactness: Myers' algorithm computes the same integer unit-cost distance as
the classic DP (no floats anywhere); the host finalizer is unchanged, so
bit-for-float parity is preserved by construction. Valid for rows with
len_a >= 1 and len_b >= 1 — empty-side rows are resolved in the finalizer
(ops/finalize.py), identical to the wavefront kernel's contract.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_WORD = 32
_ALL_ONES = np.uint32(0xFFFFFFFF)

# At small widths the while-loop's per-step fixed cost (~tens of us) dwarfs
# the ~1-3 us of real lane work per step, so small-width scans avoid
# lax.fori_loop entirely:
#   L <= _STATIC_UNROLL_MAX  -> every step emitted inline (no loop at all);
#   L <= _SCAN_UNROLL_MAX    -> lax.scan over the static index range with
#                               unroll=_SCAN_UNROLL (4 bodies per scan step).
# The split is compiler-driven, measured in this environment: a fully inlined
# 15-step module reproducibly SIGKILLs the terminal-side TPU compile helper
# and trips XLA:CPU's 5-minute slow-compile alarm at 23 steps, while 7
# inlined steps (and scan bodies of 4) compile in seconds everywhere.
# Exactness is unaffected: every step body masks itself past the row's
# length, so running all L steps equals the dynamic trip count.
_STATIC_UNROLL_MAX = 8
_SCAN_UNROLL_MAX = 32
_SCAN_UNROLL = 4


def small_width_loop(L: int, body, init):
    """Run `state = body(i, state)` for i in [0, L) without a while loop.
    Caller guarantees the body masks inactive steps (i past row lengths).
    Returns the final state. Only for L <= _SCAN_UNROLL_MAX."""
    if L <= _STATIC_UNROLL_MAX:
        state = init
        for i in range(L):
            state = body(i, state)
        return state
    state, _ = lax.scan(
        lambda s, i: (body(i, s), None),
        init,
        jnp.arange(L, dtype=jnp.int32),
        unroll=_SCAN_UNROLL,
    )
    return state


def levenshtein_distance_myers(
    a: Array, b: Array, len_a: Array, len_b: Array
) -> Array:
    """Unit-cost edit distance per row pair via bit-parallel column DP.

    a, b: [B, L] padded codepoint tiles (PAD_A / PAD_B past each length).
    len_a, len_b: [B] int32. Returns [B] int32 distances (valid where both
    lengths >= 1; other rows return len_a, ignored by the finalizer).
    """
    B, L = a.shape
    W = -(-L // _WORD)  # words per row (pattern = a)
    u32 = jnp.uint32
    i32 = jnp.int32

    # Sublane fold: looped widths carry state as [W, 8, B/8] so the minor two
    # dims fill (8, 128) register tiles (see module docstring). S = 1 keeps
    # the exact original [W, B] shapes (the measured winner at inline widths).
    S = 8 if (L > _STATIC_UNROLL_MAX and B % 8 == 0) else 1
    bshape = (B,) if S == 1 else (S, B // S)

    aT = a.T  # [L, B] batch-in-lanes
    bT = b.T

    # Eq precompute: Eq[j, w] = bitmask over pattern positions i in word w of
    # (a_i == b_j). PAD_A never equals any b char (real or PAD_B), so bits at
    # i >= len_a are 0 with no masking. One fused compare+select+reduce per
    # word; no loop carry. Compare only the L REAL pattern rows (bits i >= L
    # are identically 0): per word this slices rows [32w, min(32(w+1), L))
    # instead of padding a up to 32W rows — the build is the kernel's
    # largest cost term (docs/ROOFLINE.md).
    bits = np.uint32(1) << jnp.arange(_WORD, dtype=u32)  # [32]
    words = []
    for w in range(W):
        i0, i1 = w * _WORD, min((w + 1) * _WORD, L)
        eq4 = aT[None, i0:i1, :] == bT[:, None, :]  # [L_j, i1-i0, B]
        words.append(
            jnp.sum(
                jnp.where(eq4, bits[None, : i1 - i0, None], np.uint32(0)),
                axis=1,
                dtype=u32,
            )
        )
    Eq = jnp.stack(words, axis=1).reshape(L, W, *bshape)  # [L_j, W, *bshape]

    la = len_a.reshape(bshape)
    lb = len_b.reshape(bshape)
    m1 = jnp.maximum(la - 1, 0)
    hword = m1 // _WORD  # word index holding bit m-1
    hbit = (m1 % _WORD).astype(u32)  # bit position within that word

    pv0 = jnp.full((W, *bshape), _ALL_ONES, dtype=u32)
    mv0 = jnp.zeros((W, *bshape), dtype=u32)
    score0 = la.astype(i32)

    def body(j, state):
        pv, mv, score = state
        eq = lax.dynamic_slice_in_dim(Eq, j, 1, axis=0)[0]  # [W, *bshape]
        active = j < lb

        carry = jnp.zeros(bshape, u32)  # addition carry, word w -> w+1
        ph_in = jnp.ones(bshape, u32)  # Ph shift-in (the "| 1" of Ph <<= 1)
        mh_in = jnp.zeros(bshape, u32)
        ph_bit = jnp.zeros(bshape, u32)
        mh_bit = jnp.zeros(bshape, u32)
        new_pv = []
        new_mv = []
        for w in range(W):  # static unroll; carries flow low word -> high
            eq_w, pv_w, mv_w = eq[w], pv[w], mv[w]
            x = eq_w & pv_w
            s1 = x + pv_w
            c1 = (s1 < x).astype(u32)
            s2 = s1 + carry
            c2 = (s2 < s1).astype(u32)
            carry = c1 | c2
            xh = (s2 ^ pv_w) | eq_w
            xv = eq_w | mv_w
            ph = mv_w | ~(xh | pv_w)
            mh = pv_w & xh
            # score delta reads bit m-1 of the UNSHIFTED Ph/Mh
            if W == 1:
                sel = None
                ph_bit = (ph >> hbit) & 1
                mh_bit = (mh >> hbit) & 1
            else:
                sel = hword == w
                ph_bit = jnp.where(sel, (ph >> hbit) & 1, ph_bit)
                mh_bit = jnp.where(sel, (mh >> hbit) & 1, mh_bit)
            ph_out = ph >> (_WORD - 1)
            mh_out = mh >> (_WORD - 1)
            ph_s = (ph << 1) | ph_in
            mh_s = (mh << 1) | mh_in
            ph_in, mh_in = ph_out, mh_out
            new_pv.append(mh_s | ~(xv | ph_s))
            new_mv.append(ph_s & xv)

        delta = ph_bit.astype(i32) - mh_bit.astype(i32)
        score = score + jnp.where(active, delta, 0)
        pv_n = jnp.stack(new_pv)
        mv_n = jnp.stack(new_mv)
        act = active[None]
        return (
            jnp.where(act, pv_n, pv),
            jnp.where(act, mv_n, mv),
            score,
        )

    if L <= _STATIC_UNROLL_MAX:
        # fully inline the smallest widths (measured win on v5e: w7 block
        # 0.21 vs 0.24 ms); at w15 the scan/unroll variants measured SLOWER
        # than the dynamic fori_loop (0.43 vs 0.35 ms/block), so wider
        # buckets keep the loop. Bit-exact either way: `active = j < len_b`
        # masks every step past a row's length.
        _, _, score = small_width_loop(L, body, (pv0, mv0, score0))
    else:
        # dynamic trip count: with length-sorted blocks each block pays only
        # its true max text length, not the padded bucket width
        n_max = jnp.clip(jnp.max(lb), 0, L)
        _, _, score = lax.fori_loop(0, n_max, body, (pv0, mv0, score0))
    return score.astype(i32).reshape(B)
