"""Bit-parallel OSA distance (restricted Damerau-Levenshtein) — EXTENSION.

Not a reference measure (polars-strsim, src/expressions/strsim.rs:9-19, has no
transposition-aware distance); this powers the `osa` extension similarity
1 − dist/max(la, lb), where dist is the *optimal string alignment* distance:
unit-cost insert/delete/substitute plus unit-cost transposition of adjacent
characters, with no substring edited twice (the common "Damerau-Levenshtein"
of most libraries; the unrestricted variant needs an alphabet-indexed DP that
does not bit-parallelize and is not provided).

Same batch-in-lanes / bit-parallel design language as the production Myers
levenshtein kernel (ops/levenshtein_myers.py), but in Hyyrö's D0 formulation
[Hyyrö 2003, "A bit-vector algorithm for computing Levenshtein and Damerau
edit distances", Nordic J. Computing] — the transposition term must be OR-ed
into the diagonal-zero vector D0 *before* HP/HN/PV/MV are derived from it,
so the Myers Xh/Xv split used by the levenshtein kernel does not apply.

Per text char j (PM = pattern-match bitmask, D0'/PM' carried from step j-1):

    TR  = (((~D0') & PM) << 1) & PM'          # adjacent cross-match, not on a
                                              # step the previous char already
                                              # resolved diagonally
    D0  = ((((PM & PV) + PV) ^ PV) | PM | MV) | TR
    HP  = MV | ~(D0 | PV)
    HN  = D0 & PV
    score ± bit (len_a-1) of HP/HN            # before the shift
    PV  = (HN << 1 | 1-fill) | ~(D0 | (HP << 1 | 1))
    MV  = (HP << 1 | 1) & D0

Multiword (L > 32): the (PM & PV) + PV add carries word-to-word exactly like
the levenshtein kernel; the three left-shifts (TR's pre-mask term, HP, HN)
each carry their bit 31 into the next word's bit 0.

Exactness: integer DP throughout — the host finalizer (ops/finalize.py) does
the only float math, in the same order as finalize_levenshtein, so scores are
reproducible bit-for-float. Valid for rows with len_a >= 1 and len_b >= 1 —
empty-side rows are resolved in the finalizer, same contract as levenshtein.
Fuzz-locked against the classic 3-row OSA DP in tests/test_extensions.py.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.ops.levenshtein_myers import (
    _SCAN_UNROLL_MAX,
    _STATIC_UNROLL_MAX,
    small_width_loop,
)

Array = jax.Array

_WORD = 32
_ALL_ONES = np.uint32(0xFFFFFFFF)


def osa_distance_myers(a: Array, b: Array, len_a: Array, len_b: Array) -> Array:
    """OSA (restricted Damerau-Levenshtein) distance per row pair.

    a, b: [B, L] padded codepoint tiles (PAD_A / PAD_B past each length).
    len_a, len_b: [B] int32. Returns [B] int32 distances (valid where both
    lengths >= 1; other rows return len_a, ignored by the finalizer).
    """
    B, L = a.shape
    W = -(-L // _WORD)
    u32 = jnp.uint32
    i32 = jnp.int32

    # Sublane fold exactly as levenshtein_myers: looped widths carry state as
    # [W, 8, B/8] so the minor two dims fill (8, 128) register tiles.
    S = 8 if (L > _STATIC_UNROLL_MAX and B % 8 == 0) else 1
    bshape = (B,) if S == 1 else (S, B // S)

    aT = a.T  # [L, B] batch-in-lanes
    bT = b.T

    # Eq precompute from only the L real pattern rows (PAD_A never equals any
    # b char, so bits at i >= len_a are 0 with no masking) — identical to the
    # levenshtein kernel's build.
    bits = np.uint32(1) << jnp.arange(_WORD, dtype=u32)
    words = []
    for w in range(W):
        i0, i1 = w * _WORD, min((w + 1) * _WORD, L)
        eq4 = aT[None, i0:i1, :] == bT[:, None, :]
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
    hword = m1 // _WORD
    hbit = (m1 % _WORD).astype(u32)

    pv0 = jnp.full((W, *bshape), _ALL_ONES, dtype=u32)
    mv0 = jnp.zeros((W, *bshape), dtype=u32)
    d0_0 = jnp.zeros((W, *bshape), dtype=u32)  # D0 of the previous step
    pm0 = jnp.zeros((W, *bshape), dtype=u32)  # PM of the previous step
    score0 = la.astype(i32)

    def body(j, state):
        pv, mv, d0p, pmo, score = state
        eq = lax.dynamic_slice_in_dim(Eq, j, 1, axis=0)[0]  # [W, *bshape]
        active = j < lb

        carry = jnp.zeros(bshape, u32)  # addition carry, word w -> w+1
        tr_in = jnp.zeros(bshape, u32)  # TR shift-in
        hp_in = jnp.ones(bshape, u32)  # HP shift-in (the "| 1" of HP <<= 1)
        hn_in = jnp.zeros(bshape, u32)
        hp_bit = jnp.zeros(bshape, u32)
        hn_bit = jnp.zeros(bshape, u32)
        new_pv = []
        new_mv = []
        new_d0 = []
        for w in range(W):  # static unroll; carries flow low word -> high
            eq_w, pv_w, mv_w = eq[w], pv[w], mv[w]
            # transposition vector: previous step's diagonal NOT zero at i-1,
            # current char matches pattern at i-1, previous char at i
            t = (~d0p[w]) & eq_w
            tr = ((t << 1) | tr_in) & pmo[w]
            tr_in = t >> (_WORD - 1)
            x = eq_w & pv_w
            s1 = x + pv_w
            c1 = (s1 < x).astype(u32)
            s2 = s1 + carry
            c2 = (s2 < s1).astype(u32)
            carry = c1 | c2
            d0 = ((s2 ^ pv_w) | eq_w | mv_w) | tr
            hp = mv_w | ~(d0 | pv_w)
            hn = d0 & pv_w
            # score delta reads bit m-1 of the UNSHIFTED HP/HN
            if W == 1:
                hp_bit = (hp >> hbit) & 1
                hn_bit = (hn >> hbit) & 1
            else:
                sel = hword == w
                hp_bit = jnp.where(sel, (hp >> hbit) & 1, hp_bit)
                hn_bit = jnp.where(sel, (hn >> hbit) & 1, hn_bit)
            hp_out = hp >> (_WORD - 1)
            hn_out = hn >> (_WORD - 1)
            hp_s = (hp << 1) | hp_in
            hn_s = (hn << 1) | hn_in
            hp_in, hn_in = hp_out, hn_out
            new_pv.append(hn_s | ~(d0 | hp_s))
            new_mv.append(hp_s & d0)
            new_d0.append(d0)

        delta = hp_bit.astype(i32) - hn_bit.astype(i32)
        score = score + jnp.where(active, delta, 0)
        pv_n = jnp.stack(new_pv)
        mv_n = jnp.stack(new_mv)
        d0_n = jnp.stack(new_d0)
        act = active[None]
        return (
            jnp.where(act, pv_n, pv),
            jnp.where(act, mv_n, mv),
            jnp.where(act, d0_n, d0p),
            jnp.where(act, eq, pmo),
            score,
        )

    if L <= _SCAN_UNROLL_MAX:
        state = small_width_loop(L, body, (pv0, mv0, d0_0, pm0, score0))
    else:
        n_max = jnp.clip(jnp.max(lb), 0, L)
        state = lax.fori_loop(0, n_max, body, (pv0, mv0, d0_0, pm0, score0))
    return state[4].astype(i32).reshape(B)
