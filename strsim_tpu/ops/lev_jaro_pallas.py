"""Shared-equality fused multi-measure Pallas kernel (rounds 4-5).

The fused-measure serving path needs, per row pair, the integer stats of all
five reference measures: lev_d (Myers scan), jaro_m/jaro_t (greedy windowed
match scan), inter (multiset intersection) and prefix (4-cap common prefix).
Run separately, the kernels rebuild the same L x L equality structure from
opposite axes: levenshtein's per-text-position Eq word holds bits over
pattern rows i (ops/levenshtein_pallas_scan.py:88-103), jaro's per-pattern-
position EqB word holds bits over text rows j (ops/jaro_pallas_scan.py:
134-143) — transposes of one boolean matrix, each built at ~3L² lane ops
(the round-4 ablation measured that build at ~70% of jaro,
JARO_SOL_PROBE.json) — and the multiset kernel's per-position cnt_b is the
row popcount of that same matrix (ops/multiset_pallas.py:66-70, another
~2L² rebuilt lane ops).

This kernel runs the jaro scan once (storing its EqB words), bit-transposes
the packed matrix in registers (Hacker's Delight delta-swap ladder: 4
rounds at 16x16 / 5 at 32x32; W = 2 widths via four 32x32 block transposes
+ block swap — ~190/~480/~2500 vector ops vs ~675/~2883/~11900 for the
rebuild), feeds the Myers scan the transposed words directly, and (opt-in)
derives the multiset cnt_b by popcounting the stored EqB words — only the
occurrence-rank half of the multiset identity (occ, ~1.5L²/2 ops) is
computed fresh. The 4-char prefix stat is 12 more lane ops on tiles already
in registers, eliminating a separate XLA pass over the tiles.

Round-4 measurement (lev+jaro subset, tools/ab_fused_lj.py,
FUSED_LJ_AB.json): fused = 0.212 ms vs lev 0.145 + jaro 0.214 = 0.359 ms at
w15 (**1.69x**), 0.563 vs 1.012 ms at w31 (**1.80x**), bit-exact against
both production kernels. Round 5 extends the envelope: W = 2 flag words
(buckets 47/63) via the blocked transpose, halfword/fullword compaction
(pack = 2 for BMP int32 tiles, pack = 1 for astral) mirroring
ops/jaro_pallas_scan's pack contract, and the optional inter/prefix
outputs that turn the pair kernel into the fused-FIVE kernel
(tools/ab_fused_five.py for the A/B).

Semantics: identical integer contracts to the kernels it replaces — Myers
distance (exact-order host finalization stays in ops/finalize.py), the
reference's greedy windowed match + ordered transposition count
(src/expressions/strsim.rs:127-161, :181-244), the occurrence-rank multiset
identity (strsim.rs:297-306), and the 4-cap shared prefix
(strsim.rs:261-266). The len-1/len-1 jaro direct compare is patched outside
the kernel exactly as jaro_match_stats_pallas_scan does.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.ops.jaro_pallas_scan import (
    _SUB,
    _WORD,
    _block_rows_for,
    _count_unequal_slots,
    _pack_params,
    _satmask,
)
from strsim_tpu.utils.encode import PAD_A, PAD_B

Array = jax.Array

_ALL_ONES = np.uint32(0xFFFFFFFF)
DEFAULT_BLOCK_ROWS = 8192
_MAX_WIDTH = 63  # two flag words; 64x64 blocked transpose


def supports_width(L: int) -> bool:
    """True iff the fused kernel covers padded width L (one or two flag
    words: the whole narrow ladder 7/15/23/31/47/63)."""
    return L <= _MAX_WIDTH


def _transpose_bits(words, n):
    """In-register n x n bit transpose (n = 16 or 32): out[i] bit k =
    words[k] bit i. High-half delta-swap ladder (orientation verified in
    tests and tools/ab_fused_lj.py's numpy oracle)."""
    x = list(words)
    j = n >> 1
    m = np.uint32(((1 << j) - 1) << j)
    while j:
        k = 0
        while k < n:
            for i in range(k, k + j):
                t = (x[i] ^ (x[i + j] << np.uint32(j))) & m
                x[i] = x[i] ^ t
                x[i + j] = x[i + j] ^ (t >> np.uint32(j))
            k += 2 * j
        j >>= 1
        if j:
            m = m ^ (m >> np.uint32(j))
    return x


def _transpose_eq(eqj, L, W, shape):
    """eqj[i][w] (bits over b rows j) -> per-j Myers Eq word lists
    eql[j][w'] (bits over a rows i). W = 1: one 16/32 ladder. W = 2: the
    64x64 transpose decomposes into four 32x32 block transposes — block
    (I, J) holds M[i][j] for i in [32I, 32I+32), j in [32J, 32J+32); its
    transpose supplies word I of every j in block column J."""
    u32 = jnp.uint32
    zero = jnp.zeros(shape, u32)
    if W == 1:
        NT = 16 if L <= 16 else 32
        cols = [eqj[i][0] for i in range(L)] + [zero] * (NT - L)
        eql = _transpose_bits(cols, NT)
        return [[eql[j]] for j in range(L)]
    tr = {}
    for J in range(2):
        for I in range(2):
            cols = [
                eqj[32 * I + ii][J] if 32 * I + ii < L else zero
                for ii in range(32)
            ]
            tr[(J, I)] = _transpose_bits(cols, 32)
    out = []
    for j in range(L):
        J, jj = divmod(j, 32)
        out.append([tr[(J, 0)][jj], tr[(J, 1)][jj]])
    return out


def _kernel(
    a_ref, b_ref, la_ref, lb_ref, *out_refs,
    L, pack, with_inter, with_prefix, with_osa=False, with_lcs=False,
):
    """Jaro greedy scan (storing EqB words) + bit transpose + Myers scan
    [+ popcount multiset + prefix + OSA + LCS]. The transposed words are
    the same-orientation Eq every DP recurrence consumes (see
    ops/dp_fused_pallas.py), so osa/lcs ride the transpose for the cost of
    their step updates alone — no second Eq structure anywhere.
    a_ref/b_ref: [1, L, 8, BR8] i32; la/lb and every output: [1, 8, BR8]
    i32. Output order: lev, m, t [, inter][, prefix][, osa][, lcs]."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)   # packed flag / EqB words
    WP = -(-L // pack)   # compacted sequence words (pack chars per i32)
    LOG_PACK, LOG_BITS = _pack_params(pack)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    bound = jnp.maximum(la, lb) // 2 - 1

    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    flag = [jnp.zeros(shape, u32) for _ in range(W)]
    seq_a = [jnp.zeros(shape, i32) for _ in range(WP)]
    m = jnp.zeros(shape, i32)
    inter = jnp.zeros(shape, i32) if with_inter else None
    eqj = []  # per a-position i: W EqB words (bits over b rows j)

    for i in range(L):  # static unroll — the jaro greedy scan
        a_i = a_rows[i]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        found = jnp.zeros(shape, bool)
        words = []
        for w in range(W):  # greedy: low word -> high
            eq_i = jnp.zeros(shape, i32)
            for j in range(w * _WORD, min((w + 1) * _WORD, L)):
                bit = np.int32(np.uint32(1) << np.uint32(j % _WORD))
                eq_i = eq_i | jnp.where(b_rows[j] == a_i, bit, np.int32(0))
            eqw = lax.bitcast_convert_type(eq_i, u32)
            words.append(eqw)
            win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
            cand = eqw & ~flag[w] & win
            cand = jnp.where(active & ~found, cand, np.uint32(0))
            lsb = cand & (~cand + np.uint32(1))
            flag[w] = flag[w] | lsb
            found = found | (cand != 0)
        eqj.append(words)

        if with_inter:
            # multiset occurrence-rank identity (ops/multiset_pallas.py):
            # position i of a contributes iff its occurrence rank among
            # equal chars of a is below cnt_b(a_i). cnt_b is the popcount
            # of the EqB words just built (bits past len_b are 0 — PAD_B
            # never equals a real char; a_i = PAD_A at i >= la matches
            # nothing, and the i < la mask guards the contribution).
            cnt_b = lax.population_count(words[0]).astype(i32)
            for w in range(1, W):
                cnt_b = cnt_b + lax.population_count(words[w]).astype(i32)
            occ = jnp.zeros(shape, i32)
            for k in range(i):
                occ = occ + jnp.where(a_rows[k] == a_i, np.int32(1), np.int32(0))
            inter = inter + ((occ < cnt_b) & (i < la)).astype(i32)

        # rank-compact the matched a-char: slot m of seq_a (matched
        # a-chars arrive in increasing i — already rank order)
        v = jnp.where(found, a_i, 0)
        val = v if pack == 1 else v << ((m & (pack - 1)) << LOG_BITS)
        mw = m if pack == 1 else m >> LOG_PACK
        for wp in range(WP):
            seq_a[wp] = seq_a[wp] | jnp.where(mw == wp, val, 0)
        m = m + found.astype(i32)

    # b-side rank compaction + transposition count (as the jaro kernel)
    seq_b = [jnp.zeros(shape, i32) for _ in range(WP)]
    rb = jnp.zeros(shape, i32)
    for j in range(L):
        fb = (flag[j // _WORD] >> np.uint32(j % _WORD)) & np.uint32(1)
        fbit = fb != 0
        v = jnp.where(fbit, b_rows[j], 0)
        val = v if pack == 1 else v << ((rb & (pack - 1)) << LOG_BITS)
        rw = rb if pack == 1 else rb >> LOG_PACK
        for wp in range(WP):
            seq_b[wp] = seq_b[wp] | jnp.where(rw == wp, val, 0)
        rb = rb + fbit.astype(i32)
    t = _count_unequal_slots(seq_a, seq_b, pack, shape)

    # transpose: eqj[i] bit j -> eql[j] bit i; the Myers scan's Eq for free
    eql = _transpose_eq(eqj, L, W, shape)

    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)
    score = la.astype(i32)
    if with_osa:
        osa_score = la.astype(i32)
    if with_lcs:
        lcs_V = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]
    if W == 1:
        pv = jnp.full(shape, _ALL_ONES, u32)
        mv = jnp.zeros(shape, u32)
        if with_osa:
            opv = jnp.full(shape, _ALL_ONES, u32)
            omv = jnp.zeros(shape, u32)
            d0p = jnp.zeros(shape, u32)
            pmo = jnp.zeros(shape, u32)
        for j in range(L):  # Myers step (levenshtein_pallas_scan._kernel)
            eq = eql[j][0]
            active = j < lb
            x = eq & pv
            s1 = x + pv
            xh = (s1 ^ pv) | eq
            xv = eq | mv
            ph = mv | ~(xh | pv)
            mh = pv & xh
            ph_bit = (ph >> hbit) & 1
            mh_bit = (mh >> hbit) & 1
            ph_s = (ph << 1) | np.uint32(1)
            mh_s = mh << 1
            pv_n = mh_s | ~(xv | ph_s)
            mv_n = ph_s & xv
            delta = ph_bit.astype(i32) - mh_bit.astype(i32)
            score = score + jnp.where(active, delta, 0)
            pv = jnp.where(active, pv_n, pv)
            mv = jnp.where(active, mv_n, mv)
            if with_osa:  # Hyyrö OSA step (osa_pallas_scan._kernel)
                tr = (((~d0p) & eq) << 1) & pmo
                x = eq & opv
                s1 = x + opv
                d0 = ((s1 ^ opv) | eq | omv) | tr
                hp = omv | ~(d0 | opv)
                hn = d0 & opv
                hp_bit = (hp >> hbit) & 1
                hn_bit = (hn >> hbit) & 1
                hp_s = (hp << 1) | np.uint32(1)
                hn_s = hn << 1
                opv_n = hn_s | ~(d0 | hp_s)
                omv_n = hp_s & d0
                osa_score = osa_score + jnp.where(
                    active, hp_bit.astype(i32) - hn_bit.astype(i32), 0)
                opv = jnp.where(active, opv_n, opv)
                omv = jnp.where(active, omv_n, omv)
                d0p = jnp.where(active, d0, d0p)
                pmo = jnp.where(active, eq, pmo)
            if with_lcs:  # Allison-Dix step (ops/lcs.py identities)
                U = lcs_V[0] & eq
                lcs_V[0] = jnp.where(
                    active, (lcs_V[0] + U) | (lcs_V[0] ^ U), lcs_V[0])
    else:
        # inter-word carry chains (levenshtein_pallas_scan._kernel_multiword
        # / osa_pallas_scan._kernel_multiword / ops/lcs.py multiword add)
        hword = m1 // _WORD
        pv = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]
        mv = [jnp.zeros(shape, u32) for _ in range(W)]
        if with_osa:
            opv = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]
            omv = [jnp.zeros(shape, u32) for _ in range(W)]
            d0p = [jnp.zeros(shape, u32) for _ in range(W)]
            pmo = [jnp.zeros(shape, u32) for _ in range(W)]
        for j in range(L):
            active = j < lb
            carry = jnp.zeros(shape, u32)
            ph_in = jnp.ones(shape, u32)
            mh_in = jnp.zeros(shape, u32)
            ph_bit = jnp.zeros(shape, u32)
            mh_bit = jnp.zeros(shape, u32)
            new_pv, new_mv = [], []
            for w in range(W):  # carries flow low word -> high
                eq_w, pv_w, mv_w = eql[j][w], pv[w], mv[w]
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
            pv = [jnp.where(active, n, o) for n, o in zip(new_pv, pv)]
            mv = [jnp.where(active, n, o) for n, o in zip(new_mv, mv)]

            if with_osa:
                carry = jnp.zeros(shape, u32)
                tr_in = jnp.zeros(shape, u32)
                hp_in = jnp.ones(shape, u32)
                hn_in = jnp.zeros(shape, u32)
                hp_bit = jnp.zeros(shape, u32)
                hn_bit = jnp.zeros(shape, u32)
                new_opv, new_omv, new_d0 = [], [], []
                for w in range(W):
                    eq_w, pv_w, mv_w = eql[j][w], opv[w], omv[w]
                    tt = (~d0p[w]) & eq_w
                    tr = ((tt << 1) | tr_in) & pmo[w]
                    tr_in = tt >> (_WORD - 1)
                    x = eq_w & pv_w
                    s1 = x + pv_w
                    c1 = (s1 < x).astype(u32)
                    s2 = s1 + carry
                    c2 = (s2 < s1).astype(u32)
                    carry = c1 | c2
                    d0 = ((s2 ^ pv_w) | eq_w | mv_w) | tr
                    hp = mv_w | ~(d0 | pv_w)
                    hn = d0 & pv_w
                    sel = hword == w
                    hp_bit = jnp.where(sel, (hp >> hbit) & 1, hp_bit)
                    hn_bit = jnp.where(sel, (hn >> hbit) & 1, hn_bit)
                    hp_out = hp >> (_WORD - 1)
                    hn_out = hn >> (_WORD - 1)
                    hp_s = (hp << 1) | hp_in
                    hn_s = (hn << 1) | hn_in
                    hp_in, hn_in = hp_out, hn_out
                    new_opv.append(hn_s | ~(d0 | hp_s))
                    new_omv.append(hp_s & d0)
                    new_d0.append(d0)
                osa_score = osa_score + jnp.where(
                    active, hp_bit.astype(i32) - hn_bit.astype(i32), 0)
                opv = [jnp.where(active, n, o) for n, o in zip(new_opv, opv)]
                omv = [jnp.where(active, n, o) for n, o in zip(new_omv, omv)]
                d0p = [jnp.where(active, n, o) for n, o in zip(new_d0, d0p)]
                pmo = [jnp.where(active, eql[j][w], o)
                       for w, o in enumerate(pmo)]

            if with_lcs:
                carry = jnp.zeros(shape, u32)
                for w in range(W):
                    U = lcs_V[w] & eql[j][w]
                    s1 = lcs_V[w] + U
                    c1 = (s1 < U).astype(u32)
                    s2 = s1 + carry
                    c2 = (s2 < s1).astype(u32)
                    carry = c1 | c2
                    lcs_V[w] = jnp.where(
                        active, s2 | (lcs_V[w] ^ U), lcs_V[w])

    outs = [score, m, t]
    if with_inter:
        outs.append(inter)
    if with_prefix:
        # 4-cap shared prefix (strsim.rs:261-266): pads differ per side, so
        # compares past either length are False with no masking
        run = None
        pref = jnp.zeros(shape, i32)
        for kk in range(min(L, 4)):
            e = a_rows[kk] == b_rows[kk]
            run = e if run is None else (run & e)
            pref = pref + run.astype(i32)
        outs.append(pref)
    if with_osa:
        outs.append(osa_score)
    if with_lcs:
        # lcs = la - popcount(V & mask(la)) (ops/lcs.py: stray carries past
        # bit la-1 cannot flow back down, one final mask is exact)
        cnt = jnp.zeros(shape, i32)
        for w in range(W):
            mask_w = _satmask(la - w * _WORD)
            cnt = cnt + lax.population_count(lcs_V[w] & mask_w).astype(i32)
        outs.append(la.astype(i32) - cnt)
    for ref, val in zip(out_refs, outs):
        ref[0] = val


def _fused_block_rows(L: int, pack: int, block_rows: int) -> int:
    """The kernel's live state beyond the jaro kernel's is the stored EqB
    matrix: L x W u32 arrays per lane block. Keep the whole program
    VMEM-resident: halve rows at two flag words, and at wider compaction
    slots (pack < 4) exactly as the jaro kernel does."""
    cap = block_rows
    if L > _WORD:
        cap = min(cap, 4096)
    if pack == 2:
        cap = min(cap, 4096)
    elif pack == 1:
        cap = min(cap, 2048)
    return cap


def fused_stats_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    with_inter: bool = False,
    with_prefix: bool = False,
    with_osa: bool = False,
    with_lcs: bool = False,
    pack: Optional[int] = None,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: Optional[bool] = None,
) -> Tuple[Array, ...]:
    """(lev_d, m, t[, inter][, prefix][, osa_d][, lcs_len]) in one fused
    pass — drop-in for running the levenshtein, jaro [, multiset][, prefix]
    [, osa][, lcs] production kernels on the same [B, L] tiles; osa/lcs
    consume the transposed Eq words the Myers scan already uses (the
    same-orientation sharing of ops/dp_fused_pallas.py, riding this
    kernel's transpose). L <= 63 (one or two flag words).

    `pack` mirrors ops/jaro_pallas_scan.jaro_match_stats_pallas_scan's
    contract: 4 (default) for 8-bit tiles, 2 when every codepoint < 2**16
    (caller-asserted — the pipeline knows the bucket max from tile
    narrowing), 1 for arbitrary codepoints. The len-1/len-1 jaro patch is
    applied here exactly as the jaro kernel does.
    """
    B, L = a.shape
    if not supports_width(L):
        raise ValueError(f"fused kernel requires width <= {_MAX_WIDTH}, got {L}")
    if pack is None:
        if a.dtype.itemsize != 1 or b.dtype.itemsize != 1:
            raise ValueError(
                "fused kernel compacts matched chars into 32/pack-bit slots: "
                f"tiles of dtype {a.dtype}/{b.dtype} need an explicit pack "
                "(2 if all codepoints < 2**16 else 1); only 8-bit tiles "
                "default to pack=4"
            )
        pack = 4
    if pack not in (1, 2, 4):
        raise ValueError(f"pack must be 1, 2 or 4, got {pack}")
    if pack == 4 and (a.dtype.itemsize != 1 or b.dtype.itemsize != 1):
        raise ValueError(
            f"pack=4 byte-packs matched chars: tiles must be an 8-bit dtype "
            f"(got {a.dtype}/{b.dtype})"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32

    pad_rows = 0
    if B % _SUB:
        pad_rows = _SUB - B % _SUB
        zi = jnp.zeros((pad_rows,), len_a.dtype)
        a = jnp.concatenate([a, jnp.full((pad_rows, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((pad_rows, L), PAD_B, b.dtype)], axis=0)
        len_a = jnp.concatenate([len_a, zi])
        len_b = jnp.concatenate([len_b, zi])
        B = B + pad_rows

    BR = _block_rows_for(B, _fused_block_rows(L, pack, block_rows))
    BR8 = BR // _SUB
    G = B // BR

    aT = a.T.astype(i32)
    bT = b.T.astype(i32)
    a4 = aT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = bT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)

    def tile_spec(rows):
        return pl.BlockSpec(
            (1, rows, _SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )

    row_spec = pl.BlockSpec(
        (1, _SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )

    n_out = (3 + int(with_inter) + int(with_prefix)
             + int(with_osa) + int(with_lcs))
    res = pl.pallas_call(
        functools.partial(
            _kernel, L=L, pack=pack,
            with_inter=with_inter, with_prefix=with_prefix,
            with_osa=with_osa, with_lcs=with_lcs,
        ),
        out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),) * n_out,
        grid=(G,),
        in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
        out_specs=(row_spec,) * n_out,
        interpret=interpret,
    )(a4, b4, la3, lb3)
    res = [r.reshape(B) for r in res]
    if pad_rows:
        res = [r[: B - pad_rows] for r in res]
        B = B - pad_rows

    # len-1 vs len-1: direct char compare (strsim.rs:197-199), same patch as
    # jaro_match_stats_pallas_scan
    la_r = len_a[:B].astype(i32)
    lb_r = len_b[:B].astype(i32)
    one_one = (la_r == 1) & (lb_r == 1)
    eq11 = aT[0, :B] == bT[0, :B]
    res[1] = jnp.where(one_one, eq11.astype(i32), res[1])
    res[2] = jnp.where(one_one, 0, res[2])
    return tuple(res)


def lev_jaro_stats_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """(lev_d, m, t) — the round-4 pair contract, now a thin wrapper over
    fused_stats_pallas (int8 tiles, pack=4)."""
    return fused_stats_pallas(
        a, b, len_a, len_b, block_rows=block_rows, interpret=interpret
    )
