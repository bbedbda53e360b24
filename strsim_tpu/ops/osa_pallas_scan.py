"""Pallas (Mosaic) bit-parallel OSA scan — EXTENSION production kernel.

Same VMEM-resident design as the production Pallas levenshtein scan
(ops/levenshtein_pallas_scan.py — in-kernel Eq build from i32 char tiles,
fully unrolled static scan, [8, BR/8] sublane-folded batch), computing the
OSA / restricted Damerau-Levenshtein distance of ops/osa_myers.py in Hyyrö's
D0 formulation (the transposition vector TR must be OR-ed into the
diagonal-zero vector before HP/HN/PV/MV derive from it — see osa_myers
module docstring). Two extra loop-carried vectors per word (previous D0,
previous Eq) and ~6 extra word ops per step versus the levenshtein scan.

Measured on v5e (262144-row blocks, bit-exact vs the XLA kernel at every
width, tools/ab_osa_pallas.py, 2026-08-18):
  w7 3476 vs 1350 M pairs/s (+157%), w15 1484 vs 1140 (+30%), w31 638 vs
  495 (+29%); multiword w47 235 vs 128 (+84%), w63 151 vs 77 (+96%).
"auto" (config.osa_impl) selects this kernel on TPU at all widths <= 63.

Exactness: identical integer contract to osa_distance_myers (valid where
both lengths >= 1; empty-side rows resolved by the host finalizer); the
differential lock against the XLA kernel and the classic DP oracle lives in
tests/test_extensions.py and tests/test_pallas.py. Off-TPU backends run the
identical kernel via the Pallas interpreter.

Environment note (same as the levenshtein scan): the terminal-side Mosaic
compiler rejects int8 VMEM blocks and u32 reductions, so char tiles are i32
and the Eq accumulate is i32 bitcast to u32.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.utils.encode import PAD_A

Array = jax.Array

_WORD = 32
_SUB = 8
_ALL_ONES = np.uint32(0xFFFFFFFF)
DEFAULT_BLOCK_ROWS = 8192

_MAX_WORDS = 2  # unrolled multi-word variant written for W <= 2 (L <= 64)
_MAX_WORDS_WIDE = 16  # fori_loop wide variant (L <= 512: the full ladder)


def supports_width(L: int) -> bool:
    """True iff a kernel specialization covers padded width L (unrolled at
    L <= 64, fori_loop wide variant through L <= 512)."""
    return L <= _WORD * _MAX_WORDS_WIDE


def _kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """W = 1 (L <= 32). Refs as in levenshtein_pallas_scan._kernel."""
    u32, i32 = jnp.uint32, jnp.int32
    la = la_ref[0]
    lb = lb_ref[0]

    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)

    pv = jnp.full(la.shape, _ALL_ONES, u32)
    mv = jnp.zeros(la.shape, u32)
    d0p = jnp.zeros(la.shape, u32)  # D0 of the previous step
    pmo = jnp.zeros(la.shape, u32)  # Eq of the previous step
    score = la.astype(i32)

    a_rows = [a_ref[0, i] for i in range(L)]
    for j in range(L):  # static unroll: L is the bucket width
        b_j = b_ref[0, j]
        # Eq build over the L real pattern rows (see levenshtein_pallas_scan
        # for why bits >= L and the i32 accumulate are exact)
        eq_i = jnp.zeros(la.shape, i32)
        for i in range(L):
            w = np.int32(np.uint32(1) << np.uint32(i))
            eq_i = eq_i | jnp.where(a_rows[i] == b_j, w, np.int32(0))
        eq = lax.bitcast_convert_type(eq_i, u32)
        active = j < lb

        # one Hyyrö OSA step (identical recurrence to osa_myers.body)
        tr = (((~d0p) & eq) << 1) & pmo
        x = eq & pv
        s1 = x + pv
        d0 = ((s1 ^ pv) | eq | mv) | tr
        hp = mv | ~(d0 | pv)
        hn = d0 & pv
        hp_bit = (hp >> hbit) & 1
        hn_bit = (hn >> hbit) & 1
        hp_s = (hp << 1) | np.uint32(1)
        hn_s = hn << 1
        pv_n = hn_s | ~(d0 | hp_s)
        mv_n = hp_s & d0

        delta = hp_bit.astype(i32) - hn_bit.astype(i32)
        score = score + jnp.where(active, delta, 0)
        pv = jnp.where(active, pv_n, pv)
        mv = jnp.where(active, mv_n, mv)
        d0p = jnp.where(active, d0, d0p)
        pmo = jnp.where(active, eq, pmo)

    out_ref[0] = score


def _kernel_multiword(a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """Multi-word (W <= _MAX_WORDS) variant: inter-word carry chains for the
    Myers add and the three left-shifts (TR term, HP, HN), low word -> high."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    m1 = jnp.maximum(la - 1, 0)
    hword = m1 // _WORD
    hbit = (m1 % _WORD).astype(u32)

    pv = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]
    mv = [jnp.zeros(shape, u32) for _ in range(W)]
    d0p = [jnp.zeros(shape, u32) for _ in range(W)]
    pmo = [jnp.zeros(shape, u32) for _ in range(W)]
    score = la.astype(i32)

    a_rows = [a_ref[0, i] for i in range(L)]
    for j in range(L):  # static unroll
        b_j = b_ref[0, j]
        eq = []
        for w in range(W):
            eq_i = jnp.zeros(shape, i32)
            for i in range(w * _WORD, min((w + 1) * _WORD, L)):
                wt = np.int32(np.uint32(1) << np.uint32(i % _WORD))
                eq_i = eq_i | jnp.where(a_rows[i] == b_j, wt, np.int32(0))
            eq.append(lax.bitcast_convert_type(eq_i, u32))
        active = j < lb

        carry = jnp.zeros(shape, u32)
        tr_in = jnp.zeros(shape, u32)
        hp_in = jnp.ones(shape, u32)
        hn_in = jnp.zeros(shape, u32)
        hp_bit = jnp.zeros(shape, u32)
        hn_bit = jnp.zeros(shape, u32)
        new_pv, new_mv, new_d0 = [], [], []
        for w in range(W):  # carries flow low word -> high
            eq_w, pv_w, mv_w = eq[w], pv[w], mv[w]
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
        pv = [jnp.where(active, n, o) for n, o in zip(new_pv, pv)]
        mv = [jnp.where(active, n, o) for n, o in zip(new_mv, mv)]
        d0p = [jnp.where(active, n, o) for n, o in zip(new_d0, d0p)]
        pmo = [jnp.where(active, n, o) for n, o in zip(eq, pmo)]

    out_ref[0] = score


def _kernel_wide(nmax_ref, a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """Wide-bucket variant (W <= _MAX_WORDS_WIDE): identical Hyyrö OSA
    recurrence to _kernel_multiword, scan over text positions as a
    lax.fori_loop with a per-block dynamic trip count (scalar prefetch) —
    see levenshtein_pallas_scan._kernel_wide for the design rationale."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    m1 = jnp.maximum(la - 1, 0)
    hword = m1 // _WORD
    hbit = (m1 % _WORD).astype(u32)

    pv0 = jnp.full((W,) + shape, _ALL_ONES, u32)
    mv0 = jnp.zeros((W,) + shape, u32)
    d0p0 = jnp.zeros((W,) + shape, u32)
    pmo0 = jnp.zeros((W,) + shape, u32)
    score0 = la.astype(i32)

    def body(j, state):
        pv, mv, d0p, pmo, score = state
        b_j = b_ref[0, j]
        eq = []
        for w in range(W):
            eq_i = jnp.zeros(shape, i32)
            for i in range(w * _WORD, min((w + 1) * _WORD, L)):
                wt = np.int32(np.uint32(1) << np.uint32(i % _WORD))
                eq_i = eq_i | jnp.where(a_ref[0, i] == b_j, wt, np.int32(0))
            eq.append(lax.bitcast_convert_type(eq_i, u32))
        active = j < lb

        carry = jnp.zeros(shape, u32)
        tr_in = jnp.zeros(shape, u32)
        hp_in = jnp.ones(shape, u32)
        hn_in = jnp.zeros(shape, u32)
        hp_bit = jnp.zeros(shape, u32)
        hn_bit = jnp.zeros(shape, u32)
        new_pv, new_mv, new_d0 = [], [], []
        for w in range(W):  # carries flow low word -> high
            eq_w, pv_w, mv_w = eq[w], pv[w], mv[w]
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
        act = active[None]
        pv = jnp.where(act, jnp.stack(new_pv), pv)
        mv = jnp.where(act, jnp.stack(new_mv), mv)
        d0p = jnp.where(act, jnp.stack(new_d0), d0p)
        pmo = jnp.where(act, jnp.stack(eq), pmo)
        return pv, mv, d0p, pmo, score

    n = nmax_ref[pl.program_id(0)]
    _, _, _, _, score = lax.fori_loop(0, n, body, (pv0, mv0, d0p0, pmo0, score0))
    out_ref[0] = score


def _block_rows_for(B: int, block_rows: int) -> int:
    br = min(block_rows, B)
    while B % br:
        br //= 2
    return br


def osa_distance_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
) -> Array:
    """OSA distance per row pair; Pallas unrolled Hyyrö scan (W=1 fast path
    at L <= 32, inter-word carry chain at L <= 64, fori_loop wide kernel
    with per-block dynamic trips through L <= 512). Contract identical to
    ops.osa_myers.osa_distance_myers."""
    B, L = a.shape
    if not supports_width(L):
        raise ValueError(
            f"pallas_scan kernel requires width <= {_WORD * _MAX_WORDS_WIDE}, got {L}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32
    wide = L > _WORD * _MAX_WORDS

    pad_rows = 0
    if B % _SUB:
        pad_rows = _SUB - B % _SUB
        zi = jnp.zeros((pad_rows,), len_a.dtype)
        a = jnp.concatenate([a, jnp.full((pad_rows, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((pad_rows, L), PAD_A, b.dtype)], axis=0)
        len_a = jnp.concatenate([len_a, zi])
        len_b = jnp.concatenate([len_b, zi])
        B = B + pad_rows

    from strsim_tpu.ops.levenshtein_pallas_scan import _wide_block_rows

    BR = _block_rows_for(B, _wide_block_rows(L, block_rows) if wide else block_rows)
    BR8 = BR // _SUB
    G = B // BR

    aT = a.T.astype(i32)
    bT = b.T.astype(i32)
    a4 = aT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = bT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)

    if wide:
        nmax = jnp.minimum(jnp.max(lb3, axis=(1, 2)), L).astype(i32)  # [G]

        def tile_spec(rows):
            return pl.BlockSpec(
                (1, rows, _SUB, BR8), lambda g, n: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )

        row_spec = pl.BlockSpec(
            (1, _SUB, BR8), lambda g, n: (g, 0, 0), memory_space=pltpu.VMEM
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
            out_specs=row_spec,
        )
        out = pl.pallas_call(
            functools.partial(_kernel_wide, L=L),
            out_shape=jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
            grid_spec=grid_spec,
            interpret=interpret,
        )(nmax, a4, b4, la3, lb3)
    else:
        def tile_spec(rows):
            return pl.BlockSpec(
                (1, rows, _SUB, BR8), lambda g: (g, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )

        row_spec = pl.BlockSpec(
            (1, _SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_kernel if L <= _WORD else _kernel_multiword, L=L),
            out_shape=jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
            grid=(G,),
            in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
            out_specs=row_spec,
            interpret=interpret,
        )(a4, b4, la3, lb3)
    out = out.reshape(B)
    if pad_rows:
        out = out[: B - pad_rows]
    return out
