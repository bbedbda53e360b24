"""Same-orientation fused DP Pallas kernel: levenshtein / OSA / LCS off one
Eq build (ROOFLINE "known headroom" #7, round 5).

The three bit-parallel DP recurrences consume the SAME per-text-position Eq
word (bit i of word w = (a_i == b_j), ops/levenshtein_pallas_scan.py:88-103)
— unlike jaro's EqB, no transpose is even needed. Run separately, each
kernel rebuilds that ~3L² lane-op structure, which dominates all three
(docs/ROOFLINE.md cost model; the fused-five ablation put the build at ~70%
of its kernel). This kernel builds Eq once per step and advances whichever
recurrences the stat request needs:

  * levenshtein — Myers column DP (identical steps to
    ops/levenshtein_pallas_scan._kernel / _kernel_multiword);
  * osa — Hyyrö's D0 formulation with the transposition vector
    (ops/osa_pallas_scan, +2 carried vectors, ~6 extra word ops);
  * lcs — Allison-Dix row vector: U = V & Eq; V = (V + U) | (V ^ U)
    (ops/lcs.py identities, fuzz-locked there), the first PALLAS path for
    lcs_len at all (the XLA kernel materializes its [L, W, B] Eq words in
    HBM between the precompute and the scan).

Serving paths that hit this: the all-nine extension fused set (osa + lcs
together), compute_many sets mixing levenshtein with osa/lcs_seq/indel when
jaro is absent (when jaro IS in the set, lev rides the shared-equality
transpose kernel, ops/lev_jaro_pallas.py, and this kernel serves the rest),
and lcs_seq/indel alone. Unrolled W <= 2 (widths <= 63, the narrow
ladder); a fori_loop wide variant with stacked carried state and per-block
dynamic trip counts (same design as the lev/osa wide kernels) extends the
shared-Eq fusion through width 512 — the full ladder.

Contracts are identical to the kernels/stats each output replaces:
lev_d/osa_d valid where both lengths >= 1 (host finalizer resolves empty
sides), lcs_len = 0 when a side is empty. Off-TPU the identical kernel runs
under the Pallas interpreter (W = 1 widths only in CI — the unrolled W = 2
bodies hit the same XLA:CPU compile wall as every multiword kernel; TPU
parity for those is tools/ab_dp_fused.py's job).
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

from strsim_tpu.ops.jaro_pallas_scan import _block_rows_for, _satmask
from strsim_tpu.utils.encode import PAD_A, PAD_B

Array = jax.Array

_WORD = 32
_SUB = 8
_ALL_ONES = np.uint32(0xFFFFFFFF)
DEFAULT_BLOCK_ROWS = 8192
_MAX_WIDTH = 63       # unrolled variant: one or two words
_MAX_WIDTH_WIDE = 512  # fori_loop wide variant: the whole ladder


def supports_width(L: int) -> bool:
    """True iff a kernel specialization covers padded width L (unrolled at
    L <= 63, fori_loop wide variant through 512)."""
    return L <= _MAX_WIDTH_WIDE


def _kernel(a_ref, b_ref, la_ref, lb_ref, *out_refs,
            L, with_lev, with_osa, with_lcs):
    """One Eq build per text position feeding the requested recurrences.
    a/b: [1, L, 8, BR8] i32; la/lb and outputs (lev[, osa][, lcs] in that
    order, only the requested ones): [1, 8, BR8] i32."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    m1 = jnp.maximum(la - 1, 0)
    hword = m1 // _WORD
    hbit = (m1 % _WORD).astype(u32)

    if with_lev:
        pv = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]
        mv = [jnp.zeros(shape, u32) for _ in range(W)]
        lev = la.astype(i32)
    if with_osa:
        opv = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]
        omv = [jnp.zeros(shape, u32) for _ in range(W)]
        d0p = [jnp.zeros(shape, u32) for _ in range(W)]
        pmo = [jnp.zeros(shape, u32) for _ in range(W)]
        osa = la.astype(i32)
    if with_lcs:
        V = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]

    a_rows = [a_ref[0, i] for i in range(L)]
    for j in range(L):  # static unroll: L is the bucket width
        b_j = b_ref[0, j]
        eq = []
        for w in range(W):  # per-word Eq from only the real pattern rows
            eq_i = jnp.zeros(shape, i32)
            for i in range(w * _WORD, min((w + 1) * _WORD, L)):
                wt = np.int32(np.uint32(1) << np.uint32(i % _WORD))
                eq_i = eq_i | jnp.where(a_rows[i] == b_j, wt, np.int32(0))
            eq.append(lax.bitcast_convert_type(eq_i, u32))
        active = j < lb

        if with_lev:  # Myers step (levenshtein_pallas_scan._kernel_multiword)
            carry = jnp.zeros(shape, u32)
            ph_in = jnp.ones(shape, u32)
            mh_in = jnp.zeros(shape, u32)
            ph_bit = jnp.zeros(shape, u32)
            mh_bit = jnp.zeros(shape, u32)
            new_pv, new_mv = [], []
            for w in range(W):  # carries flow low word -> high
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
            lev = lev + jnp.where(
                active, ph_bit.astype(i32) - mh_bit.astype(i32), 0)
            pv = [jnp.where(active, n, o) for n, o in zip(new_pv, pv)]
            mv = [jnp.where(active, n, o) for n, o in zip(new_mv, mv)]

        if with_osa:  # Hyyrö OSA step (osa_pallas_scan._kernel_multiword)
            carry = jnp.zeros(shape, u32)
            tr_in = jnp.zeros(shape, u32)
            hp_in = jnp.ones(shape, u32)
            hn_in = jnp.zeros(shape, u32)
            hp_bit = jnp.zeros(shape, u32)
            hn_bit = jnp.zeros(shape, u32)
            new_pv, new_mv, new_d0 = [], [], []
            for w in range(W):
                eq_w, pv_w, mv_w = eq[w], opv[w], omv[w]
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
            osa = osa + jnp.where(
                active, hp_bit.astype(i32) - hn_bit.astype(i32), 0)
            opv = [jnp.where(active, n, o) for n, o in zip(new_pv, opv)]
            omv = [jnp.where(active, n, o) for n, o in zip(new_mv, omv)]
            d0p = [jnp.where(active, n, o) for n, o in zip(new_d0, d0p)]
            pmo = [jnp.where(active, n, o) for n, o in zip(eq, pmo)]

        if with_lcs:  # Allison-Dix step (ops/lcs.py identities)
            carry = jnp.zeros(shape, u32)
            new_V = []
            for w in range(W):
                U = V[w] & eq[w]
                s1 = V[w] + U
                c1 = (s1 < U).astype(u32)
                s2 = s1 + carry
                c2 = (s2 < s1).astype(u32)
                carry = c1 | c2
                new_V.append(s2 | (V[w] ^ U))
            V = [jnp.where(active, n, o) for n, o in zip(new_V, V)]

    outs = []
    if with_lev:
        outs.append(lev)
    if with_osa:
        outs.append(osa)
    if with_lcs:
        # lcs = la - popcount(V & mask(la)); stray carries past bit la-1
        # cannot flow back down (ops/lcs.py), so one final mask is exact
        cnt = jnp.zeros(shape, i32)
        for w in range(W):
            mask_w = _satmask(la - w * _WORD)
            cnt = cnt + lax.population_count(V[w] & mask_w).astype(i32)
        outs.append(la.astype(i32) - cnt)
    for ref, val in zip(out_refs, outs):
        ref[0] = val


def _kernel_wide(nmax_ref, a_ref, b_ref, la_ref, lb_ref, *out_refs,
                 L, with_lev, with_osa, with_lcs):
    """Wide-bucket variant (64 < L <= 512): identical recurrences to
    _kernel, but the scan over text positions is a lax.fori_loop with
    stacked carried state ([W, 8, BR8] per vector) and a per-block dynamic
    trip count (scalar prefetch — blocks are length-sorted upstream, so
    short blocks in a wide bucket stop early). One shared Eq build per
    step feeds every requested recurrence, exactly as in _kernel."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    m1 = jnp.maximum(la - 1, 0)
    hword = m1 // _WORD
    hbit = (m1 % _WORD).astype(u32)

    state0 = []
    if with_lev:
        state0 += [jnp.full((W,) + shape, _ALL_ONES, u32),
                   jnp.zeros((W,) + shape, u32), la.astype(i32)]
    if with_osa:
        state0 += [jnp.full((W,) + shape, _ALL_ONES, u32),
                   jnp.zeros((W,) + shape, u32),
                   jnp.zeros((W,) + shape, u32),
                   jnp.zeros((W,) + shape, u32), la.astype(i32)]
    if with_lcs:
        state0 += [jnp.full((W,) + shape, _ALL_ONES, u32)]

    def body(j, state):
        st = list(state)
        b_j = b_ref[0, j]
        eq = []
        for w in range(W):
            eq_i = jnp.zeros(shape, i32)
            for i in range(w * _WORD, min((w + 1) * _WORD, L)):
                wt = np.int32(np.uint32(1) << np.uint32(i % _WORD))
                eq_i = eq_i | jnp.where(a_ref[0, i] == b_j, wt, np.int32(0))
            eq.append(lax.bitcast_convert_type(eq_i, u32))
        active = j < lb
        act = active[None]
        out = []

        if with_lev:
            pv, mv, lev = st[:3]
            st = st[3:]
            carry = jnp.zeros(shape, u32)
            ph_in = jnp.ones(shape, u32)
            mh_in = jnp.zeros(shape, u32)
            ph_bit = jnp.zeros(shape, u32)
            mh_bit = jnp.zeros(shape, u32)
            new_pv, new_mv = [], []
            for w in range(W):
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
            lev = lev + jnp.where(
                active, ph_bit.astype(i32) - mh_bit.astype(i32), 0)
            out += [jnp.where(act, jnp.stack(new_pv), pv),
                    jnp.where(act, jnp.stack(new_mv), mv), lev]

        if with_osa:
            opv, omv, d0p, pmo, osa = st[:5]
            st = st[5:]
            carry = jnp.zeros(shape, u32)
            tr_in = jnp.zeros(shape, u32)
            hp_in = jnp.ones(shape, u32)
            hn_in = jnp.zeros(shape, u32)
            hp_bit = jnp.zeros(shape, u32)
            hn_bit = jnp.zeros(shape, u32)
            new_pv, new_mv, new_d0 = [], [], []
            for w in range(W):
                eq_w, pv_w, mv_w = eq[w], opv[w], omv[w]
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
            osa = osa + jnp.where(
                active, hp_bit.astype(i32) - hn_bit.astype(i32), 0)
            out += [jnp.where(act, jnp.stack(new_pv), opv),
                    jnp.where(act, jnp.stack(new_mv), omv),
                    jnp.where(act, jnp.stack(new_d0), d0p),
                    jnp.where(act, jnp.stack(eq), pmo), osa]

        if with_lcs:
            V = st[0]
            carry = jnp.zeros(shape, u32)
            new_V = []
            for w in range(W):
                U = V[w] & eq[w]
                s1 = V[w] + U
                c1 = (s1 < U).astype(u32)
                s2 = s1 + carry
                c2 = (s2 < s1).astype(u32)
                carry = c1 | c2
                new_V.append(s2 | (V[w] ^ U))
            out += [jnp.where(act, jnp.stack(new_V), V)]

        return tuple(out)

    n = nmax_ref[pl.program_id(0)]
    state = lax.fori_loop(0, n, body, tuple(state0))
    st = list(state)
    outs = []
    if with_lev:
        outs.append(st[2])
        st = st[3:]
    if with_osa:
        outs.append(st[4])
        st = st[5:]
    if with_lcs:
        V = st[0]
        cnt = jnp.zeros(shape, i32)
        for w in range(W):
            mask_w = _satmask(la - w * _WORD)
            cnt = cnt + lax.population_count(V[w] & mask_w).astype(i32)
        outs.append(la.astype(i32) - cnt)
    for ref, val in zip(out_refs, outs):
        ref[0] = val


def dp_fused_stats_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    with_lev: bool = False,
    with_osa: bool = False,
    with_lcs: bool = False,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: Optional[bool] = None,
) -> Tuple[Array, ...]:
    """(lev_d?, osa_d?, lcs_len?) — the requested subset, in that order —
    from ONE per-step Eq build. [B, L] padded tiles (any int dtype; the
    recurrences compare full codepoints). Unrolled at L <= 63; fori_loop
    wide variant through L <= 512 with a per-block dynamic trip count."""
    B, L = a.shape
    if not supports_width(L):
        raise ValueError(
            f"dp-fused kernel requires width <= {_MAX_WIDTH_WIDE}, got {L}")
    if not (with_lev or with_osa or with_lcs):
        raise ValueError("at least one of with_lev/with_osa/with_lcs")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32
    wide = L > _MAX_WIDTH

    pad_rows = 0
    if B % _SUB:
        pad_rows = _SUB - B % _SUB
        zi = jnp.zeros((pad_rows,), len_a.dtype)
        a = jnp.concatenate([a, jnp.full((pad_rows, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((pad_rows, L), PAD_B, b.dtype)], axis=0)
        len_a = jnp.concatenate([len_a, zi])
        len_b = jnp.concatenate([len_b, zi])
        B = B + pad_rows

    if wide:
        from strsim_tpu.ops.levenshtein_pallas_scan import _wide_block_rows

        cap = _wide_block_rows(L, block_rows)
    else:
        cap = min(block_rows, 4096 if L > _WORD else block_rows)
    BR = _block_rows_for(B, cap)
    BR8 = BR // _SUB
    G = B // BR

    a4 = a.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = b.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)

    n_out = int(with_lev) + int(with_osa) + int(with_lcs)
    if wide:
        # per-block dynamic trip count (blocks are length-sorted upstream)
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
            out_specs=(row_spec,) * n_out,
        )
        res = pl.pallas_call(
            functools.partial(
                _kernel_wide, L=L,
                with_lev=with_lev, with_osa=with_osa, with_lcs=with_lcs,
            ),
            out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),) * n_out,
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
        res = pl.pallas_call(
            functools.partial(
                _kernel, L=L,
                with_lev=with_lev, with_osa=with_osa, with_lcs=with_lcs,
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
    return tuple(res)
