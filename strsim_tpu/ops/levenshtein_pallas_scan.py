"""Pallas (Mosaic) bit-parallel Levenshtein scan — W = 1 production kernel.

Reference semantics: unit-cost edit distance per row pair
(src/expressions/strsim.rs:146-160), identical integer contract to
ops.levenshtein_myers.levenshtein_distance_myers. This module is the
TPU-kernel formulation of the same Myers/Hyyrö column DP for patterns that
fit ONE machine word (len_a <= 32 — every standard bucket up to width 31):

  * the whole kernel is one VMEM-resident program: the Eq bitmask build
    (pattern char i == text char j, bit i of word Eq_j) happens INSIDE the
    kernel from i32 char tiles, so the [L, B] Eq tensor never exists in HBM
    (the XLA kernel materializes it between the parallel precompute and the
    sequential while-loop);
  * the scan over text positions is fully unrolled — L is static per bucket
    — so there is no loop machinery at all: Mosaic sees one straight-line
    body of ~L*(32 compare+select+or) + ~L*18 word ops with pv/mv/score
    pinned in vector registers/VMEM for the whole program;
  * batch is folded to [8, BR/8] minor dims so every op fills (8, 128)
    register tiles (the sublane fix measured in tools/ab_myers_sublane.py).

Measured on v5e (262144-row blocks, bit-exact vs the XLA kernel at every
point; this module's L-row Eq build, which cut the probe's 32-row build
by 32/L): w7 3498 vs 1259 M pairs/s (+178%), w15 1601 vs 950 (+69%),
w31 630 vs 558 (+13%); multiword variant w47 335 vs 131 (+156%), w63 146
vs 81 (+81%). Grid block BR = 8192 rows is the winner at all widths
(tools/ab_myers_pallas.py).

Environment note: the terminal-side Mosaic compiler in this sandbox rejects
int8 VMEM blocks and u32 reductions (HTTP 500) — hence i32 char tiles and an
i32 Eq accumulate bitcast to u32. Off-TPU backends run the identical kernel
via the Pallas interpreter (exactness tests use this); the pipeline only
selects this kernel on TPU.

Exactness: integer Myers recurrence, identical active-step masking
(`j < len_b`) to the XLA kernel; rows with an empty side return len_a,
ignored by the host finalizer (ops/finalize.py) exactly as the XLA kernel's
contract states.
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
_SUB = 8  # sublane fold
_ALL_ONES = np.uint32(0xFFFFFFFF)
DEFAULT_BLOCK_ROWS = 8192


_MAX_WORDS = 2  # unrolled multi-word variant written for W <= 2 (L <= 64)
_MAX_WORDS_WIDE = 16  # fori_loop wide variant (L <= 512: the full ladder)


def supports_width(L: int) -> bool:
    """True iff a kernel specialization covers padded width L (unrolled at
    L <= 64, fori_loop wide variant through L <= 512 — the whole standard
    bucket ladder incl. the 95..511 tail)."""
    return L <= _WORD * _MAX_WORDS_WIDE


def _kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """a_ref: [1, L, 8, BR8] i32 pattern chars (PAD_A past len); b_ref:
    [1, L, 8, BR8] i32 text chars; la/lb/out: [1, 8, BR8] i32.
    """
    u32, i32 = jnp.uint32, jnp.int32
    la = la_ref[0]
    lb = lb_ref[0]

    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)  # bit m-1 (W = 1: always word 0)

    pv = jnp.full(la.shape, _ALL_ONES, u32)
    mv = jnp.zeros(la.shape, u32)
    score = la.astype(i32)

    a_rows = [a_ref[0, i] for i in range(L)]
    for j in range(L):  # static unroll: L is the bucket width
        b_j = b_ref[0, j]
        # Eq_j bit i = (a_i == b_j); only pattern positions i < L exist
        # (len_a <= L), so Eq bits at i >= L are identically 0 — comparing
        # L rows instead of the full 32-bit word cuts the Eq build (the
        # kernel's dominant compute) by 32/L. PAD_A never equals any text
        # char, so bits at len_a <= i < L are 0 with no masking. Word bits
        # above L-1 evolve as never-match columns; Myers' add propagates
        # carries upward only, so they cannot influence the tracked score
        # bit la-1 < L. i32 accumulate (Mosaic has no u32 reduce), bitcast
        # after — bit patterns are identical.
        eq_i = jnp.zeros(la.shape, i32)
        for i in range(L):
            w = np.int32(np.uint32(1) << np.uint32(i))
            eq_i = eq_i | jnp.where(a_rows[i] == b_j, w, np.int32(0))
        eq = lax.bitcast_convert_type(eq_i, u32)
        active = j < lb

        # one Myers step (identical recurrence to levenshtein_myers.body)
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

    out_ref[0] = score


def _kernel_multiword(a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """Multi-word (W = ceil(L/32) <= _MAX_WORDS) variant of _kernel: same
    refs/contract; identical recurrence to levenshtein_myers.body with the
    inter-word addition carry chain and Ph/Mh shift-outs flowing low word ->
    high. The tracked score bit la-1 is selected per lane by word (hword)."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    m1 = jnp.maximum(la - 1, 0)
    hword = m1 // _WORD  # lane-varying word index holding bit m-1
    hbit = (m1 % _WORD).astype(u32)

    pv = [jnp.full(shape, _ALL_ONES, u32) for _ in range(W)]
    mv = [jnp.zeros(shape, u32) for _ in range(W)]
    score = la.astype(i32)

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

        delta = ph_bit.astype(i32) - mh_bit.astype(i32)
        score = score + jnp.where(active, delta, 0)
        pv = [jnp.where(active, n, o) for n, o in zip(new_pv, pv)]
        mv = [jnp.where(active, n, o) for n, o in zip(new_mv, mv)]

    out_ref[0] = score


def _kernel_wide(nmax_ref, a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """Wide-bucket variant (W = ceil(L/32) <= _MAX_WORDS_WIDE): identical
    Myers recurrence to _kernel_multiword, but the scan over text positions
    is a lax.fori_loop instead of a full unroll — at L = 511 an unrolled
    body would be ~10^6 straight-line ops (the round-2 compile-SIGKILL
    regime), while this body is O(3L + 25W) ops compiled once.

    nmax_ref (scalar prefetch, [G] i32): per-block dynamic trip count
    max(len_b) — blocks are length-sorted by the pipeline, so short blocks
    inside a wide bucket stop early instead of paying the padded width.
    """
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
    score0 = la.astype(i32)

    def body(j, state):
        pv, mv, score = state
        b_j = b_ref[0, j]
        eq = []
        for w in range(W):  # per-word Eq from only the real pattern rows
            eq_i = jnp.zeros(shape, i32)
            for i in range(w * _WORD, min((w + 1) * _WORD, L)):
                wt = np.int32(np.uint32(1) << np.uint32(i % _WORD))
                eq_i = eq_i | jnp.where(a_ref[0, i] == b_j, wt, np.int32(0))
            eq.append(lax.bitcast_convert_type(eq_i, u32))
        active = j < lb

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

        delta = ph_bit.astype(i32) - mh_bit.astype(i32)
        score = score + jnp.where(active, delta, 0)
        pv = jnp.where(active[None], jnp.stack(new_pv), pv)
        mv = jnp.where(active[None], jnp.stack(new_mv), mv)
        return pv, mv, score

    n = nmax_ref[pl.program_id(0)]
    _, _, score = lax.fori_loop(0, n, body, (pv0, mv0, score0))
    out_ref[0] = score


def _block_rows_for(B: int, block_rows: int) -> int:
    br = min(block_rows, B)
    while B % br:
        br //= 2
    return br


def _wide_block_rows(L: int, block_rows: int) -> int:
    """Rows per grid block for the wide kernel: two [L, BR] i32 input tiles,
    double-buffered, must fit VMEM (~16 MB/core) with headroom for the
    [W, 8, BR/8] carried state — 16*L*BR <= ~12 MB, floor 1024 rows so the
    lane axis stays full (BR/8 >= 128)."""
    br = 1024
    while br * 2 <= block_rows and 16 * L * (br * 2) <= 12_000_000:
        br *= 2
    return br


def levenshtein_distance_myers_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
) -> Array:
    """Unit-cost edit distance per row pair; Pallas unrolled Myers scan
    (W=1 fast path at L <= 32, inter-word carry chain at L <= 64).

    a, b: [B, L] padded codepoint tiles (PAD_A / PAD_B past each length),
    any integer dtype; L must satisfy supports_width. len_a, len_b: [B]
    int32. Returns [B] int32 distances (valid where both lengths >= 1, as
    the XLA kernel). interpret=None auto-selects the Pallas interpreter on
    non-TPU backends. Widths above 64 route to the fori_loop wide kernel
    with a VMEM-sized block and a per-block dynamic trip count.
    """
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

    BR = _block_rows_for(B, _wide_block_rows(L, block_rows) if wide else block_rows)
    BR8 = BR // _SUB
    G = B // BR

    aT = a.T.astype(i32)  # [L, B] batch-in-lanes, i32 (Mosaic: no int8 blocks)
    bT = b.T.astype(i32)
    a4 = aT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = bT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)

    if wide:
        # per-block dynamic trip count (scalar prefetch): blocks are
        # length-sorted upstream, so short blocks in a wide bucket pay only
        # their own max(len_b) scan steps, not the padded width
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
