"""Shared-equality fused levenshtein+jaro Pallas kernel (round 4).

When a stat request needs BOTH lev_d and jaro_m/jaro_t (the fused-measure
serving path), the two production kernels each rebuild the same L x L
equality structure from opposite axes: levenshtein's per-text-position Eq
word holds bits over pattern rows i (ops/levenshtein_pallas_scan.py:88-103),
jaro's per-pattern-position EqB word holds bits over text rows j
(ops/jaro_pallas_scan.py:134-143) — transposes of one boolean matrix, each
built at ~3L² lane ops, and the round-4 ablation measured that build at
~70% of jaro's time (JARO_SOL_PROBE.json). This kernel runs the jaro scan
once (storing its EqB words), bit-transposes the packed matrix in registers
(Hacker's Delight delta-swap ladder: 4 rounds at 16x16 / 5 at 32x32 — ~190
/ ~480 vector ops vs ~675 / ~2883 for the rebuild), then runs the Myers
scan consuming the transposed words directly.

Measured on v5e (262144-row blocks, tools/ab_fused_lj.py, FUSED_LJ_AB.json):
fused = 0.212 ms vs lev 0.145 + jaro 0.214 = 0.359 ms at w15 (**1.69x**),
0.563 vs 1.012 ms at w31 (**1.80x**), bit-exact against both production
kernels. Single-flag-word widths only (L <= 31, the buckets carrying ~95%
of the len<=64 headline workload); W >= 2 needs a blocked 64x64 transpose —
future work. int8/ASCII tiles only (pack=4 byte compaction, same contract
as the jaro kernel's pack=4 mode).

Semantics: identical integer contracts to the two kernels it replaces —
Myers distance (exact-order host finalization stays in ops/finalize.py) and
the reference's greedy windowed match + ordered transposition count
(src/expressions/strsim.rs:127-161, :181-244). The len-1/len-1 jaro direct
compare is patched outside the kernel exactly as
jaro_match_stats_pallas_scan does.
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
    _pack_params,
    _satmask,
)
from strsim_tpu.utils.encode import PAD_A, PAD_B

Array = jax.Array

_ALL_ONES = np.uint32(0xFFFFFFFF)
DEFAULT_BLOCK_ROWS = 8192
_MAX_WIDTH = 31  # single flag word; 32x32 transpose tile


def supports_width(L: int) -> bool:
    """True iff the fused kernel covers padded width L (single-word widths,
    buckets 7/15/23/31)."""
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


def _kernel(a_ref, b_ref, la_ref, lb_ref, lev_ref, m_ref, t_ref, *, L, pack):
    """Jaro greedy scan (storing EqB words) + bit transpose + Myers scan.
    a_ref/b_ref: [1, L, 8, BR8] i32; la/lb/lev/m/t: [1, 8, BR8] i32."""
    u32, i32 = jnp.uint32, jnp.int32
    WP = -(-L // pack)
    LOG_PACK, LOG_BITS = _pack_params(pack)
    NT = 16 if L <= 16 else 32
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    bound = jnp.maximum(la, lb) // 2 - 1

    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    flag = jnp.zeros(shape, u32)
    seq_a = [jnp.zeros(shape, i32) for _ in range(WP)]
    m = jnp.zeros(shape, i32)
    eqj = []  # EqB word per a-position i (bits over j)

    for i in range(L):  # static unroll — the jaro greedy scan
        a_i = a_rows[i]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        eq_i = jnp.zeros(shape, i32)
        for j in range(L):
            bit = np.int32(np.uint32(1) << np.uint32(j))
            eq_i = eq_i | jnp.where(b_rows[j] == a_i, bit, np.int32(0))
        eqw = lax.bitcast_convert_type(eq_i, u32)
        eqj.append(eqw)
        win = _satmask(hi + 1) & ~_satmask(lo)
        cand = eqw & ~flag & win
        cand = jnp.where(active, cand, np.uint32(0))
        lsb = cand & (~cand + np.uint32(1))
        flag = flag | lsb
        found = cand != 0
        v = jnp.where(found, a_i, 0)
        val = v << ((m & (pack - 1)) << LOG_BITS)
        mw = m >> LOG_PACK
        for wp in range(WP):
            seq_a[wp] = seq_a[wp] | jnp.where(mw == wp, val, 0)
        m = m + found.astype(i32)

    # b-side rank compaction + transposition count (as the jaro kernel)
    seq_b = [jnp.zeros(shape, i32) for _ in range(WP)]
    rb = jnp.zeros(shape, i32)
    for j in range(L):
        fb = (flag >> np.uint32(j)) & np.uint32(1)
        fbit = fb != 0
        v = jnp.where(fbit, b_rows[j], 0)
        val = v << ((rb & (pack - 1)) << LOG_BITS)
        rw = rb >> LOG_PACK
        for wp in range(WP):
            seq_b[wp] = seq_b[wp] | jnp.where(rw == wp, val, 0)
        rb = rb + fbit.astype(i32)
    bits = 32 // pack
    mask = (1 << bits) - 1
    t = jnp.zeros(shape, i32)
    for wp in range(WP):
        x = seq_a[wp] ^ seq_b[wp]
        for s in range(pack):
            t = t + (((x >> (bits * s)) & mask) != 0).astype(i32)

    # transpose: eqj[i] bit j -> eql[j] bit i; the Myers scan's Eq for free
    eqj_p = eqj + [jnp.zeros(shape, u32) for _ in range(NT - L)]
    eql = _transpose_bits(eqj_p, NT)

    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)
    pv = jnp.full(shape, _ALL_ONES, u32)
    mv = jnp.zeros(shape, u32)
    score = la.astype(i32)
    for j in range(L):  # Myers step, identical to levenshtein_pallas_scan
        eq = eql[j]
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

    lev_ref[0] = score
    m_ref[0] = m
    t_ref[0] = t


def lev_jaro_stats_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: Optional[bool] = None,
) -> Tuple[Array, Array, Array]:
    """(lev_d, m, t) in one fused pass — drop-in for running
    levenshtein_distance_pallas_scan AND jaro_match_stats_pallas_scan on the
    same [B, L] int8 tiles. L <= 31 only; len-1/len-1 jaro patch applied
    here exactly as jaro_match_stats_pallas_scan does."""
    B, L = a.shape
    if not supports_width(L):
        raise ValueError(f"fused lev+jaro requires width <= {_MAX_WIDTH}, got {L}")
    if a.dtype.itemsize != 1 or b.dtype.itemsize != 1:
        raise ValueError(
            f"fused lev+jaro serves int8/ASCII tiles (got {a.dtype}/{b.dtype})"
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

    BR = _block_rows_for(B, block_rows)
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

    lev3, m3, t3 = pl.pallas_call(
        functools.partial(_kernel, L=L, pack=4),
        out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),) * 3,
        grid=(G,),
        in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
        out_specs=(row_spec,) * 3,
        interpret=interpret,
    )(a4, b4, la3, lb3)
    lev = lev3.reshape(B)
    m = m3.reshape(B)
    t = t3.reshape(B)
    if pad_rows:
        lev = lev[: B - pad_rows]
        m = m[: B - pad_rows]
        t = t[: B - pad_rows]
        B = B - pad_rows

    # len-1 vs len-1: direct char compare (strsim.rs:197-199), same patch as
    # jaro_match_stats_pallas_scan
    la_r = len_a[:B].astype(i32)
    lb_r = len_b[:B].astype(i32)
    one_one = (la_r == 1) & (lb_r == 1)
    eq11 = aT[0, :B] == bT[0, :B]
    m = jnp.where(one_one, eq11.astype(i32), m)
    t = jnp.where(one_one, 0, t)
    return lev, m, t
