"""A/B: fori_loop WIDE fused Pallas jaro (widths 95..511) vs the XLA bitmask
kernel — the wide-bucket follow-up to tools/ab_jaro_fused.py (which covers
the unrolled <= 64 widths). Same fused design (in-kernel EqB, packed flag
words, byte-compacted O(L) transposition), but the scan over a-positions and
the b-side compaction pass are lax.fori_loops with stacked carried state, so
the compiled body is O(3L + 20W + L/2) ops instead of an L-step unroll.

If this wins, it becomes jaro_pallas_scan's wide path (int8 tiles only, as
the unrolled kernel).

Usage: timeout 3000 python tools/ab_jaro_wide.py [widths...]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
from strsim_tpu.ops.jaro_pallas_scan import _satmask
from strsim_tpu.utils.encode import PAD_A, PAD_B
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 65536
_SUB = 8
_WORD = 32
_ALL_ONES = np.uint32(0xFFFFFFFF)


def _kernel_wide(a_ref, b_ref, la_ref, lb_ref, m_ref, t_ref, *, L: int):
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    W4 = -(-L // 4)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    bound = jnp.maximum(la, lb) // 2 - 1

    flag0 = jnp.zeros((W,) + shape, u32)
    seqa0 = jnp.zeros((W4,) + shape, i32)
    m0 = jnp.zeros(shape, i32)

    def scan_body(i, state):
        flag, seq_a, m = state
        a_i = a_ref[0, i]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        found = jnp.zeros(shape, bool)
        new_flag = []
        for w in range(W):
            eq_i = jnp.zeros(shape, i32)
            for j in range(w * _WORD, min((w + 1) * _WORD, L)):
                bit = np.int32(np.uint32(1) << np.uint32(j % _WORD))
                eq_i = eq_i | jnp.where(b_ref[0, j] == a_i, bit, np.int32(0))
            eqw = lax.bitcast_convert_type(eq_i, u32)
            win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
            cand = eqw & ~flag[w] & win
            cand = jnp.where(active & ~found, cand, np.uint32(0))
            lsb = cand & (~cand + np.uint32(1))
            new_flag.append(flag[w] | lsb)
            found = found | (cand != 0)
        flag = jnp.stack(new_flag)
        val = jnp.where(found, a_i, 0) << ((m & 3) << 3)
        mw = m >> 2
        ww4 = lax.broadcasted_iota(i32, (W4,) + shape, 0)
        seq_a = seq_a | jnp.where(ww4 == mw[None], val[None], 0)
        m = m + found.astype(i32)
        return flag, seq_a, m

    i_max = jnp.minimum(jnp.max(jnp.minimum(la, lb + bound)), L)
    flag, seq_a, m = lax.fori_loop(0, i_max, scan_body, (flag0, seqa0, m0))

    def compact_body(j, state):
        seq_b, rb = state
        jw = j // _WORD
        jb = (j % _WORD).astype(u32)
        fw = jnp.zeros(shape, u32)
        for w in range(W):
            fw = jnp.where(jw == w, flag[w], fw)
        fbit = ((fw >> jb) & 1) != 0
        b_j = b_ref[0, j]
        val = jnp.where(fbit, b_j, 0) << ((rb & 3) << 3)
        rw = rb >> 2
        ww4 = lax.broadcasted_iota(jnp.int32, (W4,) + shape, 0)
        seq_b = seq_b | jnp.where(ww4 == rw[None], val[None], 0)
        rb = rb + fbit.astype(jnp.int32)
        return seq_b, rb

    j_max = jnp.minimum(jnp.max(lb), L)
    seq_b, _ = lax.fori_loop(
        0, j_max, compact_body,
        (jnp.zeros((W4,) + shape, i32), jnp.zeros(shape, i32)),
    )

    t = jnp.zeros(shape, i32)
    for w4 in range(W4):
        x = seq_a[w4] ^ seq_b[w4]
        for byte in range(4):
            t = t + (((x >> (8 * byte)) & 255) != 0).astype(i32)
    m_ref[0] = m
    t_ref[0] = t


def jaro_wide_pallas(a, b, len_a, len_b, *, block_rows=2048, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L = a.shape
    i32 = jnp.int32
    BR = min(block_rows, B)
    while B % BR:
        BR //= 2
    BR8 = BR // _SUB
    G = B // BR
    aT = a.T.astype(i32)
    bT = b.T.astype(i32)
    a4 = aT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = bT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)
    tile = pl.BlockSpec((1, L, _SUB, BR8), lambda g: (g, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, _SUB, BR8), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    m3, t3 = pl.pallas_call(
        functools.partial(_kernel_wide, L=L),
        out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
                   jax.ShapeDtypeStruct((G, _SUB, BR8), i32)),
        grid=(G,),
        in_specs=[tile, tile, row, row],
        out_specs=(row, row),
        interpret=interpret,
    )(a4, b4, la3, lb3)
    m = m3.reshape(B)
    t = t3.reshape(B)
    one_one = (len_a == 1) & (len_b == 1)
    eq11 = aT[0] == bT[0]
    m = jnp.where(one_one, eq11.astype(i32), m)
    t = jnp.where(one_one, 0, t)
    return m, t


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = PAD_A
    packed[:, width:][pos >= lens[:, 1:2]] = PAD_B
    return packed.astype(np.int8), lens


def wrap(fn, width, **kw):
    def kernel(codes, lens):
        m, t = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1], **kw)
        return jnp.stack([m, t])[None]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [95, 127, 255, 511]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(jaro_match_stats_bitmask, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        for br in (1024, 2048):
            try:
                pk = wrap(jaro_wide_pallas, width, block_rows=br)
                r1 = np.asarray(jax.jit(pk)(codes3[0], lens3[0]))
                tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
                t = marginal_block_time(pk, codes3, lens3)
                print(f"w{width:3d} pallas-wide/br{br:5d}: {t*1000:8.3f} ms/block "
                      f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " ")[:150]
                print(f"w{width:3d} pallas-wide/br{br}: FAIL {type(e).__name__}: {msg}",
                      flush=True)
        t = marginal_block_time(base, codes3, lens3)
        print(f"w{width:3d} xla-bitmask : {t*1000:8.3f} ms/block "
              f"= {BLOCK/t/1e6:8.1f} M pairs/s", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
