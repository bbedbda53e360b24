"""A/B: Pallas (Mosaic) W=1 jaro greedy scan vs the XLA packed-flag kernel.

Applies the recipe that won for levenshtein (tools/ab_myers_pallas.py —
in-kernel Eq build from i32 char tiles + fully-unrolled static scan with all
loop-carried state VMEM-resident) to the jaro match scan. The loop-free
[L, L, B] transposition reduce stays in XLA in both arms (it has no
sequential dependence), so this isolates the scan.

Measured on v5e (2026-08-18), bit-exact at every point:

    w  7 pallas-scan  973.3 M pairs/s   xla-bitmask 962.1 M   (+1%)
    w 15 pallas-scan  613.4 M pairs/s   xla-bitmask 589.3 M   (+4%)
    w 31 pallas-scan  294.5 M pairs/s   xla-bitmask 267.4 M   (+10%)

Conclusion: NOT productionized. Unlike levenshtein (+37% at w7), the jaro
scan is a small share of the measure's device time — the fully-parallel
EqB build + [L, L, B] transposition reduce dominate, and those are already
XLA-fused. The marginal win doesn't justify a production dependency on the
flaky terminal-side Mosaic service for this measure.

Usage: timeout 1800 python tools/ab_jaro_pallas.py [widths...]
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
from strsim_tpu.ops.jaro_bitmask import (
    jaro_match_stats_bitmask,
    _transposition_from_masks,
)
from strsim_tpu.utils.encode import PAD_A, PAD_B
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
SUB = 8
_WORD = 32
_ALL_ONES = np.uint32(0xFFFFFFFF)


def _satmask(k):
    """Per-lane uint32 mask of the k lowest bits, saturating (k: i32)."""
    kc = jnp.clip(k, 0, _WORD - 1).astype(jnp.uint32)
    base = (np.uint32(1) << kc) - np.uint32(1)
    return jnp.where(
        k >= _WORD, _ALL_ONES, jnp.where(k <= 0, np.uint32(0), base)
    )


def _scan_kernel(a_ref, b_ref, la_ref, lb_ref, fl_ref, ma_ref, m_ref, *, L: int):
    """a_ref/b_ref: [1, 32, 8, BR8] i32 chars (padded to 32 rows);
    la/lb: [1, 8, BR8] i32; outputs flagged/matched (u32 bitcast i32), m."""
    u32, i32 = jnp.uint32, jnp.int32
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    bound = jnp.maximum(la, lb) // 2 - 1  # strsim.rs:200
    b_rows = [b_ref[0, j] for j in range(_WORD)]

    flagged = jnp.zeros(shape, u32)
    matched = jnp.zeros(shape, u32)
    m = jnp.zeros(shape, i32)

    for i in range(L):  # static unroll over a-positions
        a_i = a_ref[0, i]
        eqb_i = jnp.zeros(shape, i32)
        for j in range(_WORD):
            w = np.int32(np.uint32(1) << np.uint32(j))
            eqb_i = eqb_i | jnp.where(b_rows[j] == a_i, w, np.int32(0))
        eqb = lax.bitcast_convert_type(eqb_i, u32)

        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        win = _satmask(hi + 1) & ~_satmask(lo)
        cand = eqb & ~flagged & win & jnp.where(active, _ALL_ONES, np.uint32(0))
        lsb = cand & (~cand + np.uint32(1))
        found = cand != 0
        flagged = flagged | lsb
        matched = matched | jnp.where(
            found, np.uint32(np.uint32(1) << np.uint32(i % _WORD)), np.uint32(0)
        )
        m = m + found.astype(i32)

    fl_ref[0] = lax.bitcast_convert_type(flagged, i32)
    ma_ref[0] = lax.bitcast_convert_type(matched, i32)
    m_ref[0] = m


def jaro_match_stats_pallas_scan(a, b, len_a, len_b, *, block_rows=8192):
    """(m, t) with the greedy scan in Pallas; W=1 (L <= 32) only."""
    B, L = a.shape
    assert L <= _WORD
    BR = min(block_rows, B)
    assert B % BR == 0 and BR % SUB == 0
    BR8 = BR // SUB
    G = B // BR
    u32, i32 = jnp.uint32, jnp.int32

    aT, bT = a.T, b.T

    def pad32(t, pad):
        if L >= _WORD:
            return t
        return jnp.concatenate(
            [t, jnp.full((_WORD - L, B), pad, dtype=t.dtype)], axis=0
        )

    a4 = pad32(aT, PAD_A).astype(i32).reshape(_WORD, G, SUB, BR8).transpose(1, 0, 2, 3)
    b4 = pad32(bT, PAD_B).astype(i32).reshape(_WORD, G, SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, SUB, BR8)

    tile = pl.BlockSpec(
        (1, _WORD, SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    outs = [jax.ShapeDtypeStruct((G, SUB, BR8), i32)] * 3

    fl, ma, m = pl.pallas_call(
        functools.partial(_scan_kernel, L=L),
        out_shape=outs,
        grid=(G,),
        in_specs=[tile, tile, row, row],
        out_specs=[row, row, row],
    )(a4, b4, la3, lb3)

    flagged = lax.bitcast_convert_type(fl.reshape(1, B), u32)
    matched = lax.bitcast_convert_type(ma.reshape(1, B), u32)
    m = m.reshape(B)
    t = _transposition_from_masks(aT, bT, matched, flagged)

    one_one = (len_a == 1) & (len_b == 1)
    eq11 = aT[0, :] == bT[0, :]
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
    widths = [int(w) for w in sys.argv[1:]] or [15]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(jaro_match_stats_bitmask, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        for br in (8192, 32768):
            try:
                pk = wrap(jaro_match_stats_pallas_scan, width, block_rows=br)
                r1 = np.asarray(jax.jit(pk)(codes3[0], lens3[0]))
                tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
                t = marginal_block_time(pk, codes3, lens3)
                print(
                    f"w{width:3d} pallas-scan/br{br:6d}: {t*1000:8.4f} ms/block "
                    f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " ")[:160]
                print(
                    f"w{width:3d} pallas-scan/br{br}: FAIL {type(e).__name__}: {msg}",
                    flush=True,
                )
        t = marginal_block_time(base, codes3, lens3)
        print(
            f"w{width:3d} xla-bitmask : {t*1000:8.4f} ms/block "
            f"= {BLOCK/t/1e6:8.1f} M pairs/s",
            flush=True,
        )
    print("DONE")


if __name__ == "__main__":
    main()
