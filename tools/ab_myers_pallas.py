"""A/B: Pallas (Mosaic) Myers levenshtein vs the XLA sublane-packed kernel.

Round-1/2 found the in-tree wavefront Pallas kernel SIGABRTs the terminal-
side Mosaic compiler; a trivial Pallas kernel now compiles in this
environment, so this probes whether a SIMPLER kernel body — the W=1 Myers
scan: pure elementwise u32 ops, one dynamic slice per step, no concats —
gets through Mosaic and whether VMEM-resident loop state beats XLA's
while-loop carry.

Layout: batch folded to (8, BR/8) minor dims (the proven sublane fix);
Eq precomputed IN-KERNEL from the raw char tiles (less HBM traffic than
feeding a precomputed [L, B] u32 Eq).

Usage: timeout 1800 python tools/ab_myers_pallas.py [widths...]
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
from strsim_tpu.ops.levenshtein_myers import levenshtein_distance_myers
from strsim_tpu.utils.encode import PAD_A
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
SUB = 8
_WORD = 32


def _kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    # a_ref: [32, 8, BR8] int8 (pattern, padded to 32); b_ref: [L, 8, BR8]
    # la/lb/out: [8, 8, BR8]-compatible? no: [8, BR8] i32 each... Mosaic block
    # rank-2 for scalars-per-lane.
    u32, i32 = jnp.uint32, jnp.int32
    a = a_ref[0]  # [32, 8, BR8]
    la = la_ref[0]  # [8, BR8]
    lb = lb_ref[0]

    shape = la.shape
    bits = jax.lax.broadcasted_iota(u32, a.shape, 0)  # word-bit index per row
    weight = (np.uint32(1) << bits).astype(u32)

    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)

    pv = jnp.full(shape, np.uint32(0xFFFFFFFF), u32)
    mv = jnp.zeros(shape, u32)
    score = la.astype(i32)

    def body(j, state):
        pv, mv, score = state
        b_j = b_ref[0, pl.ds(j, 1)]  # [1, 8, BR8] int8
        eq = jnp.sum(
            jnp.where(a == b_j, weight, np.uint32(0)), axis=0, dtype=u32
        )  # [8, BR8]
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
        return (
            jnp.where(active, pv_n, pv),
            jnp.where(active, mv_n, mv),
            score,
        )

    _, _, score = lax.fori_loop(0, L, body, (pv, mv, score))
    out_ref[0] = score


def levenshtein_myers_pallas(a, b, len_a, len_b, *, block_rows=8192):
    B, L = a.shape
    assert L <= _WORD, "W=1 specialization"
    BR = min(block_rows, B)
    assert B % BR == 0 and BR % SUB == 0
    BR8 = BR // SUB
    G = B // BR

    aT = a.T  # [L, B]
    bT = b.T
    aTp = jnp.concatenate(
        [aT, jnp.full((_WORD - L, B), PAD_A, dtype=aT.dtype)], axis=0
    ) if L < _WORD else aT
    a3 = aTp.reshape(_WORD, G, SUB, BR8).transpose(1, 0, 2, 3)  # [G,32,8,BR8]
    b3 = bT.reshape(L, G, SUB, BR8).transpose(1, 0, 2, 3)  # [G,L,8,BR8]
    la3 = len_a.astype(jnp.int32).reshape(G, SUB, BR8)
    lb3 = len_b.astype(jnp.int32).reshape(G, SUB, BR8)

    out = pl.pallas_call(
        functools.partial(_kernel, L=L),
        out_shape=jax.ShapeDtypeStruct((G, SUB, BR8), jnp.int32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, _WORD, SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
    )(a3, b3, la3, lb3)
    return out.reshape(B)


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = -1
    packed[:, width:][pos >= lens[:, 1:2]] = -2
    return packed.astype(np.int8), lens


def wrap(fn, width, **kw):
    def kernel(codes, lens):
        out = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1], **kw)
        return out[None, :]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [15]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(levenshtein_distance_myers, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        for br in (2048, 8192, 32768):
            try:
                pk = wrap(levenshtein_myers_pallas, width, block_rows=br)
                r1 = np.asarray(jax.jit(pk)(codes3[0], lens3[0]))
                tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
                t = marginal_block_time(pk, codes3, lens3)
                print(
                    f"w{width:3d} pallas/br{br:6d}: {t*1000:8.4f} ms/block "
                    f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                print(f"w{width:3d} pallas/br{br}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        t = marginal_block_time(base, codes3, lens3)
        print(
            f"w{width:3d} xla-myers8   : {t*1000:8.4f} ms/block "
            f"= {BLOCK/t/1e6:8.1f} M pairs/s",
            flush=True,
        )
    print("DONE")


if __name__ == "__main__":
    main()
