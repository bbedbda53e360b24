"""A/B: SWAR byte-packed Eq build for the Pallas Myers levenshtein scan.

Hypothesis (docs/ROOFLINE.md "known headroom" #3): the production kernel's
in-kernel Eq build costs ~3 VPU ops per (pattern position, text position) —
compare + select + or — and dominates the kernel (3·L² vs 18·L Myers work).
For int8/ASCII tiles, four pattern chars pack into one i32 word; one
xor + zero-byte-detect + bit-gather-multiply tests 4 positions in ~9 ops
(~2.25/position), an analytic ~1.25-1.3× on the whole kernel at w15/w31.

The multiset SWAR attempt measured ZERO gain (docs/ROOFLINE.md dead-end
table) — Mosaic's lowering may eat this one too. This probe answers it for
the levenshtein Eq build specifically.

Bit-exactness: byte semantics are exact for int8 ASCII tiles — a-pads mask
to 0xFF, b-pads to 0xFE, real chars < 0x80, fill bytes 0xFF. Zero-byte
detection uses the EXACT formula ~(((x & 0x7F7F7F7F) + 0x7F7F7F7F) | x) &
0x80808080 (the cheaper (x-REPL) & ~x & H8 variant false-positives on 0x01
bytes under borrow — caught by the numpy cross-check while building this);
the 0x204081 gather-multiply has disjoint contributing sums into bits 28-31.

Usage: timeout 1800 python tools/ab_myers_swar.py [widths...]
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
from strsim_tpu.ops.levenshtein_pallas_scan import (
    _ALL_ONES,
    _SUB,
    _WORD,
    levenshtein_distance_myers_pallas,
)
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
BR = 8192

_REPL = np.int32(0x01010101)
_L7F = np.int32(0x7F7F7F7F)
_H8 = np.int32(np.uint32(0x80808080).view(np.int32))
_GATHER = np.uint32(0x00204081)


def _kernel_swar(a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """W=1 variant of levenshtein_pallas_scan._kernel with the Eq build done
    4 pattern positions per word (SWAR over bytes). int8/ASCII contract."""
    u32, i32 = jnp.uint32, jnp.int32
    la = la_ref[0]
    lb = lb_ref[0]

    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)

    pv = jnp.full(la.shape, _ALL_ONES, u32)
    mv = jnp.zeros(la.shape, u32)
    score = la.astype(i32)

    # pack 4 pattern rows per word, fill bytes 0xFF (match nothing on b)
    W4 = -(-L // 4)
    ap = []
    for k in range(W4):
        word = jnp.zeros(la.shape, i32)
        for byte in range(4):
            i = 4 * k + byte
            v = (a_ref[0, i] & 0xFF) if i < L else jnp.full(la.shape, 0xFF, i32)
            word = word | (v << (8 * byte))
        ap.append(word)

    for j in range(L):
        bb = (b_ref[0, j] & 0xFF) * _REPL
        eq_u = jnp.zeros(la.shape, u32)
        for k in range(W4):
            x = ap[k] ^ bb
            # exact zero-byte test: high bit of each equal byte
            t = ~(((x & _L7F) + _L7F) | x) & _H8
            nib = (lax.bitcast_convert_type(t, u32) * _GATHER) >> 28
            eq_u = eq_u | (nib << (4 * k))
        eq = eq_u
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

        delta = ph_bit.astype(jnp.int32) - mh_bit.astype(jnp.int32)
        score = score + jnp.where(active, delta, 0)
        pv = jnp.where(active, pv_n, pv)
        mv = jnp.where(active, mv_n, mv)

    out_ref[0] = score


def lev_swar(a, b, len_a, len_b, interpret=None):
    B, L = a.shape
    assert L <= _WORD and B % BR == 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32
    BR8 = BR // _SUB
    G = B // BR
    a4 = a.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = b.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, _SUB, BR8)

    def tile_spec(rows):
        return pl.BlockSpec(
            (1, rows, _SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )

    row_spec = pl.BlockSpec(
        (1, _SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel_swar, L=L),
        out_shape=jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
        grid=(G,),
        in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
        out_specs=row_spec,
        interpret=interpret,
    )(a4, b4, la3, lb3)
    return out.reshape(B)


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = -1
    packed[:, width:][pos >= lens[:, 1:2]] = -2
    return packed.astype(np.int8), lens


def wrap(fn, width):
    def kernel(codes, lens):
        out = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1])
        return out[None, :]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(levenshtein_distance_myers_pallas, width)
        swar = wrap(lev_swar, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        r1 = np.asarray(jax.jit(swar)(codes3[0], lens3[0]))
        tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
        for name, k in (("pallas", base), ("swar", swar)):
            t = marginal_block_time(k, codes3, lens3)
            print(
                f"w{width:3d} {name:8s}: {t*1000:8.4f} ms/block "
                f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                flush=True,
            )
    print("DONE")


if __name__ == "__main__":
    main()
