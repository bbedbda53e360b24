"""A/B: Pallas (Mosaic) multiset-intersection kernel vs the XLA chunked scan.

Applies the levenshtein-winning recipe (tools/ab_myers_pallas.py — i32 char
tiles in VMEM, fully-unrolled static loops, accumulators never leaving
vector registers) to the occurrence-rank multiset kernel
(ops/multiset_loop.py): per pattern position i,

    cnt_b(i) = #{j : b_j == a_i}          (L compares)
    occ(i)   = #{k < i : a_k == a_i}      (i compares)
    inter   += 1[occ(i) < cnt_b(i)] for i < len_a

Total lane work is the same ~1.5 L^2 compares as the XLA chunked kernel;
what changes is that no [G, L, B] compare tensor is ever materialized and
there is no loop machinery at all.

Usage: timeout 1800 python tools/ab_multiset_pallas.py [widths...]
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.multiset_loop import multiset_intersection_chunked
from strsim_tpu.utils.encode import PAD_A, PAD_B
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
SUB = 8


def _kernel(a_ref, b_ref, la_ref, out_ref, *, L: int):
    """a_ref/b_ref: [1, L, 8, BR8] i32 chars; la: [1, 8, BR8] i32;
    out: [1, 8, BR8] i32 intersection sizes. Pads differ per side, so
    cross-side compares past either length are automatically false."""
    i32 = jnp.int32
    la = la_ref[0]
    shape = la.shape
    one = np.int32(1)
    zero = np.int32(0)

    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    inter = jnp.zeros(shape, i32)
    for i in range(L):
        a_i = a_rows[i]
        cnt_b = jnp.zeros(shape, i32)
        for j in range(L):
            cnt_b = cnt_b + jnp.where(b_rows[j] == a_i, one, zero)
        occ = jnp.zeros(shape, i32)
        for k in range(i):
            occ = occ + jnp.where(a_rows[k] == a_i, one, zero)
        hit = (occ < cnt_b) & (i < la)
        inter = inter + jnp.where(hit, one, zero)
    out_ref[0] = inter


def multiset_intersection_pallas(a, b, len_a, len_b, *, block_rows=8192):
    B, L = a.shape
    del len_b  # pads encode b's validity
    BR = min(block_rows, B)
    assert B % BR == 0 and BR % SUB == 0
    BR8 = BR // SUB
    G = B // BR
    i32 = jnp.int32

    a4 = a.T.astype(i32).reshape(L, G, SUB, BR8).transpose(1, 0, 2, 3)
    b4 = b.T.astype(i32).reshape(L, G, SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, SUB, BR8)

    tile = pl.BlockSpec(
        (1, L, SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, L=L),
        out_shape=jax.ShapeDtypeStruct((G, SUB, BR8), i32),
        grid=(G,),
        in_specs=[tile, tile, row],
        out_specs=row,
    )(a4, b4, la3)
    return out.reshape(B)


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
        base = wrap(multiset_intersection_chunked, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        for br in (8192, 32768):
            try:
                pk = wrap(multiset_intersection_pallas, width, block_rows=br)
                r1 = np.asarray(jax.jit(pk)(codes3[0], lens3[0]))
                tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
                t = marginal_block_time(pk, codes3, lens3)
                print(
                    f"w{width:3d} pallas/br{br:6d}: {t*1000:8.4f} ms/block "
                    f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " ")[:160]
                print(
                    f"w{width:3d} pallas/br{br}: FAIL {type(e).__name__}: {msg}",
                    flush=True,
                )
        t = marginal_block_time(base, codes3, lens3)
        print(
            f"w{width:3d} xla-chunked : {t*1000:8.4f} ms/block "
            f"= {BLOCK/t/1e6:8.1f} M pairs/s",
            flush=True,
        )
    print("DONE")


if __name__ == "__main__":
    main()
