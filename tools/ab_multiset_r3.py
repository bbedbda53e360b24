"""A/B: round-3 multiset-kernel reformulations vs the production Pallas
kernel (ops/multiset_pallas.py) — VERDICT r2 item 4 (30% of roofline; the
residual is the compare+select+add lowering, ~9.6 effective VPU ops per
compare-position where the model charges ~3).

Variants, all bit-exact candidates:
  prod   — production unrolled kernel (baseline)
  tree   — balanced-tree accumulation of the compare results (tests whether
           the serial accumulator dependency chain is the bottleneck)
  astype — bool.astype(i32) accumulate instead of where(eq, 1, 0)
  swar   — 4 chars per i32 word (byte-packed), exact per-byte zero-test
           (~(((x & 0x7F..) + 0x7F..) | x) & 0x80..), per-byte count
           accumulators, horizontal sum via *0x01010101 >> 24. Processes 4
           compare-positions per ~8 word ops.

Usage: timeout 3000 python tools/ab_multiset_r3.py [widths...]
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
from strsim_tpu.ops.multiset_pallas import multiset_intersection_pallas
from strsim_tpu.utils.encode import PAD_A, PAD_B
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
_SUB = 8


def _kernel_tree(a_ref, b_ref, la_ref, out_ref, *, L: int):
    i32 = jnp.int32
    la = la_ref[0]
    one, zero = np.int32(1), np.int32(0)
    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    def tree_sum(terms):
        if not terms:
            return jnp.zeros(la.shape, i32)
        while len(terms) > 1:
            nxt = [x + y for x, y in zip(terms[::2], terms[1::2])]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    inter = jnp.zeros(la.shape, i32)
    for i in range(L):
        a_i = a_rows[i]
        cnt_b = tree_sum([jnp.where(b_rows[j] == a_i, one, zero) for j in range(L)])
        occ = tree_sum([jnp.where(a_rows[k] == a_i, one, zero) for k in range(i)])
        inter = inter + jnp.where((occ < cnt_b) & (i < la), one, zero)
    out_ref[0] = inter


def _kernel_astype(a_ref, b_ref, la_ref, out_ref, *, L: int):
    i32 = jnp.int32
    la = la_ref[0]
    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]
    inter = jnp.zeros(la.shape, i32)
    for i in range(L):
        a_i = a_rows[i]
        cnt_b = jnp.zeros(la.shape, i32)
        for j in range(L):
            cnt_b = cnt_b + (b_rows[j] == a_i).astype(i32)
        occ = jnp.zeros(la.shape, i32)
        for k in range(i):
            occ = occ + (a_rows[k] == a_i).astype(i32)
        inter = inter + ((occ < cnt_b) & (i < la)).astype(i32)
    out_ref[0] = inter


_M7F = np.uint32(0x7F7F7F7F)
_M80 = np.uint32(0x80808080)
_M01 = np.uint32(0x01010101)


def _kernel_swar(a_ref, b_ref, la_ref, out_ref, *, L: int):
    """Byte-packed: b (and a) chars 4-per-i32-word; equal-byte detection via
    the exact per-byte zero test; per-byte count accumulators summed
    horizontally once per i. Chars must fit a byte (int8/ASCII tiles); pads
    map to 255 (a) / 254 (b) so they never match."""
    i32, u32 = jnp.int32, jnp.uint32
    la = la_ref[0]
    shape = la.shape
    W4 = -(-L // 4)

    def clean(row, padv):
        return jnp.where(row < 0, np.int32(padv), row)

    def pack(ref, padv):
        words = []
        for w in range(W4):
            acc = jnp.zeros(shape, i32)
            for p in range(4 * w, min(4 * w + 4, L)):
                acc = acc | (clean(ref[0, p], padv) << np.int32(8 * (p - 4 * w)))
            # bytes beyond L (short last word) stay 0 -> can only match a
            # zero aa byte, but aa bytes are the (cleaned, >0 or 255) a char
            words.append(lax.bitcast_convert_type(acc, u32))
        return words

    bw = pack(b_ref, 254)
    aw = pack(a_ref, 255)
    a_rows = [a_ref[0, i] for i in range(L)]

    def zbytes(x):  # 0x80 at zero bytes, exact (no cross-byte carries)
        return ~(((x & _M7F) + _M7F) | x) & _M80

    inter = jnp.zeros(shape, i32)
    for i in range(L):
        a_i = clean(a_rows[i], 255)
        aa = lax.bitcast_convert_type(a_i * np.int32(0x01010101), u32)
        acc_b = jnp.zeros(shape, u32)
        for w in range(W4):
            acc_b = acc_b + (zbytes(bw[w] ^ aa) >> 7)
        cnt_b = lax.bitcast_convert_type((acc_b * _M01) >> 24, i32)
        nw = (i + 3) // 4  # words covering k < i
        acc_a = jnp.zeros(shape, u32)
        for w in range(nw):
            z = zbytes(aw[w] ^ aa) >> 7
            if 4 * (w + 1) > i:  # boundary word: only bytes k < i%4
                z = z & np.uint32((1 << (8 * (i % 4))) - 1)
            acc_a = acc_a + z
        occ = lax.bitcast_convert_type((acc_a * _M01) >> 24, i32)
        inter = inter + ((occ < cnt_b) & (i < la)).astype(i32)
    out_ref[0] = inter


def _kernel_blocked(a_ref, b_ref, la_ref, out_ref, *, L: int, GI: int = 4):
    """Register-blocked: GI a-positions processed per b/a row LOAD. The
    unblocked kernel touches every row value L times; Mosaic cannot keep L
    [8, BR8] rows in vector registers, so each touch is a VMEM reload —
    blocking amortizes one load across GI compares."""
    i32 = jnp.int32
    la = la_ref[0]
    shape = la.shape
    inter = jnp.zeros(shape, i32)
    for i0 in range(0, L, GI):
        gis = list(range(i0, min(i0 + GI, L)))
        a_is = [a_ref[0, i] for i in gis]
        cnts = [jnp.zeros(shape, i32) for _ in gis]
        for j in range(L):
            b_j = b_ref[0, j]
            for g, a_i in enumerate(a_is):
                cnts[g] = cnts[g] + (b_j == a_i).astype(i32)
        occs = [jnp.zeros(shape, i32) for _ in gis]
        for k in range(gis[-1]):  # k < i, per lane of the block
            a_k = a_ref[0, k]
            for g, (i, a_i) in enumerate(zip(gis, a_is)):
                if k < i:
                    occs[g] = occs[g] + (a_k == a_i).astype(i32)
        for g, i in enumerate(gis):
            inter = inter + ((occs[g] < cnts[g]) & (i < la)).astype(i32)
    out_ref[0] = inter


def wrap_kernel(kernel, width, block_rows=8192):
    def fn(codes, lens):
        a, b = codes[:, :width], codes[:, width:]
        la = lens[:, 0]
        B, L = a.shape
        BR = min(block_rows, B)
        BR8 = BR // _SUB
        G = B // BR
        i32 = jnp.int32
        a4 = a.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
        b4 = b.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
        la3 = la.astype(i32).reshape(G, _SUB, BR8)
        tile = pl.BlockSpec((1, L, _SUB, BR8), lambda g: (g, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        row = pl.BlockSpec((1, _SUB, BR8), lambda g: (g, 0, 0),
                           memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(kernel, L=L),
            out_shape=jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
            grid=(G,),
            in_specs=[tile, tile, row],
            out_specs=row,
        )(a4, b4, la3)
        return out.reshape(1, B)

    return fn


def wrap_prod(width, block_rows=8192):
    def fn(codes, lens):
        out = multiset_intersection_pallas(
            codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1],
            block_rows=block_rows,
        )
        return out[None]

    return fn


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = PAD_A
    packed[:, width:][pos >= lens[:, 1:2]] = PAD_B
    return packed.astype(np.int8), lens


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [15, 31, 63]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap_prod(width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        import functools as ft

        variants = [
            ("tree", wrap_kernel(_kernel_tree, width)),
            ("astype", wrap_kernel(_kernel_astype, width)),
            ("swar", wrap_kernel(_kernel_swar, width)),
            ("swar/br16k", wrap_kernel(_kernel_swar, width, block_rows=16384)),
            ("blocked4", wrap_kernel(ft.partial(_kernel_blocked, GI=4), width)),
            ("blocked8", wrap_kernel(ft.partial(_kernel_blocked, GI=8), width)),
        ]
        only = os.environ.get("AB_ONLY")
        if only:
            variants = [(n, f) for n, f in variants if only in n]
        t = marginal_block_time(base, codes3, lens3)
        print(f"w{width:3d} prod        : {t*1000:8.4f} ms/block = "
              f"{BLOCK/t/1e6:8.1f} M pairs/s", flush=True)
        for name, fn in variants:
            try:
                r1 = np.asarray(jax.jit(fn)(codes3[0], lens3[0]))
                tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
                t = marginal_block_time(fn, codes3, lens3)
                print(f"w{width:3d} {name:12s}: {t*1000:8.4f} ms/block = "
                      f"{BLOCK/t/1e6:8.1f} M pairs/s{tag}", flush=True)
            except Exception as e:  # noqa: BLE001
                msg = str(e).replace("\n", " ")[:150]
                print(f"w{width:3d} {name:12s}: FAIL {type(e).__name__}: {msg}",
                      flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
