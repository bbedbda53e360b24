"""A/B: Pallas (Mosaic) Myers levenshtein scan vs the XLA sublane-packed kernel.

Bisect findings on this environment's terminal-side Mosaic compiler
(tools-level probes, 2026-08-18):
  * OK: u32 elementwise + bitcast, per-lane variable shifts, fori_loop with
    multi-tensor carry, rank-3 VMEM blocks, dynamic slices, iota/where/
    reduce — i.e. the entire Myers scan body;
  * FAIL (HTTP 500 / exit 1): **int8 VMEM blocks** (the original in-kernel
    Eq build from raw char tiles), and u32 reductions.

So this probe feeds a PRECOMPUTED Eq (built by XLA outside the kernel — a
fully parallel fused compare/select/reduce, no loop carry) and keeps only
the sequential scan inside Pallas, where pv/mv/score live in VMEM for the
whole loop instead of bouncing through HBM each step (the measured XLA
while-loop cost: ~3x1 MB of carry r+w per step).

Measured on v5e (2026-08-18), bit-exact vs the XLA kernel at every point:

    w  7 pallas/br8192  1645.9 M pairs/s   xla-myers8 1353.4 M   (+22%)
    w 15 pallas/br8192  1029.3 M pairs/s   xla-myers8 1065.6 M   (-3%)
    w 31 pallas/br8192   546.7 M pairs/s   xla-myers8  541.6 M   (+1%)

Conclusion: XLA's while-loop carry is NOT the HBM bottleneck it was modeled
to be at these shapes — XLA keeps the sublane-packed carry effectively
resident. Pallas wins only where per-step loop overhead dominates (w=7,
fewest steps x smallest state); br=8192 is the best grid block at all
widths.

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


def _scan_kernel(eq_ref, la_ref, lb_ref, out_ref, *, L: int):
    """eq_ref: [1, L, 8, BR8] i32 (bit j of row word = a_i == b_j, bitcast);
    la/lb: [1, 8, BR8] i32; out: [1, 8, BR8] i32 distances."""
    u32, i32 = jnp.uint32, jnp.int32
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape

    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)

    pv0 = jnp.full(shape, np.uint32(0xFFFFFFFF), u32)
    mv0 = jnp.zeros(shape, u32)
    score0 = la.astype(i32)

    def body(j, state):
        pv, mv, score = state
        eq = lax.bitcast_convert_type(eq_ref[0, pl.ds(j, 1)][0], u32)
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

    _, _, score = lax.fori_loop(0, L, body, (pv0, mv0, score0))
    out_ref[0] = score


def levenshtein_myers_pallas(a, b, len_a, len_b, *, block_rows=8192):
    """W=1 (L <= 32) Myers with the sequential scan in a Pallas kernel."""
    B, L = a.shape
    assert L <= _WORD, "W=1 specialization"
    BR = min(block_rows, B)
    assert B % BR == 0 and BR % SUB == 0
    BR8 = BR // SUB
    G = B // BR
    u32, i32 = jnp.uint32, jnp.int32

    aT, bT = a.T, b.T
    aTp = (
        jnp.concatenate(
            [aT, jnp.full((_WORD - L, B), PAD_A, dtype=aT.dtype)], axis=0
        )
        if L < _WORD
        else aT
    )
    # XLA-side Eq build (fused compare/select/reduce, fully parallel)
    bits = np.uint32(1) << jnp.arange(_WORD, dtype=u32)
    eq4 = aTp.reshape(1, _WORD, B) == bT[:, None, :]
    Eq = jnp.sum(
        jnp.where(eq4, bits[None, :, None], np.uint32(0)), axis=1, dtype=u32
    )  # [L, B]
    Eq3 = (
        lax.bitcast_convert_type(Eq, i32)
        .reshape(L, G, SUB, BR8)
        .transpose(1, 0, 2, 3)
    )  # [G, L, 8, BR8]
    la3 = len_a.astype(i32).reshape(G, SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, SUB, BR8)

    out = pl.pallas_call(
        functools.partial(_scan_kernel, L=L),
        out_shape=jax.ShapeDtypeStruct((G, SUB, BR8), i32),
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (1, L, SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
    )(Eq3, la3, lb3)
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
        for br in (8192, 32768, 262144):
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
                msg = str(e).replace("\n", " ")[:160]
                print(f"w{width:3d} pallas/br{br}: FAIL {type(e).__name__}: {msg}", flush=True)
        t = marginal_block_time(base, codes3, lens3)
        print(
            f"w{width:3d} xla-myers8   : {t*1000:8.4f} ms/block "
            f"= {BLOCK/t/1e6:8.1f} M pairs/s",
            flush=True,
        )
    print("DONE")


if __name__ == "__main__":
    main()
