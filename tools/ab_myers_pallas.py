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


def _myers_step(eq, lb, hbit, j, state):
    u32, i32 = jnp.uint32, jnp.int32
    pv, mv, score = state
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


def _init_state(la):
    u32, i32 = jnp.uint32, jnp.int32
    shape = la.shape
    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)
    pv0 = jnp.full(shape, np.uint32(0xFFFFFFFF), u32)
    mv0 = jnp.zeros(shape, u32)
    score0 = la.astype(i32)
    return hbit, (pv0, mv0, score0)


def _scan_kernel(eq_ref, la_ref, lb_ref, out_ref, *, L: int, unroll: bool):
    """eq_ref: [1, L, 8, BR8] i32 (bit j of row word = a_i == b_j, bitcast);
    la/lb: [1, 8, BR8] i32; out: [1, 8, BR8] i32 distances."""
    u32 = jnp.uint32
    la = la_ref[0]
    lb = lb_ref[0]
    hbit, state = _init_state(la)

    if unroll:  # static steps: no loop machinery, static eq slices
        for j in range(L):
            eq = lax.bitcast_convert_type(eq_ref[0, j], u32)
            state = _myers_step(eq, lb, hbit, j, state)
    else:
        def body(j, state):
            eq = lax.bitcast_convert_type(eq_ref[0, pl.ds(j, 1)][0], u32)
            return _myers_step(eq, lb, hbit, j, state)

        state = lax.fori_loop(0, L, body, state)
    out_ref[0] = state[2]


def _ineq_kernel(a_ref, b_ref, la_ref, lb_ref, out_ref, *, L: int):
    """In-kernel Eq build from i32 char tiles (fully unrolled scan).
    a_ref: [1, 32, 8, BR8] i32 chars (pattern, PAD_A-padded to 32 rows);
    b_ref: [1, L, 8, BR8] i32 chars; la/lb/out: [1, 8, BR8] i32."""
    u32, i32 = jnp.uint32, jnp.int32
    la = la_ref[0]
    lb = lb_ref[0]
    hbit, state = _init_state(la)
    a_rows = [a_ref[0, i] for i in range(_WORD)]
    for j in range(L):
        b_j = b_ref[0, j]
        eq_i = jnp.zeros(la.shape, i32)
        for i in range(_WORD):
            w = np.int32(np.uint32(1) << np.uint32(i))
            eq_i = eq_i | jnp.where(a_rows[i] == b_j, w, np.int32(0))
        eq = lax.bitcast_convert_type(eq_i, u32)
        state = _myers_step(eq, lb, hbit, j, state)
    out_ref[0] = state[2]


def _pad_rows(aT, B, rows):
    L = aT.shape[0]
    if L >= rows:
        return aT
    return jnp.concatenate(
        [aT, jnp.full((rows - L, B), PAD_A, dtype=aT.dtype)], axis=0
    )


def levenshtein_myers_pallas(
    a, b, len_a, len_b, *, block_rows=8192, variant="scan"
):
    """W=1 (L <= 32) Myers with the sequential scan in a Pallas kernel.
    variant: "scan" (XLA Eq + fori_loop), "unroll" (XLA Eq + static steps),
    "ineq" (i32 char tiles in, Eq built in-kernel, static steps)."""
    B, L = a.shape
    assert L <= _WORD, "W=1 specialization"
    BR = min(block_rows, B)
    assert B % BR == 0 and BR % SUB == 0
    BR8 = BR // SUB
    G = B // BR
    u32, i32 = jnp.uint32, jnp.int32

    la3 = len_a.astype(i32).reshape(G, SUB, BR8)
    lb3 = len_b.astype(i32).reshape(G, SUB, BR8)
    row_spec = pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)

    def tile_spec(rows):
        return pl.BlockSpec(
            (1, rows, SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )

    aT, bT = a.T, b.T
    if variant == "ineq":
        a4 = (
            _pad_rows(aT, B, _WORD)
            .astype(i32)
            .reshape(_WORD, G, SUB, BR8)
            .transpose(1, 0, 2, 3)
        )  # [G, 32, 8, BR8]
        b4 = bT.astype(i32).reshape(L, G, SUB, BR8).transpose(1, 0, 2, 3)
        out = pl.pallas_call(
            functools.partial(_ineq_kernel, L=L),
            out_shape=jax.ShapeDtypeStruct((G, SUB, BR8), i32),
            grid=(G,),
            in_specs=[tile_spec(_WORD), tile_spec(L), row_spec, row_spec],
            out_specs=out_spec,
        )(a4, b4, la3, lb3)
        return out.reshape(B)

    # XLA-side Eq build (fused compare/select/reduce, fully parallel)
    aTp = _pad_rows(aT, B, _WORD)
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

    out = pl.pallas_call(
        functools.partial(_scan_kernel, L=L, unroll=(variant == "unroll")),
        out_shape=jax.ShapeDtypeStruct((G, SUB, BR8), i32),
        grid=(G,),
        in_specs=[tile_spec(L), row_spec, row_spec],
        out_specs=out_spec,
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
        for variant in ("scan", "unroll", "ineq"):
            for br in (8192, 32768):
                try:
                    pk = wrap(
                        levenshtein_myers_pallas,
                        width,
                        block_rows=br,
                        variant=variant,
                    )
                    r1 = np.asarray(jax.jit(pk)(codes3[0], lens3[0]))
                    tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
                    t = marginal_block_time(pk, codes3, lens3)
                    print(
                        f"w{width:3d} pallas-{variant:6s}/br{br:6d}: {t*1000:8.4f} ms/block "
                        f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001
                    msg = str(e).replace("\n", " ")[:160]
                    print(
                        f"w{width:3d} pallas-{variant}/br{br}: FAIL {type(e).__name__}: {msg}",
                        flush=True,
                    )
        t = marginal_block_time(base, codes3, lens3)
        print(
            f"w{width:3d} xla-myers8   : {t*1000:8.4f} ms/block "
            f"= {BLOCK/t/1e6:8.1f} M pairs/s",
            flush=True,
        )
    print("DONE")


if __name__ == "__main__":
    main()
