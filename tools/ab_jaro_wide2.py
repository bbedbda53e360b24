"""A/B: window-clipped word skipping for the WIDE jaro kernel (VERDICT r4
item 5 — w383/511 run at 206/388 ns/pair, the thinnest wide-ladder margin).

The greedy window for scan step i is [i-bound, i+bound] ∩ [0, len_b)
(src/expressions/strsim.rs:208-219, bound = max(la,lb)/2 - 1). The
production wide kernel (ops/jaro_pallas_scan._kernel_wide) builds ALL
W = ceil(L/32) EqB words every step and masks; but a whole 32-bit word is
provably dead when the block-level window union misses it — the corner
triangles of the (i, word) band, ~25% of the grid at bound ≈ L/2 and more
when the short side is shorter. This probe keeps the flag state in VMEM
scratch refs so each word's build+match can sit under @pl.when on SCALAR
per-step bounds (block max of bound / len_b, reduced in-kernel exactly like
the production kernel's dynamic trip count).

Success = bit-exact vs the production wide kernel AND a measured win at
w383/511; a measured rejection closes the probe either way (ROOFLINE gets
the entry regardless — the SWAR lesson says Mosaic may already be skipping
masked work).

Run on TPU: python tools/ab_jaro_wide2.py      (writes JARO_WIDE2_AB.json)
CPU flow check: STRSIM_AB_SMOKE=1 (w95, tiny batch, no timing).
"""
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.ops.jaro_pallas_scan import (
    _SUB,
    _WORD,
    _count_unequal_slots,
    _pack_params,
    _satmask,
    _wide_block_rows,
)

T0 = time.time()


def log(msg):
    print(f"[jwide2 +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _kernel_wide_clipped(
    a_ref, b_ref, la_ref, lb_ref, m_ref, t_ref, flag_ref, found_ref,
    *, L: int, pack: int,
):
    """Window-clipped variant of jaro_pallas_scan._kernel_wide: identical
    greedy/compaction semantics; flag lives in a scratch ref so each word's
    EqB build + match update runs under @pl.when(word intersects the
    block-level window union). flag_ref: [W, 8, BR8] u32 scratch;
    found_ref: [1, 8, BR8] i32 scratch (per-step found mask)."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    WP = -(-L // pack)
    LOG_PACK, LOG_BITS = _pack_params(pack)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    bound = jnp.maximum(la, lb) // 2 - 1

    # block-level scalar bounds (same in-kernel reduction style as the
    # production kernel's dynamic trip count)
    bound_max = jnp.max(bound)
    lb_max = jnp.max(lb)

    for w in range(W):
        flag_ref[w] = jnp.zeros(shape, u32)

    seqa0 = jnp.zeros((WP,) + shape, i32)
    m0 = jnp.zeros(shape, i32)

    def scan_body(i, state):
        seq_a, m = state
        a_i = a_ref[0, i]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        # scalar union of every lane's live word range at this step
        lo_min = i - bound_max
        hi_max = jnp.minimum(i + bound_max, lb_max - 1)
        found_ref[0] = jnp.zeros(shape, i32)
        for w in range(W):  # greedy: low word -> high
            live = (np.int32(_WORD * w) <= hi_max) & (
                np.int32(_WORD * (w + 1)) > lo_min
            )

            @pl.when(live)
            def _(w=w):
                eq_i = jnp.zeros(shape, i32)
                for j in range(w * _WORD, min((w + 1) * _WORD, L)):
                    bit = np.int32(np.uint32(1) << np.uint32(j % _WORD))
                    eq_i = eq_i | jnp.where(b_ref[0, j] == a_i, bit, np.int32(0))
                eqw = lax.bitcast_convert_type(eq_i, u32)
                win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
                cand = eqw & ~flag_ref[w] & win
                not_found = found_ref[0] == 0
                cand = jnp.where(active & not_found, cand, np.uint32(0))
                lsb = cand & (~cand + np.uint32(1))
                flag_ref[w] = flag_ref[w] | lsb
                found_ref[0] = found_ref[0] | (cand != 0).astype(i32)

        found = found_ref[0] != 0
        v = jnp.where(found, a_i, 0)
        val = v if pack == 1 else v << ((m & (pack - 1)) << LOG_BITS)
        mw = m if pack == 1 else m >> LOG_PACK
        wwp = lax.broadcasted_iota(i32, (WP,) + shape, 0)
        seq_a = seq_a | jnp.where(wwp == mw[None], val[None], 0)
        m = m + found.astype(i32)
        return seq_a, m

    i_max = jnp.minimum(jnp.max(jnp.minimum(la, lb + bound)), L)
    seq_a, m = lax.fori_loop(0, i_max, scan_body, (seqa0, m0))

    def compact_body(j, state):
        seq_b, rb = state
        jw = j // _WORD
        jb = (j % _WORD).astype(u32)
        fw = jnp.zeros(shape, u32)
        for w in range(W):
            fw = jnp.where(jw == w, flag_ref[w], fw)
        fbit = ((fw >> jb) & 1) != 0
        v = jnp.where(fbit, b_ref[0, j], 0)
        val = v if pack == 1 else v << ((rb & (pack - 1)) << LOG_BITS)
        rw = rb if pack == 1 else rb >> LOG_PACK
        wwp = lax.broadcasted_iota(jnp.int32, (WP,) + shape, 0)
        seq_b = seq_b | jnp.where(wwp == rw[None], val[None], 0)
        rb = rb + fbit.astype(jnp.int32)
        return seq_b, rb

    j_max = jnp.minimum(jnp.max(lb), L)
    seq_b, _ = lax.fori_loop(
        0, j_max, compact_body,
        (jnp.zeros((WP,) + shape, jnp.int32), jnp.zeros(shape, jnp.int32)),
    )

    t = _count_unequal_slots(seq_a, [seq_b[wp] for wp in range(WP)], pack, shape)
    m_ref[0] = m
    t_ref[0] = t


def make_clipped(L, BR, pack=4):
    i32 = jnp.int32
    W = -(-L // _WORD)

    def run(codes, lens):
        B = codes.shape[0]
        a = codes[:, :L]
        b = codes[:, L:]
        la = lens[:, 0]
        lb = lens[:, 1]
        BR8 = BR // _SUB
        G = B // BR
        aT = a.T.astype(i32)
        bT = b.T.astype(i32)
        a4 = aT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
        b4 = bT.reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
        la3 = la.astype(i32).reshape(G, _SUB, BR8)
        lb3 = lb.astype(i32).reshape(G, _SUB, BR8)

        def tile_spec(rows):
            return pl.BlockSpec((1, rows, _SUB, BR8), lambda g: (g, 0, 0, 0),
                                memory_space=pltpu.VMEM)

        row_spec = pl.BlockSpec((1, _SUB, BR8), lambda g: (g, 0, 0),
                                memory_space=pltpu.VMEM)
        m3, t3 = pl.pallas_call(
            functools.partial(_kernel_wide_clipped, L=L, pack=pack),
            out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),) * 2,
            grid=(G,),
            in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
            out_specs=(row_spec,) * 2,
            scratch_shapes=[
                pltpu.VMEM((W, _SUB, BR8), jnp.uint32),
                pltpu.VMEM((1, _SUB, BR8), jnp.int32),
            ],
            interpret=jax.default_backend() != "tpu",
        )(a4, b4, la3, lb3)
        return jnp.stack([m3.reshape(B), t3.reshape(B)])

    return jax.jit(run)


def make_production(L, BR, pack=4):
    from strsim_tpu.ops import jaro_pallas_scan as jps

    def run(codes, lens):
        m, t = jps.jaro_match_stats_pallas_scan(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1],
            block_rows=BR, pack=None if pack == 4 else pack,
        )
        return jnp.stack([m, t])

    return jax.jit(run)


def main():
    from strsim_tpu.utils.devicetime import marginal_block_time

    smoke = os.environ.get("STRSIM_AB_SMOKE") == "1"
    out = {}
    rng = np.random.default_rng(23)
    widths = (95,) if smoke else (191, 383, 511)
    for L in widths:
        B = 512 if smoke else 65536
        BR = 512 if smoke else _wide_block_rows(L, 4)
        codes = rng.integers(97, 123, size=(B, 2 * L)).astype(np.int8)
        lens = np.empty((B, 2), np.int32)
        # bucket-realistic lengths: max side in the bucket band, min side
        # anywhere below — this is what sets the window asymmetry
        lo_band = (3 * L) // 4
        lens[:, 0] = rng.integers(lo_band, L + 1, size=B)
        lens[:, 1] = rng.integers(2, L + 1, size=B)
        swap = rng.random(B) < 0.5
        lens[swap] = lens[swap][:, ::-1]
        jj = np.arange(L)
        codes[:, :L][jj[None, :] >= lens[:, :1]] = -1
        codes[:, L:][jj[None, :] >= lens[:, 1:]] = -2
        cj, lj = jnp.asarray(codes), jnp.asarray(lens)

        clip = make_clipped(L, BR)
        prod = make_production(L, BR)
        got = np.asarray(clip(cj, lj))
        want = np.asarray(prod(cj, lj))
        ok = bool((got == want).all())
        log(f"L={L}: parity {ok}")
        sect = {"batch": B, "block_rows": BR, "parity": ok}
        if not ok:
            bad = np.nonzero((got != want).any(axis=0))[0][:5]
            log(f"  first mismatches rows {bad.tolist()}")
            out[f"L{L}"] = sect
            continue
        if not smoke:
            codes3, lens3 = cj[None], lj[None]
            t_c = marginal_block_time(clip, codes3, lens3)
            t_p = marginal_block_time(prod, codes3, lens3)
            sect.update({
                "t_clipped_ms": round(t_c * 1e3, 4),
                "t_production_ms": round(t_p * 1e3, 4),
                "speedup": round(t_p / t_c, 3),
                "per_pair_ns_clipped": round(t_c / B * 1e9, 1),
                "per_pair_ns_production": round(t_p / B * 1e9, 1),
            })
            log(f"L={L}: clipped {t_c * 1e3:.3f} ms vs production "
                f"{t_p * 1e3:.3f} ms ({t_p / t_c:.3f}x)")
        out[f"L{L}"] = sect

    path = os.path.join(REPO, "JARO_WIDE2_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")


if __name__ == "__main__":
    try:
        main()
    finally:
        try:
            from strsim_tpu.utils.compile_guard import run_with_timeout

            run_with_timeout(lambda: __import__("jax").clear_backends(), 10.0)
        except Exception:
            pass
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
