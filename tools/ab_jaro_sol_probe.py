"""Jaro speed-of-light probe (VERDICT r3 item 7) — cost attribution by
kernel ablation, plus a check of the roofline model the 26%-SoL claim
rests on.

Round 3 left jaro at "26% of speed-of-light" vs levenshtein's 52% on the
same toolchain (docs/ROOFLINE.md). Before hunting more kernel tricks (three
SWAR/scan/XLA reformulations already measured as dead ends), this probe asks
two cheaper questions:

  1. Is the MODEL right? ops/roofline.py's levenshtein cost still described
     the round-2 XLA Myers kernel (Eq charged over 32*W padded slots + a
     materialized [L, W, B] Eq HBM tensor). The round-3 production Pallas
     kernel builds Eq in-kernel over the L real positions and never touches
     HBM between phases — the stale model overcharges lev ~1.7x at L=15 and
     invents HBM traffic, inflating lev's "efficiency" relative to jaro.
     (Fixed in roofline.py alongside this probe; this tool prints both.)

  2. Where does jaro's device time actually go? Four ablated variants of the
     fused kernel, each measured with the chunk-differenced timer:
       full        — the production kernel (EqB + greedy + compaction + t)
       no_tcount   — skip the b-side compaction pass + t count
       scan_only   — also skip the a-side rank compaction insert
       eqb_only    — only the in-kernel EqB build + reduce (no greedy chain)
     The deltas attribute time to (EqB build | greedy chain | a-compaction |
     b-compaction+t) and are compared against the model's per-term charges.

Run on TPU: python tools/ab_jaro_sol_probe.py
Writes JARO_SOL_PROBE.json; conclusion recorded in docs/ROOFLINE.md.
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
    _block_rows_for,
    _pack_params,
    _satmask,
)

T0 = time.time()


def log(msg):
    print(f"[jaroprobe +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _ablated_kernel(a_ref, b_ref, la_ref, lb_ref, m_ref, t_ref, *, L, pack, mode):
    """The production unrolled kernel body with later phases ablated.
    mode: 'full' | 'no_tcount' | 'scan_only' | 'eqb_only'."""
    u32, i32 = jnp.uint32, jnp.int32
    W = -(-L // _WORD)
    WP = -(-L // pack)
    LOG_PACK, LOG_BITS = _pack_params(pack)
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    bound = jnp.maximum(la, lb) // 2 - 1
    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    flag = [jnp.zeros(shape, u32) for _ in range(W)]
    seq_a = [jnp.zeros(shape, i32) for _ in range(WP)]
    m = jnp.zeros(shape, i32)
    acc = jnp.zeros(shape, i32)  # eqb_only checksum (keeps the build alive)

    for i in range(L):
        a_i = a_rows[i]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        found = jnp.zeros(shape, bool)
        for w in range(W):
            eq_i = jnp.zeros(shape, i32)
            for j in range(w * _WORD, min((w + 1) * _WORD, L)):
                bit = np.int32(np.uint32(1) << np.uint32(j % _WORD))
                eq_i = eq_i | jnp.where(b_rows[j] == a_i, bit, np.int32(0))
            if mode == "eqb_only":
                acc = acc ^ eq_i
                continue
            eqw = lax.bitcast_convert_type(eq_i, u32)
            win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
            cand = eqw & ~flag[w] & win
            cand = jnp.where(active & ~found, cand, np.uint32(0))
            lsb = cand & (~cand + np.uint32(1))
            flag[w] = flag[w] | lsb
            found = found | (cand != 0)
        if mode in ("eqb_only", "scan_only"):
            if mode == "scan_only":
                m = m + found.astype(i32)
            continue
        v = jnp.where(found, a_i, 0)
        val = v if pack == 1 else v << ((m & (pack - 1)) << LOG_BITS)
        mw = m if pack == 1 else m >> LOG_PACK
        for wp in range(WP):
            seq_a[wp] = seq_a[wp] | jnp.where(mw == wp, val, 0)
        m = m + found.astype(i32)

    if mode in ("full",):
        seq_b = [jnp.zeros(shape, i32) for _ in range(WP)]
        rb = jnp.zeros(shape, i32)
        for j in range(L):
            fb = (flag[j // _WORD] >> np.uint32(j % _WORD)) & np.uint32(1)
            fbit = fb != 0
            v = jnp.where(fbit, b_rows[j], 0)
            val = v if pack == 1 else v << ((rb & (pack - 1)) << LOG_BITS)
            rw = rb if pack == 1 else rb >> LOG_PACK
            for wp in range(WP):
                seq_b[wp] = seq_b[wp] | jnp.where(rw == wp, val, 0)
            rb = rb + fbit.astype(i32)
        bits = 32 // pack
        mask = (1 << bits) - 1
        t = jnp.zeros(shape, i32)
        for wp in range(WP):
            x = seq_a[wp] ^ seq_b[wp]
            if pack == 1:
                t = t + (x != 0).astype(i32)
            else:
                for s in range(pack):
                    t = t + (((x >> (bits * s)) & mask) != 0).astype(i32)
    elif mode == "eqb_only":
        t = acc
    else:
        t = m
    m_ref[0] = m if mode != "eqb_only" else acc
    t_ref[0] = t


def make_variant(L, BR, mode, pack=4):
    i32 = jnp.int32

    def run(codes, lens):  # [B, 2L] int8, [B, 2] i32 -> [2, B] i32 stats
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
            functools.partial(_ablated_kernel, L=L, pack=pack, mode=mode),
            out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
                       jax.ShapeDtypeStruct((G, _SUB, BR8), i32)),
            grid=(G,),
            in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
            out_specs=(row_spec, row_spec),
            interpret=jax.default_backend() != "tpu",
        )(a4, b4, la3, lb3)
        return jnp.stack([m3.reshape(B), t3.reshape(B)])

    return jax.jit(run)


def main():
    from strsim_tpu.ops.roofline import ENVELOPE, jaro_cost, levenshtein_cost
    from strsim_tpu.utils.devicetime import marginal_block_time

    out = {"envelope": {"vpu_ops_per_sec": ENVELOPE.vpu_ops_per_sec,
                        "hbm_bytes_per_sec": ENVELOPE.hbm_bytes_per_sec,
                        "provenance": ENVELOPE.provenance}}
    smoke = os.environ.get("STRSIM_AB_SMOKE") == "1"  # CPU flow check only
    rng = np.random.default_rng(7)
    for L in (15, 31) if not smoke else (15,):
        B = 262144 if not smoke else 512
        BR = 8192 if not smoke else 512
        codes = rng.integers(97, 123, size=(B, 2 * L)).astype(np.int8)
        lens = rng.integers(max(2, L - 7), L + 1, size=(B, 2)).astype(np.int32)
        C = 1
        codes3 = jnp.asarray(codes.reshape(C, B, 2 * L))
        lens3 = jnp.asarray(lens.reshape(C, B, 2))
        section = {"batch": B, "block_rows": BR}
        times = {}
        for mode in ("full", "no_tcount", "scan_only", "eqb_only"):
            k = make_variant(L, BR, mode)
            t = marginal_block_time(k, codes3, lens3)
            times[mode] = t
            section[mode + "_ms"] = round(t * 1e3, 4)
            log(f"L={L} {mode}: {t * 1e3:.3f} ms/block "
                f"({B / t / 1e6:.0f} M pairs/s)")
        section["attribution_ms"] = {
            "eqb_build": round(times["eqb_only"] * 1e3, 4),
            "greedy_chain": round((times["scan_only"] - times["eqb_only"]) * 1e3, 4),
            "a_compaction": round((times["no_tcount"] - times["scan_only"]) * 1e3, 4),
            "b_compaction_and_t": round((times["full"] - times["no_tcount"]) * 1e3, 4),
        }
        # model comparison (corrected models)
        jc = jaro_cost(B, L, 1)
        lc = levenshtein_cost(B, L, 1)
        sol_j = jc.speed_of_light_s(ENVELOPE)
        section["model"] = {
            "jaro_lane_ops_per_pair": jc.lane_ops / B,
            "jaro_sol_ms": round(sol_j * 1e3, 4),
            "jaro_efficiency": round(sol_j / times["full"], 3),
            "lev_lane_ops_per_pair": lc.lane_ops / B,
        }
        log(f"L={L} attribution: {section['attribution_ms']} "
            f"efficiency(corrected model)={section['model']['jaro_efficiency']}")
        out[f"L{L}"] = section

    path = os.path.join(REPO, "JARO_SOL_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
