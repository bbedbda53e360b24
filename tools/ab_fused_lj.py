"""A/B: shared-equality fused levenshtein+jaro kernel (ROOFLINE headroom #5).

In the fused stat set, levenshtein's per-text-position Eq word (bits over
pattern rows i) and jaro's per-pattern-position EqB word (bits over text
rows j) are transposes of the SAME L x L equality matrix, and the round-4
ablation showed that build dominates both kernels (~70% of jaro). This
prototype runs the jaro scan (storing its EqB words), bit-transposes the
packed matrix in registers (Hacker's Delight delta-swap ladder: 4 rounds at
16x16, 5 at 32x32 — ~190/480 vector ops vs ~3L² = 675/2883 for a rebuild),
then runs the Myers scan consuming the transposed words directly.

Success = bit-exact vs the separate production kernels AND measured
t_block(fused) meaningfully below t_block(lev) + t_block(jaro). History
says to expect Mosaic to shrink paper wins (SWAR went 0-for-3) — a measured
dead-end is an acceptable outcome and closes headroom #5 either way.

Run on TPU: python tools/ab_fused_lj.py          (writes FUSED_LJ_AB.json)
CPU parity/flow check: STRSIM_AB_SMOKE=1 + forced cpu backend.
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

from strsim_tpu.ops.jaro_pallas_scan import _SUB, _WORD, _pack_params, _satmask

T0 = time.time()
_ALL_ONES = np.uint32(0xFFFFFFFF)


def log(msg):
    print(f"[fusedlj +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _transpose_bits(words, n):
    """In-register n x n bit transpose (n = 16 or 32) of `words` (list of n
    u32 arrays, bits 0..n-1 valid): returns out with out[i] bit k =
    words[k] bit i. Hacker's Delight 7-3 delta-swap ladder."""
    assert n in (16, 32) and len(words) == n
    x = list(words)
    j = n >> 1
    m = np.uint32(((1 << j) - 1) << j)  # high-half mask: true transpose
    while j:
        k = 0
        while k < n:
            for i in range(k, k + j):
                t = (x[i] ^ (x[i + j] << np.uint32(j))) & m
                x[i] = x[i] ^ t
                x[i + j] = x[i + j] ^ (t >> np.uint32(j))
            k += 2 * j
        j >>= 1
        if j:
            m = m ^ (m >> np.uint32(j))
    return x


def _transpose_oracle_check():
    """Numpy check of the ladder's orientation before trusting it in-kernel."""
    rng = np.random.default_rng(0)
    for n in (16, 32):
        mat = rng.integers(0, 2, size=(n, n)).astype(np.uint32)
        words = [np.uint32((mat[i] << np.arange(n, dtype=np.uint32)).sum() & 0xFFFFFFFF)
                 for i in range(n)]
        # words[i] bit j = mat[i, j]
        wrapped = [jnp.asarray(w)[None] for w in words]
        out = _transpose_bits(wrapped, n)
        for i in range(n):
            for k in range(n):
                got = (int(np.asarray(out[i])[0]) >> k) & 1
                assert got == int(mat[k, i]), (n, i, k)
    log("transpose ladder orientation: OK (16 and 32)")


def _fused_kernel(a_ref, b_ref, la_ref, lb_ref, lev_ref, m_ref, t_ref, *, L, pack):
    """Jaro scan (storing EqB words) + bit transpose + Myers scan consuming
    the transposed words. Single flag word only (L <= 31); pack=4 (int8)."""
    u32, i32 = jnp.uint32, jnp.int32
    W = 1
    WP = -(-L // pack)
    LOG_PACK, LOG_BITS = _pack_params(pack)
    NT = 16 if L <= 16 else 32  # transpose tile
    la = la_ref[0]
    lb = lb_ref[0]
    shape = la.shape
    bound = jnp.maximum(la, lb) // 2 - 1

    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    flag = jnp.zeros(shape, u32)
    seq_a = [jnp.zeros(shape, i32) for _ in range(WP)]
    m = jnp.zeros(shape, i32)
    eqj = []  # EqB word per a-position i (bits over j)

    for i in range(L):
        a_i = a_rows[i]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)
        eq_i = jnp.zeros(shape, i32)
        for j in range(L):
            bit = np.int32(np.uint32(1) << np.uint32(j))
            eq_i = eq_i | jnp.where(b_rows[j] == a_i, bit, np.int32(0))
        eqw = lax.bitcast_convert_type(eq_i, u32)
        eqj.append(eqw)
        win = _satmask(hi + 1) & ~_satmask(lo)
        cand = eqw & ~flag & win
        cand = jnp.where(active, cand, np.uint32(0))
        lsb = cand & (~cand + np.uint32(1))
        flag = flag | lsb
        found = cand != 0
        v = jnp.where(found, a_i, 0)
        val = v << ((m & (pack - 1)) << LOG_BITS)
        mw = m >> LOG_PACK
        for wp in range(WP):
            seq_a[wp] = seq_a[wp] | jnp.where(mw == wp, val, 0)
        m = m + found.astype(i32)

    # b-side compaction + t (same as the production kernel)
    seq_b = [jnp.zeros(shape, i32) for _ in range(WP)]
    rb = jnp.zeros(shape, i32)
    for j in range(L):
        fb = (flag >> np.uint32(j)) & np.uint32(1)
        fbit = fb != 0
        v = jnp.where(fbit, b_rows[j], 0)
        val = v << ((rb & (pack - 1)) << LOG_BITS)
        rw = rb >> LOG_PACK
        for wp in range(WP):
            seq_b[wp] = seq_b[wp] | jnp.where(rw == wp, val, 0)
        rb = rb + fbit.astype(i32)
    bits = 32 // pack
    mask = (1 << bits) - 1
    t = jnp.zeros(shape, i32)
    for wp in range(WP):
        x = seq_a[wp] ^ seq_b[wp]
        for s in range(pack):
            t = t + (((x >> (bits * s)) & mask) != 0).astype(i32)

    # transpose: eqj[i] bit j  ->  eql[j] bit i
    eqj_p = eqj + [jnp.zeros(shape, u32) for _ in range(NT - L)]
    eql = _transpose_bits(eqj_p, NT)

    # Myers scan consuming eql[j] directly (levenshtein_pallas_scan._kernel
    # minus its 3L^2 Eq build)
    m1 = jnp.maximum(la - 1, 0)
    hbit = (m1 % _WORD).astype(u32)
    pv = jnp.full(shape, _ALL_ONES, u32)
    mv = jnp.zeros(shape, u32)
    score = la.astype(i32)
    for j in range(L):
        eq = eql[j]
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
        pv = jnp.where(active, pv_n, pv)
        mv = jnp.where(active, mv_n, mv)

    lev_ref[0] = score
    m_ref[0] = m
    t_ref[0] = t


def make_fused(L, BR, pack=4):
    i32 = jnp.int32

    def run(codes, lens):  # [B, 2L] int8, [B, 2] i32 -> [3, B] i32
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
        lev3, m3, t3 = pl.pallas_call(
            functools.partial(_fused_kernel, L=L, pack=pack),
            out_shape=(jax.ShapeDtypeStruct((G, _SUB, BR8), i32),) * 3,
            grid=(G,),
            in_specs=[tile_spec(L), tile_spec(L), row_spec, row_spec],
            out_specs=(row_spec,) * 3,
            interpret=jax.default_backend() != "tpu",
        )(a4, b4, la3, lb3)
        return jnp.stack([lev3.reshape(B), m3.reshape(B), t3.reshape(B)])

    return jax.jit(run)


def main():
    from strsim_tpu.config import get_config
    from strsim_tpu.models import pipeline as pp
    from strsim_tpu.utils.devicetime import marginal_block_time

    _transpose_oracle_check()
    smoke = os.environ.get("STRSIM_AB_SMOKE") == "1"
    cfg = get_config()
    out = {}
    rng = np.random.default_rng(11)
    for L in ((15,) if smoke else (15, 31)):
        B = 512 if smoke else 262144
        BR = 512 if smoke else 8192
        codes = rng.integers(97, 123, size=(B, 2 * L)).astype(np.int8)
        lens = rng.integers(2, L + 1, size=(B, 2)).astype(np.int32)
        # exercise pads: some shorter rows + the window edge cases
        lens[: B // 8] = rng.integers(2, 5, size=(B // 8, 2))

        fused = make_fused(L, BR)
        got = np.asarray(fused(jnp.asarray(codes), jnp.asarray(lens)))

        # parity vs the separate production kernels (lev + jaro stat sets)
        lev_k = pp._get_kernel(("levenshtein",), pp._impls_for(cfg, L, np.int8))
        jaro_k = pp._get_kernel(("jaro",), pp._impls_for(cfg, L, np.int8))
        want_lev = np.asarray(lev_k(jnp.asarray(codes), jnp.asarray(lens)))[0]
        want_jaro = np.asarray(jaro_k(jnp.asarray(codes), jnp.asarray(lens)))
        ok_lev = bool((got[0] == want_lev).all())
        # jaro kernel stat order: fields sorted — jaro_m, jaro_t
        ok_m = bool((got[1] == want_jaro[0]).all())
        ok_t = bool((got[2] == want_jaro[1]).all())
        log(f"L={L}: parity lev={ok_lev} m={ok_m} t={ok_t}")
        sect = {"batch": B, "parity": {"lev": ok_lev, "m": ok_m, "t": ok_t}}
        if not (ok_lev and ok_m and ok_t):
            bad = np.nonzero(got[0] != want_lev)[0][:5]
            log(f"  first lev mismatches at rows {bad.tolist()}")
            out[f"L{L}"] = sect
            continue

        if not smoke:
            C = 1
            codes3 = jnp.asarray(codes.reshape(C, B, 2 * L))
            lens3 = jnp.asarray(lens.reshape(C, B, 2))
            t_f = marginal_block_time(fused, codes3, lens3)
            t_l = marginal_block_time(lev_k, codes3, lens3)
            t_j = marginal_block_time(jaro_k, codes3, lens3)
            sect.update({
                "t_fused_ms": round(t_f * 1e3, 4),
                "t_lev_ms": round(t_l * 1e3, 4),
                "t_jaro_ms": round(t_j * 1e3, 4),
                "t_separate_ms": round((t_l + t_j) * 1e3, 4),
                "speedup_vs_separate": round((t_l + t_j) / t_f, 3),
            })
            log(f"L={L}: fused {t_f * 1e3:.3f} ms vs lev {t_l * 1e3:.3f} + "
                f"jaro {t_j * 1e3:.3f} = {(t_l + t_j) * 1e3:.3f} ms "
                f"({(t_l + t_j) / t_f:.2f}x)")
        out[f"L{L}"] = sect

    path = os.path.join(REPO, "FUSED_LJ_AB.json")
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
