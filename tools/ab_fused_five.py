"""A/B: the fused-FIVE shared-equality kernel (VERDICT r4 item 3) and the
widened lev+jaro envelope (item 4).

Round 4 landed the pair kernel (lev+jaro share one L x L equality matrix via
an in-register bit transpose, 1.69-1.80x isolated) but the five-stat serving
program still paid a separate multiset kernel (which rebuilds ~2L² of the
same equality information as per-position counts) and an XLA prefix pass.
Round 5 folds both into the kernel: cnt_b = popcount(stored EqB words), only
the occurrence-rank half (~1.5L²/2) is new work, prefix is 12 lane ops on
tiles already in registers. This tool measures, per width:

  A. t(five-stat program, round-5 fused path)      — one pallas call
  B. t(five-stat program, round-4 configuration)   — pair kernel + multiset
     pallas + XLA prefix (reconstructed explicitly)
  C. t(separate production kernels summed)         — lev + jaro + multiset

and verifies bit-exactness of every stat against the separate production
kernels. Also A/Bs the widened envelope: W = 2 widths (47/63) and the
halfword-pack int32 route, fused vs separate.

Run on TPU: python tools/ab_fused_five.py        (writes FUSED_FIVE_AB.json)
CPU flow check: STRSIM_AB_SMOKE=1 (w15 only, tiny batch, no timing).
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

T0 = time.time()
FIVE = ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice")


def log(msg):
    print(f"[fused5 +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _pair_tiles(rng, B, L, int32=False, base=97, alpha=26):
    hi = base + alpha
    dt = np.int32 if int32 else np.int8
    codes = rng.integers(base, hi, size=(B, 2 * L)).astype(dt)
    lens = rng.integers(2, L + 1, size=(B, 2)).astype(np.int32)
    lens[: B // 8] = rng.integers(2, 5, size=(B // 8, 2))
    # apply pads past each length (PAD_A = -1 / PAD_B = -2)
    jj = np.arange(L)
    codes[:, :L][jj[None, :] >= lens[:, :1]] = -1
    codes[:, L:][jj[None, :] >= lens[:, 1:]] = -2
    return codes, lens


def _fused5_fn(L, pack, BR):
    """One jitted call computing all five stats via the round-5 mega kernel."""
    from strsim_tpu.ops import lev_jaro_pallas as ljp

    def run(codes, lens):
        a = codes[:, :L]
        b = codes[:, L:]
        res = ljp.fused_stats_pallas(
            a, b, lens[:, 0], lens[:, 1],
            with_inter=True, with_prefix=True, pack=pack, block_rows=BR,
        )
        return jnp.stack(res)  # [5, B]: lev, m, t, inter, prefix

    return jax.jit(run)


def _round4_fn(L, pack, BR):
    """The round-4 fused-five configuration: pair kernel + separate multiset
    pallas + XLA prefix, in one jitted program."""
    from strsim_tpu.ops import lev_jaro_pallas as ljp
    from strsim_tpu.ops import multiset_pallas as msp
    from strsim_tpu.ops.stats import shared_prefix_length

    def run(codes, lens):
        a = codes[:, :L]
        b = codes[:, L:]
        la = lens[:, 0]
        lb = lens[:, 1]
        lev, m, t = ljp.fused_stats_pallas(a, b, la, lb, pack=pack, block_rows=BR)
        inter = msp.multiset_intersection_pallas(a, b, la, lb)
        pref = shared_prefix_length(a, b)
        return jnp.stack([lev, m, t, inter, pref])

    return jax.jit(run)


def _separate_fns(L, pack, BR):
    """Separate production kernels (lev pallas, jaro pallas, multiset
    pallas), each its own jitted program — the unfused baseline C."""
    from strsim_tpu.ops import jaro_pallas_scan as jps
    from strsim_tpu.ops import multiset_pallas as msp
    from strsim_tpu.ops.levenshtein_pallas_scan import (
        levenshtein_distance_myers_pallas,
    )

    def lev(codes, lens):
        return levenshtein_distance_myers_pallas(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1])[None]

    def jaro(codes, lens):
        m, t = jps.jaro_match_stats_pallas_scan(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1],
            pack=None if pack == 4 else pack)
        return jnp.stack([m, t])

    def ms(codes, lens):
        return msp.multiset_intersection_pallas(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1])[None]

    return jax.jit(lev), jax.jit(jaro), jax.jit(ms)


def main():
    from strsim_tpu.utils.devicetime import marginal_block_time

    smoke = os.environ.get("STRSIM_AB_SMOKE") == "1"
    out = {}
    rng = np.random.default_rng(17)

    cases = [
        # (L, pack, int32, label)
        (15, 4, False, "w15_int8"),
        (31, 4, False, "w31_int8"),
        (47, 4, False, "w47_int8"),
        (63, 4, False, "w63_int8"),
        (31, 2, True, "w31_bmp_halfword"),
    ]
    if smoke:
        cases = [(15, 4, False, "w15_int8")]

    for L, pack, int32, label in cases:
        B = 512 if smoke else 262144
        BR = 512 if smoke else None
        from strsim_tpu.ops.lev_jaro_pallas import (
            DEFAULT_BLOCK_ROWS, _fused_block_rows,
        )

        BR = BR or _fused_block_rows(L, pack, DEFAULT_BLOCK_ROWS)
        codes, lens = _pair_tiles(rng, B, L, int32=int32)
        cj, lj = jnp.asarray(codes), jnp.asarray(lens)

        fused5 = _fused5_fn(L, pack, BR)
        got = np.asarray(fused5(cj, lj))

        lev_f, jaro_f, ms_f = _separate_fns(L, pack, BR)
        want_lev = np.asarray(lev_f(cj, lj))[0]
        want_jaro = np.asarray(jaro_f(cj, lj))
        want_ms = np.asarray(ms_f(cj, lj))[0]
        a_np, b_np = codes[:, :L], codes[:, L:]
        k = min(L, 4)
        eqp = (a_np[:, :k] == b_np[:, :k]).astype(np.int64)
        want_pref = np.cumprod(eqp, axis=1).sum(axis=1)
        parity = {
            "lev": bool((got[0] == want_lev).all()),
            "m": bool((got[1] == want_jaro[0]).all()),
            "t": bool((got[2] == want_jaro[1]).all()),
            "inter": bool((got[3] == want_ms).all()),
            "prefix": bool((got[4] == want_pref).all()),
        }
        log(f"{label}: parity {parity}")
        sect = {"batch": B, "block_rows": BR, "pack": pack, "parity": parity}
        if not all(parity.values()):
            out[label] = sect
            continue

        if not smoke:
            codes3 = cj[None]
            lens3 = lj[None]
            r4 = _round4_fn(L, pack, BR)
            t_5 = marginal_block_time(fused5, codes3, lens3)
            t_r4 = marginal_block_time(r4, codes3, lens3)
            t_l = marginal_block_time(lev_f, codes3, lens3)
            t_j = marginal_block_time(jaro_f, codes3, lens3)
            t_m = marginal_block_time(ms_f, codes3, lens3)
            sect.update({
                "t_fused5_ms": round(t_5 * 1e3, 4),
                "t_round4_path_ms": round(t_r4 * 1e3, 4),
                "t_lev_ms": round(t_l * 1e3, 4),
                "t_jaro_ms": round(t_j * 1e3, 4),
                "t_multiset_ms": round(t_m * 1e3, 4),
                "t_separate_sum_ms": round((t_l + t_j + t_m) * 1e3, 4),
                "speedup_vs_round4": round(t_r4 / t_5, 3),
                "speedup_vs_separate": round((t_l + t_j + t_m) / t_5, 3),
                "pairs_per_sec_all_five_stats": round(B / t_5, 1),
            })
            log(f"{label}: fused5 {t_5 * 1e3:.3f} ms vs r4-path "
                f"{t_r4 * 1e3:.3f} ms ({t_r4 / t_5:.2f}x) vs separate "
                f"{(t_l + t_j + t_m) * 1e3:.3f} ms "
                f"({(t_l + t_j + t_m) / t_5:.2f}x); "
                f"{B / t_5 / 1e6:.0f} M pairs/s all-five")
        out[label] = sect

    path = os.path.join(REPO, "FUSED_FIVE_AB.json")
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
