"""A/B: same-orientation fused DP kernel (lev/osa/lcs off one Eq build) vs
the separate production kernels — ROOFLINE headroom #7.

Also the TPU parity lock for the W = 2 widths (47/63), which the CI suite
cannot interpret (XLA:CPU unroll wall — see tests/test_pallas.py).

Run on TPU: python tools/ab_dp_fused.py         (writes DP_FUSED_AB.json)
CPU flow check: STRSIM_AB_SMOKE=1 (w15, tiny batch, no timing).
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


def log(msg):
    print(f"[dpfused +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _tiles(rng, B, L):
    codes = rng.integers(97, 123, size=(B, 2 * L)).astype(np.int8)
    lens = rng.integers(0, L + 1, size=(B, 2)).astype(np.int32)
    jj = np.arange(L)
    codes[:, :L][jj[None, :] >= lens[:, :1]] = -1
    codes[:, L:][jj[None, :] >= lens[:, 1:]] = -2
    return codes, lens


def _fused_fn(L, flags):
    from strsim_tpu.ops.dp_fused_pallas import dp_fused_stats_pallas

    def run(codes, lens):
        res = dp_fused_stats_pallas(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1], **flags)
        return jnp.stack(res)

    return jax.jit(run)


def _sep_fns(L):
    from strsim_tpu.ops.lcs import lcs_length
    from strsim_tpu.ops.levenshtein_pallas_scan import (
        levenshtein_distance_myers_pallas,
    )
    from strsim_tpu.ops.osa_pallas_scan import osa_distance_pallas

    def lev(codes, lens):
        return levenshtein_distance_myers_pallas(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1])[None]

    def osa(codes, lens):
        return osa_distance_pallas(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1])[None]

    def lcs(codes, lens):
        return lcs_length(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1])[None]

    return jax.jit(lev), jax.jit(osa), jax.jit(lcs)


def main():
    from strsim_tpu.utils.devicetime import marginal_block_time

    smoke = os.environ.get("STRSIM_AB_SMOKE") == "1"
    out = {}
    rng = np.random.default_rng(31)
    widths = (15,) if smoke else (15, 31, 47, 63, 127, 383)
    for L in widths:
        B = 512 if smoke else 262144
        codes, lens = _tiles(rng, B, L)
        cj, lj = jnp.asarray(codes), jnp.asarray(lens)
        all3 = _fused_fn(L, dict(with_lev=True, with_osa=True, with_lcs=True))
        got = np.asarray(all3(cj, lj))
        lev_f, osa_f, lcs_f = _sep_fns(L)
        want = np.concatenate([
            np.asarray(lev_f(cj, lj)),
            np.asarray(osa_f(cj, lj)),
            np.asarray(lcs_f(cj, lj)),
        ])
        ok = bool((got == want).all())
        log(f"w{L}: parity {ok}")
        sect = {"batch": B, "parity": ok}
        if not ok:
            bad = np.nonzero((got != want).any(axis=0))[0][:5]
            log(f"  first mismatches rows {bad.tolist()}")
            out[f"w{L}"] = sect
            continue
        if not smoke:
            t_3 = marginal_block_time(all3, cj[None], lj[None])
            t_l = marginal_block_time(lev_f, cj[None], lj[None])
            t_o = marginal_block_time(osa_f, cj[None], lj[None])
            t_c = marginal_block_time(lcs_f, cj[None], lj[None])
            osa_lcs = _fused_fn(L, dict(with_osa=True, with_lcs=True))
            t_ol = marginal_block_time(osa_lcs, cj[None], lj[None])
            lcs_only = _fused_fn(L, dict(with_lcs=True))
            t_c2 = marginal_block_time(lcs_only, cj[None], lj[None])
            sect.update({
                "t_fused3_ms": round(t_3 * 1e3, 4),
                "t_lev_ms": round(t_l * 1e3, 4),
                "t_osa_ms": round(t_o * 1e3, 4),
                "t_lcs_xla_ms": round(t_c * 1e3, 4),
                "t_separate_sum_ms": round((t_l + t_o + t_c) * 1e3, 4),
                "speedup_vs_separate": round((t_l + t_o + t_c) / t_3, 3),
                "t_fused_osa_lcs_ms": round(t_ol * 1e3, 4),
                "speedup_osa_lcs_vs_separate": round((t_o + t_c) / t_ol, 3),
                "t_lcs_pallas_ms": round(t_c2 * 1e3, 4),
                "lcs_pallas_vs_xla": round(t_c / t_c2, 3),
            })
            log(f"w{L}: fused3 {t_3*1e3:.3f} vs lev+osa+lcs "
                f"{(t_l+t_o+t_c)*1e3:.3f} ({(t_l+t_o+t_c)/t_3:.2f}x); "
                f"osa+lcs fused {t_ol*1e3:.3f} vs {(t_o+t_c)*1e3:.3f} "
                f"({(t_o+t_c)/t_ol:.2f}x); lcs pallas {t_c2*1e3:.3f} vs xla "
                f"{t_c*1e3:.3f} ({t_c/t_c2:.2f}x)")
        out[f"w{L}"] = sect

    path = os.path.join(REPO, "DP_FUSED_AB.json")
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
