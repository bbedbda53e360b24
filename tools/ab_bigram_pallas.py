"""A/B: bigram-multiset Pallas kernel vs the XLA occurrence-rank scan.

The bigram measures were the all-nine extension path's bottleneck
(jaccard_bigram 372 M pairs/s alone, BENCH_EXTENSIONS.json round 4, vs
1.3 B for the unigram Pallas multiset). ops/bigram_pallas.py applies the
unigram kernel's recipe plus 16-bit packed bigram tokens (one compare per
(i, j) on int8 tiles). This measures both tile dtypes at the narrow-ladder
widths and the fused three-measure extension subset.

Run on TPU: python tools/ab_bigram_pallas.py       (writes BIGRAM_AB.json)
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
    print(f"[bigram +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _tiles(rng, B, L, int32=False):
    dt = np.int32 if int32 else np.int8
    codes = rng.integers(97, 123, size=(B, 2 * L)).astype(dt)
    lens = rng.integers(0, L + 1, size=(B, 2)).astype(np.int32)
    jj = np.arange(L)
    codes[:, :L][jj[None, :] >= lens[:, :1]] = -1
    codes[:, L:][jj[None, :] >= lens[:, 1:]] = -2
    return codes, lens


def _pallas_fn(L):
    from strsim_tpu.ops.bigram_pallas import bigram_stats_pallas

    def run(codes, lens):
        i2, ham, eq = bigram_stats_pallas(
            codes[:, :L], codes[:, L:], lens[:, 0], lens[:, 1])
        return jnp.stack([i2, ham, eq])

    return jax.jit(run)


def _xla_fn(L):
    from strsim_tpu.ops.multiset_loop import bigram_intersection_loop
    from strsim_tpu.ops.stats import row_equal

    def run(codes, lens):
        a, b = codes[:, :L], codes[:, L:]
        la, lb = lens[:, 0], lens[:, 1]
        i2 = bigram_intersection_loop(a, b, la, lb)
        ham = jnp.sum((a == b).astype(jnp.int32), axis=1)
        eq = row_equal(a, b, la, lb)
        return jnp.stack([i2, ham, eq])

    return jax.jit(run)


def main():
    from strsim_tpu.utils.devicetime import marginal_block_time

    smoke = os.environ.get("STRSIM_AB_SMOKE") == "1"
    out = {}
    rng = np.random.default_rng(29)
    cases = [(15, False), (31, False), (63, False), (31, True)]
    if smoke:
        cases = [(15, False)]
    for L, int32 in cases:
        label = f"w{L}_{'int32' if int32 else 'int8'}"
        B = 512 if smoke else 262144
        codes, lens = _tiles(rng, B, L, int32=int32)
        cj, lj = jnp.asarray(codes), jnp.asarray(lens)
        pf = _pallas_fn(L)
        xf = _xla_fn(L)
        got = np.asarray(pf(cj, lj))
        want = np.asarray(xf(cj, lj))
        ok = bool((got == want).all())
        log(f"{label}: parity {ok}")
        sect = {"batch": B, "parity": ok}
        if not ok:
            out[label] = sect
            continue
        if not smoke:
            t_p = marginal_block_time(pf, cj[None], lj[None])
            t_x = marginal_block_time(xf, cj[None], lj[None])
            sect.update({
                "t_pallas_ms": round(t_p * 1e3, 4),
                "t_xla_ms": round(t_x * 1e3, 4),
                "speedup": round(t_x / t_p, 3),
                "pairs_per_sec_pallas": round(B / t_p, 1),
            })
            log(f"{label}: pallas {t_p * 1e3:.3f} ms vs xla {t_x * 1e3:.3f} "
                f"ms ({t_x / t_p:.2f}x); {B / t_p / 1e6:.0f} M pairs/s")
        out[label] = sect

    path = os.path.join(REPO, "BIGRAM_AB.json")
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
