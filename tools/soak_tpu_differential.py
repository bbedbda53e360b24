"""Randomized differential soak ON REAL TPU: the full pipeline (auto impl
routing — fused-five / dp-fused / bigram Pallas kernels + threaded C++
finalize) vs the native C++ reference implementation, bit-for-float, until
SOAK_SECONDS expires.

Complements tools/soak_differential.py (the CPU-backend soak CI can run):
this one exercises the PRODUCTION kernels — Mosaic-compiled Pallas, the
shared-equality fused-five path (levenshtein+jaro+jaro_winkler+jaccard+
sorensen_dice in one kernel), the same-orientation dp-fused path
(lev/osa/lcs), the bigram kernel, halfword/fullword packing on non-ASCII
tiles, and the wide fori kernels — none of which the CPU soak reaches
("auto" never selects Pallas off-TPU).

Batch shapes are drawn from a bounded menu so compile count stays bounded
(each (stat-fields, width-bucket, block) pair compiles once, ~0.4-10 s
post-init); content is fully random per batch. Any mismatch fails with a
repro. Usage (solo process):

    SOAK_SECONDS=600 python tools/soak_tpu_differential.py

Writes SOAK_TPU.json {batches, measure_set_counts, ok} on success.
"""
import json
import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

import strsim_tpu as st
from strsim_tpu.native import native_compute_strings

T0 = time.time()


def log(msg):
    print(f"[tpusoak +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


# measure SETS, chosen to drive every fused path + singles
SETS = [
    ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice"),  # fused-five
    ("levenshtein", "osa", "lcs_seq", "indel"),                 # dp-fused w/ lev
    ("osa", "lcs_seq"),                                         # dp-fused pair
    ("lcs_seq",),                                               # pallas lcs alone
    ("jaccard_bigram", "sorensen_dice_bigram", "hamming"),      # bigram kernel
    ("levenshtein", "jaro", "osa", "lcs_seq"),  # shared-Eq + dp split
    ("jaro_winkler",),
    ("jaccard", "cosine", "overlap"),
    ("jaccard_bigram", "sorensen_dice_bigram", "cosine", "overlap",
     "hamming", "lcs_seq", "indel", "osa", "soundex"),          # all-nine
    ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice",
     "jaccard_bigram", "sorensen_dice_bigram", "cosine", "overlap",
     "hamming", "lcs_seq", "indel", "osa", "soundex"),  # ALL 14 (mega7 path)
]
ALPHAS = ["ab", "abcdefgh", "abcdefghijklmnopqrstuvwxyz -'",
          "aéüñ", "日本語中文한국", "ab𝄞𝄢"]
MAXLENS = [7, 14, 30, 60, 120]  # buckets 7/15/31/63/127 — bounded compiles
SIZES = [512, 4096, 20011]


def main():
    deadline = T0 + int(os.environ.get("SOAK_SECONDS", "600"))
    rng = random.Random(20260820)
    batches = 0
    set_counts = {}
    # tiny first batch to pay the Mosaic init before the clock matters
    log("warming (Mosaic init)...")
    st.compute("levenshtein", ["warm"], ["worm"])
    log("init done; soaking")
    while time.time() < deadline:
        n = rng.choice(SIZES)
        alpha = rng.choice(ALPHAS)
        maxlen = rng.choice(MAXLENS)
        col_a, col_b = [], []
        for _ in range(n):
            la = rng.randrange(0, maxlen)
            lb = rng.randrange(0, maxlen)
            a = "".join(rng.choice(alpha) for _ in range(la))
            b = (a if rng.random() < 0.1
                 else "".join(rng.choice(alpha) for _ in range(lb)))
            if rng.random() < 0.01:
                a = None
            if rng.random() < 0.01:
                b = None
            col_a.append(a)
            col_b.append(b)
        mset = rng.choice(SETS)
        got = st.compute_many(mset, col_a, col_b)
        for m in mset:
            want = native_compute_strings(m, col_a, col_b)
            if got[m].tobytes() != want.tobytes():
                g = got[m]
                bad = np.nonzero(~((g == want) | (np.isnan(g) & np.isnan(want))))[0]
                log(f"MISMATCH {m} set={mset} n={n} alpha={alpha!r} "
                    f"maxlen={maxlen}")
                for i in bad[:5]:
                    log(f"  {col_a[i]!r} {col_b[i]!r} got={g[i]!r} "
                        f"want={want[i]!r}")
                with open(os.path.join(REPO, "SOAK_TPU.json"), "w") as f:
                    json.dump({"ok": False, "batches": batches,
                               "mismatch": {"measure": m, "n": n,
                                            "alpha": alpha,
                                            "maxlen": maxlen}}, f, indent=2)
                sys.exit(1)
        batches += 1
        key = "+".join(mset)
        set_counts[key] = set_counts.get(key, 0) + 1
        if batches % 50 == 0:
            log(f"{batches} batches ok ({time.time() - T0:.0f}s)")
    out = {"ok": True, "batches": batches, "wall_s": round(time.time() - T0, 1),
           "backend": "tpu", "measure_set_counts": set_counts}
    with open(os.path.join(REPO, "SOAK_TPU.json"), "w") as f:
        json.dump(out, f, indent=2)
    log(f"SOAK PASSED: {batches} randomized batches on TPU, all bit-exact")


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
