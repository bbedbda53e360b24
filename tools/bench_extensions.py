#!/usr/bin/env python
"""Extension-measure benchmark → BENCH_EXTENSIONS.json.

Same workload (bench.make_pairs: 1M genealogy name pairs, len ≤ 64) and same
relay-immune resident methodology as bench.py (utils/devicetime.py chunk
differencing) applied to the measures that do NOT exist in the reference:
osa, lcs_seq, hamming, cosine, jaccard_bigram, plus the all-extensions fused
set. Measures that share a kernel with a benched one (indel→lcs_seq,
overlap→cosine, sorensen_dice_bigram→jaccard_bigram) are recorded as aliases
rather than re-timed — their stats come out of the same compiled executable.

Run: timeout 3000 python tools/bench_extensions.py   (one TPU process; first
run compiles each (measure-set, bucket) pair — the persistent XLA cache makes
reruns fast).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root harness: make_pairs, measure_resident)

# benched set -> measures whose kernel/stats are identical (not re-timed)
SETS = [
    (("osa",), ()),
    (("lcs_seq",), ("indel",)),
    (("hamming",), ()),
    (("cosine",), ("overlap",)),
    (("jaccard_bigram",), ("sorensen_dice_bigram",)),
    (("soundex",), ()),
    (
        (
            "jaccard_bigram",
            "sorensen_dice_bigram",
            "cosine",
            "overlap",
            "hamming",
            "lcs_seq",
            "indel",
            "osa",
            "soundex",
        ),
        (),
    ),
    # ALL 14 measures in one fused pass — the "compute everything" serving
    # mode. Current routing covers it with four pallas calls per bucket:
    # the shared-equality mega kernel (lev_d, jaro_m/t, inter, prefix),
    # the same-orientation DP kernel (osa_d, lcs_len), the bigram kernel
    # (inter2, ham_m, eq), and the soundex encoder.
    (
        (
            "levenshtein",
            "jaro",
            "jaro_winkler",
            "jaccard",
            "sorensen_dice",
            "jaccard_bigram",
            "sorensen_dice_bigram",
            "cosine",
            "overlap",
            "hamming",
            "lcs_seq",
            "indel",
            "osa",
            "soundex",
        ),
        (),
    ),
]


def main() -> None:
    from strsim_tpu.native import native_available, native_compute
    from strsim_tpu.utils import encode as enc

    col_a, col_b = bench.make_pairs(bench.N_PAIRS)
    a, b = enc.encode_pair(col_a, col_b)
    del col_a, col_b
    validity = a.validity & b.validity
    bench._log(f"ext bench: encoded {bench.N_PAIRS:,} pairs (width {a.width})")

    out = {
        "n_pairs": bench.N_PAIRS,
        "_meta": {
            "resident_pairs_per_sec": "device-resident kernel throughput, "
            "chunk-differenced (same methodology as BENCH_DETAILS.json)",
            "baseline_single_core_pairs_per_sec": "native C++ scalar kernel, "
            "one core, best of 3 on a 200K subset",
        },
        "measures": {},
    }
    for measures, aliases in SETS:
        key = "+".join(measures) if len(measures) > 1 else measures[0]
        entry = {}
        t0 = time.time()
        res = bench.measure_resident(a, b, measures)
        if res is None:
            continue
        resident, bucket_times, device_s = res
        entry["resident_pairs_per_sec"] = resident
        entry["resident_device_s_per_1M"] = round(device_s, 4)
        entry["resident_bucket_block_ms"] = bucket_times
        if len(measures) == 1 and native_available():
            base_dt = float("inf")
            for _ in range(3):
                t1 = time.perf_counter()
                native_compute(
                    measures[0],
                    a.codes[: bench.BASELINE_SUBSET],
                    a.lengths[: bench.BASELINE_SUBSET],
                    b.codes[: bench.BASELINE_SUBSET],
                    b.lengths[: bench.BASELINE_SUBSET],
                    validity[: bench.BASELINE_SUBSET],
                )
                base_dt = min(base_dt, time.perf_counter() - t1)
            entry["baseline_single_core_pairs_per_sec"] = (
                bench.BASELINE_SUBSET / base_dt
            )
            entry["resident_speedup_vs_single_core"] = resident / (
                bench.BASELINE_SUBSET / base_dt
            )
        for alias in aliases:
            out["measures"][alias] = {"same_kernel_as": key}
        out["measures"][key] = entry
        bench._log(
            f"ext bench[{key}]: resident {resident:,.0f} pairs/s "
            f"({time.time() - t0:.1f}s incl. compile)"
        )

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_EXTENSIONS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: round(v.get("resident_pairs_per_sec", 0)) for k, v in out["measures"].items() if "resident_pairs_per_sec" in v}))


if __name__ == "__main__":
    main()
