#!/usr/bin/env python
"""tpu-strsim benchmark harness.

Headline metric (BASELINE.md): levenshtein pairs/sec/chip on 1M name pairs
(len ≤ 64), device-resident (see BENCH_DETAILS.json `_meta` for the metric
definitions; the e2e-including-transfers figure is reported alongside), vs a
single-core native C++ baseline implementing the reference's scalar algorithms
(the local stand-in for single-core Rust — the reference publishes no numbers).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}
and writes BENCH_DETAILS.json with per-measure numbers and parity checks.

Robustness: each measure runs in a worker subprocess with a timeout + retry —
the TPU remote-compile tunnel can hang individual requests; the persistent XLA
compile cache makes retries incremental. Workers are serialized (one TPU
client at a time).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SEED = 20260816
N_PAIRS = 1_000_000
BASELINE_SUBSET = 200_000
WORKER_TIMEOUT_S = int(os.environ.get("STRSIM_BENCH_WORKER_TIMEOUT", "900"))
WORKER_RETRIES = 2

_T0 = time.time()


def _log(msg: str) -> None:
    if os.environ.get("STRSIM_BENCH_QUIET") != "1":
        print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


FIRST = [
    "john", "mary", "james", "patricia", "robert", "jennifer", "michael",
    "linda", "william", "elizabeth", "david", "barbara", "richard", "susan",
    "joseph", "jessica", "thomas", "sarah", "christopher", "karen",
]
LAST = [
    "phillips", "philips", "smith", "smyth", "johnson", "jonson", "williams",
    "brown", "jones", "garcia", "miller", "davis", "rodriguez", "martinez",
    "hernandez", "lopez", "gonzalez", "wilson", "anderson", "macdonald",
    "mcdonald", "featherstone", "featherston", "shackelford", "shackleford",
    "chamberlain", "chamberlin", "baumgardner", "bumgardner", "renkenberger",
]


def make_pairs(n: int, seed: int = SEED):
    """Genealogy-flavored name pairs, len ≤ 64: mostly short surnames, a tail
    of long multi-token names, some equal pairs, some empties/nulls.
    Fully vectorized (numpy U-dtype string ops) — the Python-loop version
    cost ~60 s per 5M rows and throttled the streaming benchmark's feed."""
    rng = np.random.default_rng(seed)
    first = rng.choice(FIRST, size=n)
    last = rng.choice(LAST, size=n)
    last2 = rng.choice(LAST, size=n)
    r = rng.random(n)
    sub = rng.integers(0, 26, size=n)

    # near-duplicate default: one substituted char in last2, vectorized via
    # the UCS4 view of a fixed-width U array
    w2 = int(np.char.str_len(last2).max())
    codes = np.ascontiguousarray(last2.astype(f"<U{w2}")).view(np.uint32).reshape(n, w2)
    lens2 = np.char.str_len(last2)
    pos = (r * 100).astype(np.int64) % lens2
    codes[np.arange(n), pos] = np.uint32(ord("a")) + sub.astype(np.uint32)
    subbed = codes.view(f"<U{w2}").ravel()

    is_long = r < 0.05
    is_equal = (r >= 0.05) & (r < 0.15)
    is_empty = (r >= 0.15) & (r < 0.17)

    col_b_u = subbed.copy()
    col_b_u[is_equal] = last[is_equal]  # widths match (both LAST picks)
    col_b_u[is_empty] = ""
    col_a_list = last.tolist()
    col_b_list = col_b_u.tolist()

    # long rows (full names, truncated to 64 like the original [:64]) —
    # built only on the ~5% subset to keep wide U64 temps small
    li = np.nonzero(is_long)[0]
    if li.size:
        sp = np.full(li.size, " ", dtype="<U1")
        f2 = first[(li * 7) % n]
        long_a = np.char.add(np.char.add(np.char.add(np.char.add(np.char.add(
            np.char.add(first[li], sp), last[li]), sp), last2[li]), sp), f2
        ).astype("<U64").tolist()
        long_b = np.char.add(np.char.add(np.char.add(np.char.add(
            first[li], sp), last2[li]), sp), last[li]).astype("<U64").tolist()
        for k, i in enumerate(li):
            col_a_list[i] = long_a[k]
            col_b_list[i] = long_b[k]

    col_a = np.empty(n, dtype=object)
    col_b = np.empty(n, dtype=object)
    col_a[:] = col_a_list
    col_b[:] = col_b_list
    null_idx = rng.choice(n, size=n // 200, replace=False)
    for i in null_idx[: len(null_idx) // 2]:
        col_a[i] = None
    for i in null_idx[len(null_idx) // 2 :]:
        col_b[i] = None
    return col_a, col_b


def make_wide_pairs(n: int, seed: int = SEED + 7):
    """Long-string pairs exercising the 95..511 bucket ladder tail (BASELINE
    config 4/5 promises bucketing to 512): lengths uniform over [48, 511],
    ASCII, with equal pairs, near-duplicates (one substitution + one adjacent
    swap), empties and nulls. Vectorized via the UCS4 view."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(48, 512, size=n)
    W = 511
    codes = rng.integers(97, 123, size=(n, W), dtype=np.uint32)
    pos = np.arange(W, dtype=np.int64)[None, :]
    codes[pos >= lens[:, None]] = 0
    col_a_u = codes.view(f"<U{W}").ravel()

    r = rng.random(n)
    codes_b = codes.copy()
    # near-duplicate default: one substituted char + one adjacent swap
    p1 = (rng.integers(0, 1 << 30, n)) % lens
    codes_b[np.arange(n), p1] = np.uint32(ord("a")) + rng.integers(0, 26, n).astype(np.uint32)
    p2 = (rng.integers(0, 1 << 30, n)) % np.maximum(lens - 1, 1)
    i_all = np.arange(n)
    t = codes_b[i_all, p2].copy()
    codes_b[i_all, p2] = codes_b[i_all, p2 + 1]
    codes_b[i_all, p2 + 1] = t
    col_b_u = codes_b.view(f"<U{W}").ravel()

    col_a = col_a_u.astype(object)
    col_b = col_b_u.astype(object)
    is_equal = (r >= 0.05) & (r < 0.15)
    col_b[is_equal] = col_a[is_equal]
    is_empty = (r >= 0.15) & (r < 0.16)
    col_b[is_empty] = ""
    null_idx = rng.choice(n, size=max(n // 200, 2), replace=False)
    for i in null_idx[: len(null_idx) // 2]:
        col_a[i] = None
    for i in null_idx[len(null_idx) // 2 :]:
        col_b[i] = None
    return col_a, col_b


def measure_resident(a, b, measures):
    """Device-resident kernel throughput (pairs/sec/chip), measured so that
    the relay tunnel cannot distort it: per bucket, the real workload's
    blocks are staged on device as [C, block, 2W] chunks and the MARGINAL
    on-device time per block is measured inside a single executable
    (utils/devicetime.py — repetition loop with a data-dependent carry,
    differenced across repetition counts so dispatch/fetch/relay fixed costs
    cancel). Total device time = sum over buckets of t_block * n_blocks.
    Host<->device transfer is benchmarked separately in the e2e figure (and
    is relay-tunnel-bound in this environment, not chip-bound)."""
    import jax.numpy as jnp

    from strsim_tpu.config import get_config
    from strsim_tpu.models import pipeline as pp
    from strsim_tpu.utils import encode as enc
    from strsim_tpu.utils.devicetime import marginal_block_time

    cfg = get_config()
    validity = a.validity & b.validity
    la = np.where(validity, a.lengths, 0).astype(np.int32)
    lb = np.where(validity, b.lengths, 0).astype(np.int32)
    work = validity & (la > 0) & (lb > 0)
    idx = np.nonzero(work)[0]
    maxlen = np.maximum(la[idx], lb[idx])
    uniq = np.unique(maxlen)
    uniq_bucket = np.array([cfg.bucket_for(int(v)) for v in uniq], dtype=np.int64)
    bucket_of = uniq_bucket[np.searchsorted(uniq, maxlen)]

    n_rows = 0
    device_s = 0.0
    bucket_times = {}
    for w in np.unique(bucket_of):
        if w < 0:
            continue
        width = int(w)
        sel = idx[bucket_of == w]
        sel = sel[np.argsort(la[sel].astype(np.int64) + lb[sel], kind="stable")]
        dtype = np.int8 if cfg.narrow_tiles else np.int32
        block = min(
            pp._block_rows(width, cfg, measures, dtype),
            pp._round_batch(sel.size, cfg),
        )
        n_pad = ((sel.size + block - 1) // block) * block
        w_have = min(width, a.codes.shape[1])
        from strsim_tpu.utils.alloc import fast_empty

        packed = fast_empty((n_pad, 2 * width), dtype)
        packed[:, :width] = enc.PAD_A
        packed[:, width:] = enc.PAD_B
        packed[: sel.size, :w_have] = a.codes[sel, :w_have]
        packed[: sel.size, width : width + w_have] = b.codes[sel, :w_have]
        lens = np.zeros((n_pad, 2), dtype=np.int32)
        lens[: sel.size, 0] = la[sel]
        lens[: sel.size, 1] = lb[sel]
        C = n_pad // block
        base = pp._get_kernel(measures, pp._impls_for(cfg, width, dtype))
        dev_codes = jnp.asarray(packed.reshape(C, block, 2 * width))
        dev_lens = jnp.asarray(lens.reshape(C, block, 2))
        t_block = marginal_block_time(base, dev_codes, dev_lens)
        bucket_times[width] = {
            "blocks": C,
            "block_ms": round(t_block * 1e3, 4),
            "block_rows": block,
            "rows": int(sel.size),
            "itemsize": int(np.dtype(dtype).itemsize),
        }
        device_s += t_block * C
        n_rows += sel.size

    if not n_rows:
        return None
    return n_rows / device_s, bucket_times, device_s


def worker(measures_csv: str, out_path: str) -> None:
    """Benchmark one measure set end-to-end; write a JSON result file."""
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.native import native_compute, native_available

    measures = tuple(measures_csv.split(","))
    col_a, col_b = make_pairs(N_PAIRS)  # generation excluded from encode timing
    t_enc = time.perf_counter()
    from strsim_tpu.utils import encode as enc

    a, b = enc.encode_pair(col_a, col_b)
    encode_s = time.perf_counter() - t_enc
    del col_a, col_b
    validity = a.validity & b.validity
    _log(
        f"worker[{measures_csv}]: encoded {N_PAIRS:,} pairs "
        f"(width {a.width}, {encode_s:.2f}s, dtype {a.codes.dtype})"
    )

    result = {"measures": measures_csv, "n_pairs": N_PAIRS, "encode_s": round(encode_s, 3)}

    if len(measures) == 1 and native_available():
        # best of 3: the single-core baseline must reflect the machine's
        # uncontended speed (transient background load would otherwise
        # INFLATE the reported speedup)
        base_dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            base_out = native_compute(
                measures[0],
                a.codes[:BASELINE_SUBSET],
                a.lengths[:BASELINE_SUBSET],
                b.codes[:BASELINE_SUBSET],
                b.lengths[:BASELINE_SUBSET],
                validity[:BASELINE_SUBSET],
            )
            base_dt = min(base_dt, time.perf_counter() - t0)
        result["baseline_single_core_pairs_per_sec"] = BASELINE_SUBSET / base_dt
        _log(f"worker[{measures_csv}]: native {BASELINE_SUBSET / base_dt:,.0f} pairs/s (best of 3)")

    # warm-up: compile the full-size (bucket, block) shapes on a big slice —
    # one shape per bucket width, matching the timed run exactly
    t0 = time.perf_counter()
    compute_scores(a.slice(0, 400_000), b.slice(0, 400_000), measures)
    _log(f"worker[{measures_csv}]: warm done ({time.perf_counter() - t0:.1f}s)")

    from strsim_tpu.utils.metrics import RunMetrics

    metrics = RunMetrics()
    t0 = time.perf_counter()
    res = compute_scores(a, b, measures, metrics=metrics)
    dt = time.perf_counter() - t0
    result["tpu_pairs_per_sec"] = N_PAIRS / dt
    result["tpu_wall_s"] = dt
    result["phases"] = {
        "classify_s": round(metrics.classify_wall_s, 3),
        "device_s": round(metrics.device_wall_s, 3),
        "finalize_s": round(metrics.finalize_wall_s, 3),
    }
    result["buckets"] = {
        str(w): {
            "rows": bm.rows,
            "device_calls": bm.device_calls,
            "device_s": round(bm.device_wall_s, 3),
            "padding_waste": round(bm.padding_waste, 3),
        }
        for w, bm in metrics.buckets.items()
    }
    _log(f"worker[{measures_csv}]: tpu {N_PAIRS / dt:,.0f} pairs/s ({dt:.2f}s) phases={result['phases']}")

    res_tuple = measure_resident(a, b, measures)
    resident = None
    if res_tuple is not None:
        resident, bucket_times, device_s = res_tuple
        result["resident_pairs_per_sec"] = resident
        result["resident_bucket_block_ms"] = bucket_times
        result["resident_device_s_per_1M"] = round(device_s, 4)
        _log(
            f"worker[{measures_csv}]: resident {resident:,.0f} pairs/s "
            f"(device {device_s * 1e3:.1f} ms/1M; per-bucket {bucket_times})"
        )

    # per-kernel speed-of-light accounting (north star: roofline per kernel),
    # from the RESIDENT chunk-differenced timing — the only device time the
    # relay cannot distort — against the measured CALIBRATION.json envelope
    try:
        from strsim_tpu.ops.roofline import roofline_report

        kernel_name = {
            "levenshtein": "levenshtein",
            "jaro": "jaro",
            "jaro_winkler": "jaro",
            "jaccard": "multiset",
            "sorensen_dice": "multiset",
        }.get(measures[0])
        if kernel_name and len(measures) == 1 and res_tuple is not None:
            dominant_w = max(bucket_times, key=lambda w: bucket_times[w]["rows"])
            bt = bucket_times[dominant_w]
            result["roofline_dominant_bucket"] = roofline_report(
                kernel_name,
                bt["blocks"] * bt["block_rows"],
                dominant_w,
                max(bt["blocks"] * bt["block_ms"] / 1e3, 1e-9),
                itemsize=bt["itemsize"],
            )
    except Exception:
        pass

    if len(measures) == 1 and "baseline_single_core_pairs_per_sec" in result:
        values, _ = res[measures[0]]
        parity = values[:BASELINE_SUBSET].tobytes() == base_out.tobytes()
        result["bit_exact_parity"] = bool(parity)
        result["speedup_vs_single_core"] = (
            result["tpu_pairs_per_sec"] / result["baseline_single_core_pairs_per_sec"]
        )
        if resident is not None:
            result["resident_speedup_vs_single_core"] = (
                resident / result["baseline_single_core_pairs_per_sec"]
            )

    with open(out_path, "w") as f:
        json.dump(result, f)


N_WIDE_PAIRS = 200_000
WIDE_BASELINE_SUBSET = 20_000


def worker_wide(measures_csv: str, out_path: str) -> None:
    """Wide-ladder benchmark (buckets 63..511): device-resident per-bucket
    block times on a long-string workload (lengths 48..511), single-core
    native baseline, bit-exact parity on a subset — the measured coverage of
    the ladder tail that the len<=64 headline workload never touches."""
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.native import native_compute, native_available
    from strsim_tpu.utils import encode as enc

    measures = tuple(measures_csv.split(","))
    col_a, col_b = make_wide_pairs(N_WIDE_PAIRS)
    a, b = enc.encode_pair(col_a, col_b)
    del col_a, col_b
    validity = a.validity & b.validity
    _log(f"wide[{measures_csv}]: encoded {N_WIDE_PAIRS:,} pairs (width {a.width}, dtype {a.codes.dtype})")

    result = {"measures": measures_csv, "n_pairs": N_WIDE_PAIRS,
              "workload": "lengths 48..511 uniform (make_wide_pairs)"}
    if len(measures) == 1 and native_available():
        base_dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            base_out = native_compute(
                measures[0],
                a.codes[:WIDE_BASELINE_SUBSET], a.lengths[:WIDE_BASELINE_SUBSET],
                b.codes[:WIDE_BASELINE_SUBSET], b.lengths[:WIDE_BASELINE_SUBSET],
                validity[:WIDE_BASELINE_SUBSET],
            )
            base_dt = min(base_dt, time.perf_counter() - t0)
        result["baseline_single_core_pairs_per_sec"] = WIDE_BASELINE_SUBSET / base_dt
        _log(f"wide[{measures_csv}]: native {WIDE_BASELINE_SUBSET / base_dt:,.0f} pairs/s")

    res_tuple = measure_resident(a, b, measures)
    if res_tuple is not None:
        resident, bucket_times, device_s = res_tuple
        result["resident_pairs_per_sec"] = resident
        result["resident_bucket_block_ms"] = bucket_times
        result["resident_device_s"] = round(device_s, 4)
        # per-pair ns per bucket + adjacent-bucket discontinuity ratios
        # (VERDICT r2 item 2: no >2x per-pair cliff between adjacent buckets)
        per_pair = {
            w: bt["block_ms"] * 1e6 / bt["block_rows"]
            for w, bt in bucket_times.items()
        }
        result["per_pair_ns"] = {str(w): round(v, 3) for w, v in per_pair.items()}
        ws = sorted(per_pair)
        result["adjacent_per_pair_ratio"] = {
            f"{w0}->{w1}": round(per_pair[w1] / per_pair[w0], 2)
            for w0, w1 in zip(ws, ws[1:])
        }
        if "baseline_single_core_pairs_per_sec" in result:
            result["resident_speedup_vs_single_core"] = (
                resident / result["baseline_single_core_pairs_per_sec"]
            )
        _log(f"wide[{measures_csv}]: resident {resident:,.0f} pairs/s; per-pair {result['per_pair_ns']}")

    if len(measures) == 1 and "baseline_single_core_pairs_per_sec" in result:
        res = compute_scores(a.slice(0, WIDE_BASELINE_SUBSET),
                             b.slice(0, WIDE_BASELINE_SUBSET), measures)
        values, _ = res[measures[0]]
        result["bit_exact_parity"] = bool(values.tobytes() == base_out.tobytes())
        _log(f"wide[{measures_csv}]: parity={result['bit_exact_parity']}")

    with open(out_path, "w") as f:
        json.dump(result, f)


def run_worker_with_retry(measures_csv: str, out_path: str, mode: str = "--worker",
                          timeout_s: int | None = None):
    timeout_s = timeout_s or WORKER_TIMEOUT_S
    for attempt in range(WORKER_RETRIES + 1):
        try:
            if os.path.exists(out_path):
                os.unlink(out_path)
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), mode, measures_csv, out_path],
                timeout=timeout_s,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            if proc.returncode == 0 and os.path.exists(out_path):
                with open(out_path) as f:
                    return json.load(f)
            _log(f"worker[{measures_csv}] attempt {attempt}: rc={proc.returncode}")
        except subprocess.TimeoutExpired:
            _log(f"worker[{measures_csv}] attempt {attempt}: timeout after {timeout_s}s")
    return None


ALL_MEASURES = ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice")


def _print_headline(headline) -> None:
    if headline is None:
        print(json.dumps({
            "metric": "levenshtein_pairs_per_sec_per_chip_1M_len64",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": "benchmark worker failed/hung (TPU tunnel)",
        }), flush=True)
        return
    # Headline: device-resident kernel throughput (pairs/sec/chip). The e2e
    # figure including host<->device transfer sits in BENCH_DETAILS.json —
    # in this environment transfers ride a ~30 MB/s relay tunnel, which is an
    # artifact of the test harness, not of the chip or the engine.
    value = headline.get("resident_pairs_per_sec", headline["tpu_pairs_per_sec"])
    vs = headline.get(
        "resident_speedup_vs_single_core",
        headline.get("speedup_vs_single_core", 0.0),
    )
    print(json.dumps({
        "metric": "levenshtein_pairs_per_sec_per_chip_1M_len64",
        "value": round(value, 1),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 2),
    }), flush=True)


def main():
    details = {
        "n_pairs": N_PAIRS,
        "_meta": {
            "workload": "1M synthetic genealogy name pairs, len<=64, incl. "
                        "equal pairs, empties and nulls (make_pairs)",
            "resident_pairs_per_sec": "device-resident kernel throughput "
                "(pairs/sec/chip): the real workload's bucket blocks staged "
                "on device, marginal on-device time per block measured inside "
                "one executable (repetition loop with data-dependent carry, "
                "differenced across repetition counts — relay dispatch/fetch "
                "fixed costs cancel; utils/devicetime.py)",
            "tpu_pairs_per_sec": "end-to-end including host<->device transfer; "
                "in this harness transfers ride a ~30 MB/s relay tunnel "
                "(~500x below PCIe), so this measures the tunnel, not the chip",
            "baseline_single_core_pairs_per_sec": "native C++ implementation "
                "of the reference's algorithms (strict IEEE, -ffp-contract=off), "
                "one thread — the local stand-in for single-core Rust",
            "bit_exact_parity": "TPU scores byte-identical to the baseline's "
                "f64 scores on a 200k-row subset",
        },
        "measures": {},
    }
    # headline measure first; print the JSON line immediately so an external
    # timeout on the whole benchmark cannot lose it
    headline = run_worker_with_retry("levenshtein", "/tmp/strsim_bench_levenshtein.json")
    _print_headline(headline)
    if headline is not None:
        details["measures"]["levenshtein"] = headline

    for measure in ALL_MEASURES:
        if measure == "levenshtein":
            continue
        r = run_worker_with_retry(measure, f"/tmp/strsim_bench_{measure}.json")
        if r is not None:
            details["measures"][measure] = r
    fused = run_worker_with_retry(",".join(ALL_MEASURES), "/tmp/strsim_bench_fused.json")
    if fused is not None:
        details["fused"] = fused

    # wide-ladder coverage (buckets 63..511, lengths 48..511): the headline
    # workload is len<=64 by definition (BASELINE.md), so the ladder tail
    # gets its own measured section
    details["wide_buckets"] = {}
    for measure in ("levenshtein", "jaro_winkler", "jaccard", "osa"):
        r = run_worker_with_retry(
            measure, f"/tmp/strsim_bench_wide_{measure}.json",
            mode="--worker-wide", timeout_s=2 * WORKER_TIMEOUT_S,
        )
        if r is not None:
            details["wide_buckets"][measure] = r

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"), "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--worker":
        worker(sys.argv[2], sys.argv[3])
    elif len(sys.argv) >= 4 and sys.argv[1] == "--worker-wide":
        worker_wide(sys.argv[2], sys.argv[3])
    else:
        main()
