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

Robustness contract (the whole run must fit a driver `timeout` and survive a
kill at ANY point):
  * Single process. On remote-compile TPU backends (this environment's axon
    tunnel, PALLAS_AXON_REMOTE_COMPILE=1) every python process pays a one-time
    terminal-side Mosaic init at its first Pallas execution — measured 65-600s
    regardless of kernel size, while every subsequent executable compiles in
    0.4-10s. The round-3 harness ran one subprocess per measure and paid that
    init ~10x (BENCH_r03.json rc=124); one process pays it once.
  * BENCH_DETAILS.json is rewritten atomically after EVERY section — a kill
    loses at most the section in flight, never completed measurements.
  * The headline JSON line prints as soon as the levenshtein section
    completes (kill-resilience), and the SAME line is re-printed unguarded as
    the process's literal last output in every exit path (normal return,
    exception, atexit, pre-os._exit) — last-line-wins for the driver's
    parser. Rounds 1/2/4 shipped `parsed: null` because later stderr progress
    buried the single early print.
  * A global deadline (env STRSIM_BENCH_DEADLINE_S, default 1380s) gates every
    section: when the remaining budget can no longer fit a section, remaining
    sections are skipped gracefully and the run exits 0 with whatever is
    measured. Section order is five-measures-first, then fused, then the wide
    ladder.
  * Each device-touching step runs under a watchdog (compile_guard.
    run_with_timeout): a wedged tunnel request skips the step instead of
    hanging the run.
"""
from __future__ import annotations

import atexit
import json
import os
import sys
import threading
import time

import numpy as np

SEED = 20260816
N_PAIRS = int(os.environ.get("STRSIM_BENCH_N_PAIRS", "1000000"))
BASELINE_SUBSET = min(200_000, N_PAIRS)
DEADLINE_S = float(os.environ.get("STRSIM_BENCH_DEADLINE_S", "1380"))
# don't start a measure section with less than this budget left: a section is
# ~10-40s warm (post-init) + ~10s timed + ~20-60s resident measurement
SECTION_MIN_S = float(os.environ.get("STRSIM_BENCH_SECTION_MIN_S", "120"))

_T0 = time.time()


def _remaining() -> float:
    return DEADLINE_S - (time.time() - _T0)


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


def measure_resident(a, b, measures, prewarm_only: bool = False):
    """Device-resident kernel throughput (pairs/sec/chip), measured so that
    the relay tunnel cannot distort it: per bucket, the real workload's
    blocks are staged on device as [C, block, 2W] chunks and the MARGINAL
    on-device time per block is measured inside a single executable
    (utils/devicetime.py — counter-indexed loop over the staged chunks with a
    data-dependent carry, differenced across trip counts so dispatch/fetch/
    relay fixed costs cancel). Total device time = sum over buckets of
    t_block * n_blocks. Host<->device transfer is benchmarked separately in
    the e2e figure (and is relay-tunnel-bound in this environment, not
    chip-bound)."""
    import jax.numpy as jnp

    from strsim_tpu.config import get_config
    from strsim_tpu.models import pipeline as pp
    from strsim_tpu.utils import encode as enc
    from strsim_tpu.utils.devicetime import marginal_block_time, prewarm_runner

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
        if prewarm_only:
            # compile + first-exec the runner for this exact (kernel, [C, B,
            # 2W]) shape; the later measuring pass hits the compiled
            # executable (the runner cache keys on the kernel object, which
            # pipeline._kernel_cache keeps stable within the process)
            prewarm_runner(base, dev_codes, dev_lens)
            continue
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


ALL_MEASURES = ("levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice")

_DETAILS_PATH = os.environ.get(
    "STRSIM_BENCH_DETAILS_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"),
)


def _flush(details) -> None:
    """Atomic incremental write: a driver kill at any point leaves the last
    completed section's results on disk (round-3 lesson — one final write at
    the end lost every measure the timeout swallowed)."""
    tmp = _DETAILS_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(details, f, indent=2)
    os.replace(tmp, _DETAILS_PATH)


_headline_state = {"payload": None, "early_printed": False}


def _headline_payload(headline) -> dict:
    if headline is None:
        return {
            "metric": "levenshtein_pairs_per_sec_per_chip_1M_len64",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": "levenshtein section did not complete (TPU tunnel)",
        }
    # Headline: device-resident kernel throughput (pairs/sec/chip). The e2e
    # figure including host<->device transfer sits in BENCH_DETAILS.json —
    # in this environment transfers ride a ~30 MB/s relay tunnel, which is an
    # artifact of the test harness, not of the chip or the engine.
    value = headline.get("resident_pairs_per_sec", headline.get("tpu_pairs_per_sec", 0.0))
    vs = headline.get(
        "resident_speedup_vs_single_core",
        headline.get("speedup_vs_single_core", 0.0),
    )
    return {
        "metric": "levenshtein_pairs_per_sec_per_chip_1M_len64",
        "value": round(value, 1),
        "unit": "pairs/s",
        "vs_baseline": round(vs, 2),
    }


def _print_headline(headline) -> None:
    """Early, once-only headline print (kill-resilience: if the driver kills
    the process mid-run, the number from the levenshtein section is already on
    stdout). The FINAL print is `_print_headline_final` — unguarded, re-prints
    the same JSON as the process's literal last line in every exit path
    (rounds 1/2/4 shipped `parsed: null` because ~20 min of later stderr
    buried this early line; last-line-wins for any tail parser)."""
    if headline is not None and _headline_state["payload"] is None:
        _headline_state["payload"] = _headline_payload(headline)
    if _headline_state["early_printed"]:
        return
    _headline_state["early_printed"] = True
    print(json.dumps(_headline_payload(headline)), flush=True)


def _print_headline_final() -> None:
    """Re-print the headline JSON unguarded — call as the last output of every
    exit path so the headline is always the final line on stdout."""
    payload = _headline_state["payload"] or _headline_payload(None)
    print(json.dumps(payload), flush=True)


def _encode_section(details) -> dict:
    """Host-encode throughput, pass-by-pass budget, and the projected
    UNTUNNELED end-to-end rate. SURVEY §7 hard-part #4: on real (non-relay)
    hardware the host encode — not the chip — is the e2e ceiling (the device
    finishes 1M pairs in ~0.8 ms), so it gets its own measured budget.
    Host-only: no device traffic, runs in ~3 s."""
    from strsim_tpu.utils import encode as enc

    col_a, col_b = make_pairs(N_PAIRS)  # same seed → identical columns
    n = len(col_a)
    out = {"n_pairs": n}
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a, b = enc.encode_pair(col_a, col_b)
        best = min(best, time.perf_counter() - t0)
    out["encode_pair_s"] = round(best, 4)
    out["encode_pairs_per_sec"] = round(n / best, 1)
    out["tile"] = {"width": a.width, "dtype": str(a.codes.dtype),
                   "bytes_per_column": a.codes.nbytes}
    # pass breakdown of the joint native path (list ob_item → scan → encode)
    try:
        from strsim_tpu.native import binding as nb
        from strsim_tpu.utils.alloc import fast_empty

        if nb.get_lib() is not None:
            ca = enc._column_objects(col_a)
            cb = enc._column_objects(col_b)
            t0 = time.perf_counter()
            sa = nb.scan_object_ptr(ca[0], ca[1])
            sb = nb.scan_object_ptr(cb[0], cb[1])
            scan_s = time.perf_counter() - t0
            w = max(sa[0], sb[0], 1)
            dtype = np.int8 if (sa[1] and sb[1]) else np.int32
            t0 = time.perf_counter()
            codes_a = fast_empty((ca[1], w), dtype, populate=False)
            nb.encode_object_ptr(ca[0], ca[1], w, enc.PAD_A, codes_a)
            codes_b = fast_empty((cb[1], w), dtype, populate=False)
            nb.encode_object_ptr(cb[0], cb[1], w, enc.PAD_B, codes_b)
            alloc_encode_s = time.perf_counter() - t0
            out["passes"] = {
                "scan_s": round(scan_s, 4),
                "alloc_encode_s": round(alloc_encode_s, 4),
                "list_obitem_route": type(ca[2]) is list,
            }
    except Exception as e:  # noqa: BLE001 — breakdown is diagnostic, not load-bearing
        out["passes_error"] = repr(e)

    # Projected untunneled e2e: measured encode + modeled PCIe-class staging
    # + measured resident device time. Stated model: 10 GB/s effective
    # host->device (PCIe gen3 x16 is 16 GB/s raw; TPU hosts sustain 10+),
    # scores (8B f64/pair) returned at the same rate, serially.
    lev = details.get("measures", {}).get("levenshtein", {})
    dev_s_1m = lev.get("resident_device_s_per_1M")
    if dev_s_1m is not None:
        pcie_gbps = 10.0
        staged = (a.codes.nbytes + b.codes.nbytes
                  + a.lengths.nbytes + b.lengths.nbytes + 8 * n)
        staging_s = staged / (pcie_gbps * 1e9)
        device_s = dev_s_1m * (n / 1e6)
        # measured host phases from the real 1M single-measure run (valid
        # untunneled — they never touch the relay): row classification and
        # the exact-f64 finalize+scatter (threaded C++ when available)
        phases = lev.get("phases", {})
        classify_s = float(phases.get("classify_s", 0.0))
        finalize_s = float(phases.get("finalize_s", 0.0))
        serial = best + classify_s + staging_s + device_s + finalize_s
        out["projected_untunneled_e2e"] = {
            "model": ("encode+classify+finalize(measured host) + "
                      "staging(modeled 10 GB/s) + device(measured resident)"),
            "staged_bytes": staged,
            "staging_s": round(staging_s, 4),
            "device_s": round(device_s, 4),
            "classify_s": round(classify_s, 4),
            "finalize_s": round(finalize_s, 4),
            "serial_pairs_per_sec": round(n / serial, 1),
            "pipelined_pairs_per_sec": round(
                n / max(best, classify_s, staging_s, device_s, finalize_s), 1),
        }
        details["_meta"]["projected_e2e_pairs_per_sec"] = (
            out["projected_untunneled_e2e"]["pipelined_pairs_per_sec"])
    return out


def _watchdog(step_name: str, fn, timeout_s: float):
    """Run a device-touching step with a hang watchdog. Returns (ok, result);
    on timeout the step keeps running detached (device calls cannot be
    cancelled mid-flight) and the section is abandoned."""
    from strsim_tpu.utils.compile_guard import run_with_timeout

    ok, res = run_with_timeout(fn, max(timeout_s, 1.0))
    if not ok:
        _log(f"WATCHDOG: {step_name} exceeded {timeout_s:.0f}s — skipping")
    return ok, res


def _native_baseline(measure: str, a, b, validity, subset: int, reps: int = 3):
    """Single-core native C++ baseline (best of `reps`: the baseline must
    reflect the machine's uncontended speed — transient background load would
    otherwise INFLATE the reported speedup). Returns (pairs_per_sec, scores)."""
    from strsim_tpu.native import native_compute, native_available

    if not native_available():
        return None, None
    base_dt = float("inf")
    base_out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        base_out = native_compute(
            measure,
            a.codes[:subset], a.lengths[:subset],
            b.codes[:subset], b.lengths[:subset],
            validity[:subset],
        )
        base_dt = min(base_dt, time.perf_counter() - t0)
    return subset / base_dt, base_out


def _measure_section(measures_csv: str, a, b, validity, baseline) -> dict | None:
    """Benchmark one measure set end-to-end, in-process. `baseline` is
    (pairs_per_sec, scores) from _native_baseline, or (None, None)."""
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.utils.metrics import RunMetrics

    measures = tuple(measures_csv.split(","))
    result = {"measures": measures_csv, "n_pairs": a.n}
    base_pps, base_out = baseline
    if base_pps is not None:
        result["baseline_single_core_pairs_per_sec"] = base_pps

    # warm: one full untimed pass over the SAME inputs the timed pass uses —
    # identical bucket/block/dtype decisions by construction, so the timed run
    # compiles nothing (round-3's 400k-slice warm could pick different block
    # shapes than the 1M run)
    t0 = time.perf_counter()
    ok, _ = _watchdog(
        f"warm[{measures_csv}]",
        lambda: compute_scores(a, b, measures),
        min(max(_remaining() - 60.0, 30.0), 900.0),
    )
    warm_s = time.perf_counter() - t0
    result["warm_s"] = round(warm_s, 1)
    _log(f"worker[{measures_csv}]: warm done ({warm_s:.1f}s)")
    if not ok:
        return None

    metrics = RunMetrics()
    t0 = time.perf_counter()
    ok, res = _watchdog(
        f"timed[{measures_csv}]",
        lambda: compute_scores(a, b, measures, metrics=metrics),
        min(max(_remaining() - 30.0, 30.0), 300.0),
    )
    if not ok:
        return None
    dt = time.perf_counter() - t0
    result["tpu_pairs_per_sec"] = a.n / dt
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
    _log(f"worker[{measures_csv}]: tpu {a.n / dt:,.0f} pairs/s ({dt:.2f}s) phases={result['phases']}")

    ok, res_tuple = _watchdog(
        f"resident[{measures_csv}]",
        lambda: measure_resident(a, b, measures),
        min(max(_remaining() - 20.0, 30.0), 400.0),
    )
    resident = None
    if ok and res_tuple is not None:
        resident, bucket_times, device_s = res_tuple
        result["resident_pairs_per_sec"] = resident
        result["resident_bucket_block_ms"] = bucket_times
        result["resident_device_s_per_1M"] = round(device_s, 4)
        _log(
            f"worker[{measures_csv}]: resident {resident:,.0f} pairs/s "
            f"(device {device_s * 1e3:.1f} ms/1M; per-bucket {bucket_times})"
        )

        # per-kernel speed-of-light accounting (north star: roofline per
        # kernel), from the RESIDENT chunk-differenced timing — the only
        # device time the relay cannot distort — against the measured
        # CALIBRATION.json envelope
        try:
            from strsim_tpu.ops.roofline import roofline_report

            kernel_name = {
                "levenshtein": "levenshtein",
                "jaro": "jaro",
                "jaro_winkler": "jaro",
                "jaccard": "multiset",
                "sorensen_dice": "multiset",
            }.get(measures[0])
            if kernel_name and len(measures) == 1:
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

    if len(measures) == 1 and base_out is not None and res is not None:
        values, _ = res[measures[0]]
        parity = values[:BASELINE_SUBSET].tobytes() == base_out.tobytes()
        result["bit_exact_parity"] = bool(parity)
        result["speedup_vs_single_core"] = result["tpu_pairs_per_sec"] / base_pps
        if resident is not None:
            result["resident_speedup_vs_single_core"] = resident / base_pps
    return result


N_WIDE_PAIRS = int(os.environ.get("STRSIM_BENCH_N_WIDE", "200000"))
WIDE_BASELINE_SUBSET = min(20_000, N_WIDE_PAIRS)


def _wide_section(measures_csv: str, a, b, validity) -> dict | None:
    """Wide-ladder benchmark (buckets 63..511): device-resident per-bucket
    block times on a long-string workload (lengths 48..511), single-core
    native baseline, bit-exact parity on a subset — the measured coverage of
    the ladder tail that the len<=64 headline workload never touches."""
    from strsim_tpu.models.pipeline import compute_scores

    measures = tuple(measures_csv.split(","))
    result = {"measures": measures_csv, "n_pairs": a.n,
              "workload": "lengths 48..511 uniform (make_wide_pairs)"}
    base_pps, base_out = _native_baseline(
        measures[0], a, b, validity, WIDE_BASELINE_SUBSET, reps=2
    ) if len(measures) == 1 else (None, None)
    if base_pps is not None:
        result["baseline_single_core_pairs_per_sec"] = base_pps
        _log(f"wide[{measures_csv}]: native {base_pps:,.0f} pairs/s")

    ok, res_tuple = _watchdog(
        f"wide-resident[{measures_csv}]",
        lambda: measure_resident(a, b, measures),
        min(max(_remaining() - 20.0, 30.0), 600.0),
    )
    if not ok:
        return None
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
        if base_pps is not None:
            result["resident_speedup_vs_single_core"] = resident / base_pps
        _log(f"wide[{measures_csv}]: resident {resident:,.0f} pairs/s; per-pair {result['per_pair_ns']}")

    if base_out is not None and _remaining() > 60:
        ok, res = _watchdog(
            f"wide-parity[{measures_csv}]",
            lambda: compute_scores(
                a.slice(0, WIDE_BASELINE_SUBSET), b.slice(0, WIDE_BASELINE_SUBSET), measures
            ),
            min(max(_remaining() - 10.0, 30.0), 300.0),
        )
        if ok:
            values, _ = res[measures[0]]
            result["bit_exact_parity"] = bool(values.tobytes() == base_out.tobytes())
            _log(f"wide[{measures_csv}]: parity={result['bit_exact_parity']}")
    return result


def _prewarm_all(a, b, measure_sets, budget_s: float, compute_rows=None) -> dict:
    """Compile + first-exec every pipeline kernel and timing runner the given
    sections will use, CONCURRENTLY (daemon threads): on remote-compile
    backends each new executable pays a terminal-side compile at first
    execution, and those compiles overlap server-side (measured ~2x for two
    concurrent kernels), so warming all sections up front costs roughly the
    slowest section, not the sum. The later measurement phase then runs with
    a quiesced device — no stray first-exec can pollute the differenced
    timings. A section whose prewarm outruns `budget_s` keeps compiling in
    the background (daemon) and its own section-level watchdog decides."""
    from strsim_tpu.models.pipeline import compute_scores

    done: dict = {}
    # cap concurrent prewarms: try2 of round 4 showed that racing 6 compile
    # streams against the one-time Mosaic init can starve the init itself
    # (22 min, never completed); 3 concurrent sections measured fine post-init
    gate = threading.Semaphore(3)

    def one(mcsv: str) -> None:
        try:
            measures = tuple(mcsv.split(","))
            t0 = time.perf_counter()
            with gate:
                if compute_rows:
                    compute_scores(a.slice(0, compute_rows), b.slice(0, compute_rows), measures)
                else:
                    compute_scores(a, b, measures)
                measure_resident(a, b, measures, prewarm_only=True)
            done[mcsv] = round(time.perf_counter() - t0, 1)
            _log(f"prewarm[{mcsv}] done ({done[mcsv]}s)")
        except Exception as e:  # noqa: BLE001 — the section watchdog decides later
            _log(f"prewarm[{mcsv}] FAILED: {e!r}")
            done[mcsv] = None

    threads = [
        threading.Thread(target=one, args=(m,), daemon=True) for m in measure_sets
    ]
    for t in threads:
        t.start()
    end = time.time() + max(budget_s, 30.0)
    for t in threads:
        t.join(max(end - time.time(), 0.0))
    pending = [m for m in measure_sets if m not in done]
    if pending:
        _log(f"prewarm budget ({budget_s:.0f}s) exhausted; still compiling: {pending}")
    return done


def _mosaic_init_warm(out: dict) -> None:
    """Absorb the one-time terminal-side Mosaic init (65-600s measured on the
    axon remote-compile tunnel, independent of kernel size) on a trivial
    Pallas kernel, started at t=0 so it overlaps pair generation, encoding
    and the native baselines."""
    try:
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl

        if jax.default_backend() != "tpu":
            out["mosaic_init_s"] = 0.0
            return

        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2 + 1

        @jax.jit
        def f(x):
            return pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32)
            )(x)

        t0 = time.perf_counter()
        np.asarray(f(jnp.ones((8, 128), jnp.int32)))
        out["mosaic_init_s"] = round(time.perf_counter() - t0, 1)
        _log(f"mosaic init done ({out['mosaic_init_s']}s)")
    except Exception as e:  # noqa: BLE001 — init failure surfaces in _meta
        out["mosaic_init_error"] = repr(e)


def main():
    if os.environ.get("STRSIM_FORCE_CPU") == "1":
        # harness smoke mode (CI / tunnel-down debugging): same flow, CPU
        # backend, no TPU numbers — combine with STRSIM_BENCH_N_PAIRS
        import jax

        jax.config.update("jax_platforms", "cpu")
    details = {
        "n_pairs": N_PAIRS,
        "_meta": {
            "workload": "1M synthetic genealogy name pairs, len<=64, incl. "
                        "equal pairs, empties and nulls (make_pairs)",
            "harness": "single process (one Mosaic init), incremental "
                       "BENCH_DETAILS writes after every section, global "
                       f"deadline {DEADLINE_S:.0f}s "
                       "(STRSIM_BENCH_DEADLINE_S), per-step hang watchdogs",
            "resident_pairs_per_sec": "device-resident kernel throughput "
                "(pairs/sec/chip): the real workload's bucket blocks staged "
                "on device, marginal on-device time per block measured inside "
                "one executable (counter-indexed loop with data-dependent "
                "carry, differenced across trip counts — relay dispatch/fetch "
                "fixed costs cancel; utils/devicetime.py; adversarially "
                "validated in tools/ab_devicetime_validation.py)",
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
        "skipped": [],
    }
    _flush(details)
    atexit.register(_print_headline_final)

    # start the one-time Mosaic init immediately; it overlaps host-side prep
    init_thread = threading.Thread(
        target=_mosaic_init_warm, args=(details["_meta"],), daemon=True
    )
    init_thread.start()

    col_a, col_b = make_pairs(N_PAIRS)
    t_enc = time.perf_counter()
    from strsim_tpu.utils import encode as enc

    a, b = enc.encode_pair(col_a, col_b)
    encode_s = time.perf_counter() - t_enc
    del col_a, col_b
    validity = a.validity & b.validity
    details["_meta"]["encode_s"] = round(encode_s, 3)
    _log(f"encoded {N_PAIRS:,} pairs (width {a.width}, {encode_s:.2f}s, dtype {a.codes.dtype})")

    baselines = {}
    for measure in ALL_MEASURES:
        baselines[measure] = _native_baseline(measure, a, b, validity, BASELINE_SUBSET)
        if baselines[measure][0] is not None:
            _log(f"native[{measure}]: {baselines[measure][0]:,.0f} pairs/s (best of 3)")

    # the one-time Mosaic init MUST complete alone before any concurrent
    # compiles: round-4 try2 raced 6 prewarm streams against it and the init
    # never finished (22 min); sequential runs complete in 2-14 min.
    init_thread.join(timeout=max(_remaining() - 420.0, 60.0))
    if init_thread.is_alive():
        _log("mosaic init STILL RUNNING at join deadline — tunnel degraded; "
             "proceeding (everything will queue behind it)")

    # phase W: warm every section concurrently (post-init, per-executable
    # terminal compiles overlap; capped at 3 streams). Reserve ~420s for the
    # measurement phase; sections not warm by then still run — their own
    # watchdogs handle residual compiles.
    section_sets = list(ALL_MEASURES) + [",".join(ALL_MEASURES)]
    details["_meta"]["prewarm_s"] = _prewarm_all(
        a, b, section_sets, max(_remaining() - 420.0, 60.0)
    )
    _flush(details)

    # five measures first (the reference's whole surface,
    # /root/reference/src/expressions/mod.rs:8-31) — each flushed on completion
    for measure in ALL_MEASURES:
        if _remaining() < SECTION_MIN_S:
            details["skipped"].append(measure)
            _log(f"DEADLINE: skipping {measure} ({_remaining():.0f}s left)")
            continue
        _log(f"section[{measure}] starting ({_remaining():.0f}s left)")
        try:
            r = _measure_section(measure, a, b, validity, baselines[measure])
        except Exception as e:  # noqa: BLE001 — a failed section must not kill the run
            _log(f"worker[{measure}] FAILED: {e!r}")
            r = None
        if r is not None:
            details["measures"][measure] = r
        else:
            details["skipped"].append(measure)
        if measure == "levenshtein":
            _print_headline(r)
        _flush(details)

    # host-encode budget + projected untunneled e2e (host-only, ~3 s)
    try:
        details["encode"] = _encode_section(details)
        enc_sec = details["encode"]
        _log(f"encode: {enc_sec['encode_pairs_per_sec']:,.0f} pairs/s "
             f"({enc_sec['encode_pair_s']:.3f}s; passes={enc_sec.get('passes')}); "
             f"projected untunneled e2e={details['_meta'].get('projected_e2e_pairs_per_sec')}")
    except Exception as e:  # noqa: BLE001
        _log(f"encode section FAILED: {e!r}")
    _flush(details)

    if _remaining() >= SECTION_MIN_S:
        try:
            fused = _measure_section(",".join(ALL_MEASURES), a, b, validity, (None, None))
        except Exception as e:  # noqa: BLE001
            _log(f"worker[fused] FAILED: {e!r}")
            fused = None
        if fused is not None:
            details["fused"] = fused
        else:
            details["skipped"].append("fused")
        _flush(details)
    else:
        details["skipped"].append("fused")

    # wide-ladder coverage (buckets 63..511, lengths 48..511): the headline
    # workload is len<=64 by definition (BASELINE.md), so the ladder tail
    # gets its own measured section
    details["wide_buckets"] = {}
    wa = wb = wvalidity = None
    WIDE_MEASURES = ("levenshtein", "jaro_winkler", "jaccard", "osa")
    for measure in WIDE_MEASURES:
        if _remaining() < SECTION_MIN_S:
            details["skipped"].append(f"wide:{measure}")
            _log(f"DEADLINE: skipping wide:{measure} ({_remaining():.0f}s left)")
            continue
        if wa is None:
            wcol_a, wcol_b = make_wide_pairs(N_WIDE_PAIRS)
            wa, wb = enc.encode_pair(wcol_a, wcol_b)
            del wcol_a, wcol_b
            wvalidity = wa.validity & wb.validity
            _log(f"wide: encoded {N_WIDE_PAIRS:,} pairs (width {wa.width}, dtype {wa.codes.dtype})")
            # wide phase W: the ladder kernels + runners, concurrently (the
            # parity pass runs on a WIDE_BASELINE_SUBSET slice, so warm that
            # shape set, and the resident shapes on the full workload)
            details["_meta"]["prewarm_wide_s"] = _prewarm_all(
                wa, wb, list(WIDE_MEASURES),
                max(_remaining() - 240.0, 30.0),
                compute_rows=WIDE_BASELINE_SUBSET,
            )
        try:
            r = _wide_section(measure, wa, wb, wvalidity)
        except Exception as e:  # noqa: BLE001
            _log(f"wide[{measure}] FAILED: {e!r}")
            r = None
        if r is not None:
            details["wide_buckets"][measure] = r
        else:
            details["skipped"].append(f"wide:{measure}")
        _flush(details)

    details["_meta"]["total_wall_s"] = round(time.time() - _T0, 1)
    _flush(details)
    _print_headline(details["measures"].get("levenshtein"))
    _print_headline_final()


if __name__ == "__main__":
    rc = 0
    try:
        main()
    except BaseException:  # noqa: BLE001 — headline + artifacts over stack unwind
        import traceback

        traceback.print_exc()
        _print_headline(None)  # early guard (no-op if already printed)
    # Best-effort graceful device release (bounded): an abandoned remote
    # session can leave the device grant held server-side, wedging the NEXT
    # process's claim for tens of minutes (observed after a SIGABRT exit).
    # Try to tear the backend down cleanly, but never let that itself hang.
    try:
        from strsim_tpu.utils.compile_guard import run_with_timeout

        def _release():
            import jax

            jax.clear_backends()

        ok, _ = run_with_timeout(_release, 10.0)
        _log(f"backend release: {'clean' if ok else 'timed out (abandoned)'}")
    except Exception:
        pass
    # hard exit: watchdog-abandoned daemon threads can be blocked inside PJRT
    # device calls, and C++ teardown with in-flight remote ops aborts the
    # process (observed rc 134 / "terminate called" on a degraded tunnel).
    # Results are already flushed to disk; skip teardown entirely.
    # The headline JSON must be the LAST line this process ever prints
    # (os._exit skips atexit, so re-print it explicitly here).
    _print_headline_final()
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)
