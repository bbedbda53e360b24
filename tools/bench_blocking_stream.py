"""Streaming blocked-dedup dress rehearsal with mid-run preemption.

Drives models/blocking.dedup_blocked_stream on real TPU over a corpus whose
blocked self-join is ~10M pairs, kills the run after the first journal-marked
chunk (simulated preemption), resumes from the journal, and validates:
  * the resumed run skips exactly the completed chunk ids;
  * the union of both runs' outputs has no duplicate pairs;
  * a random sample of emitted (i, j, score) rows is bit-exact vs the native
    C++ reference implementation;
  * chunk ids are deterministic across the two invocations.

Appends the result to BENCH_BLOCKING.json under "stream_restart".
Run: timeout 1500 python tools/bench_blocking_stream.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strsim_tpu.models.blocking import dedup_blocked_stream  # noqa: E402
from strsim_tpu.parallel.restart import RunJournal  # noqa: E402
from bench_blocking import make_corpus  # noqa: E402  (tools/ is on sys.path)

N = int(os.environ.get("STRSIM_STREAM_N", 150_000))
CHUNK = 2_000_000
THRESH = 0.92
T0 = time.time()


def log(msg):
    print(f"[stream +{time.time() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    names = make_corpus(N, seed=29)
    jpath = "/tmp/strsim_blocking_stream_journal.jsonl"
    if os.path.exists(jpath):
        os.remove(jpath)

    # ---- run 1: process chunks until "preemption" after 2 chunks ----
    journal = RunJournal(jpath)
    got = {}
    first_ids = []
    t = time.perf_counter()
    for cid, i, j, s in dedup_blocked_stream(
        names, key="soundex", "jaro_winkler", THRESH, journal=journal, pair_chunk=CHUNK
    ):
        got.update(zip(zip(i.tolist(), j.tolist()), s.tolist()))
        journal.mark_done(cid)
        first_ids.append(cid)
        if len(first_ids) == 2:
            break  # simulated preemption mid-run
    t1 = time.perf_counter() - t
    log(f"run 1: {len(first_ids)} chunks, {len(got)} hits, {t1:.1f}s, preempted")

    # ---- run 2: resume from the journal ----
    journal2 = RunJournal(jpath)
    resumed_ids = []
    n_before = len(got)
    pairs_scored = 0
    t = time.perf_counter()
    for cid, i, j, s in dedup_blocked_stream(
        names, key="soundex", "jaro_winkler", THRESH, journal=journal2, pair_chunk=CHUNK
    ):
        assert cid not in first_ids, f"completed chunk {cid} re-ran"
        for p, v in zip(zip(i.tolist(), j.tolist()), s.tolist()):
            assert p not in got, f"duplicate pair {p} across runs"
            got[p] = v
        journal2.mark_done(cid)
        resumed_ids.append(cid)
        pairs_scored += CHUNK
    t2 = time.perf_counter() - t
    log(f"run 2: skipped {len(first_ids)}, ran {len(resumed_ids)} chunks, "
        f"total {len(got)} hits, {t2:.1f}s")

    # ---- validation: sample bit-exact vs the native C++ reference ----
    from strsim_tpu.native.binding import native_compute_strings

    items = list(got.items())
    rng = np.random.default_rng(0)
    samp = rng.choice(len(items), size=min(400, len(items)), replace=False)
    ca = [names[items[k][0][0]] for k in samp]
    cb = [names[items[k][0][1]] for k in samp]
    want = native_compute_strings("jaro_winkler", ca, cb)
    sample_vals = np.array([items[k][1] for k in samp])
    ok = sample_vals.tobytes() == want.tobytes()
    assert np.all(sample_vals >= THRESH)
    log(f"sample parity on {samp.size} emitted rows: {ok}")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_BLOCKING.json",
    )
    res = json.load(open(path))
    res["stream_restart"] = {
        "rows": N,
        "threshold": THRESH,
        "chunks_before_preempt": len(first_ids),
        "chunks_on_resume": len(resumed_ids),
        "chunks_skipped_on_resume": len(first_ids),
        "pairs_above_threshold": len(got),
        "wall_s_run1": round(t1, 1),
        "wall_s_run2": round(t2, 1),
        "sample_rows_bit_exact_vs_native": bool(ok),
    }
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    log(f"wrote stream_restart entry to {path}")
    assert ok


if __name__ == "__main__":
    main()
