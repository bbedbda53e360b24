"""BASELINE config-5 dress rehearsal through the production streaming path.

Drives `compute_stream` + `RunJournal` (strsim_tpu/models/stream.py,
parallel/restart.py) over a skew-heavy pair workload (5% heavy tail of
200-500 char record strings — the length-skew regime SURVEY.md §5 calls out),
demonstrating:

  * sustained streaming throughput (pairs/s over the whole run, encode
    overlapped with device compute);
  * a mid-run preemption (the worker exits between batches after --kill-after
    batches) and a resume that skips exactly the journaled batches;
  * result integrity: every batch's scores are checksummed when stored, and
    the validation step recomputes sample rows on the exact host path.

Usage:
  python tools/bench_stream.py --pairs 100000000 --batch 5000000 \
      --workdir /tmp/stream_r2              # full orchestration (run+kill+resume)
  python tools/bench_stream.py --worker ... # internal: one streaming attempt

Writes <workdir>/summary.json; bench_configs.py merges it as config 5's
streaming entry.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_skew_batch(batch_idx: int, n: int):
    """Deterministic skew-heavy pair batch (regenerated identically on resume)."""
    from bench import make_pairs

    col_a, col_b = make_pairs(n, seed=1000 + batch_idx)
    rng = np.random.default_rng(5000 + batch_idx)
    tail = rng.random(n) < 0.05
    blob = "the quick brown fox jumps over the lazy dog " * 12
    for i in np.nonzero(tail)[0]:
        col_a[i] = blob[: int(200 + 300 * rng.random())]
        col_b[i] = blob[: int(200 + 300 * rng.random())] + "x"
    return col_a, col_b


def _checksum(res) -> str:
    h = hashlib.sha256()
    for m in sorted(res):
        vals, valid = res[m]
        h.update(m.encode())
        h.update(np.nan_to_num(vals, nan=-1.0).tobytes())
        h.update(np.asarray(valid).tobytes())
    return h.hexdigest()


def worker(args) -> int:
    from strsim_tpu.models.stream import compute_stream
    from strsim_tpu.parallel.restart import RunJournal
    from strsim_tpu.utils.metrics import RunMetrics

    wd = pathlib.Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    journal = RunJournal(str(wd / "journal.jsonl"))
    n_batches = args.pairs // args.batch
    measures = tuple(args.measures.split(","))

    def batches():
        for i in range(n_batches):
            bid = f"batch-{i:04d}"
            if journal.is_done(bid):
                continue
            col_a, col_b = make_skew_batch(i, args.batch)
            yield bid, col_a, col_b

    metrics = RunMetrics()
    t0 = time.perf_counter()
    done_this_run = 0
    store_path = wd / "store.jsonl"
    for bid, res in compute_stream(batches(), measures, journal=journal, metrics=metrics):
        with open(store_path, "a") as f:  # durable store before journal mark
            f.write(json.dumps({"batch": bid, "sha256": _checksum(res)}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        journal.mark_done(bid)
        done_this_run += 1
        dt = time.perf_counter() - t0
        print(
            f"[worker] {bid} done ({done_this_run} this run, "
            f"{done_this_run * args.batch / dt:,.0f} pairs/s sustained)",
            flush=True,
        )
        if args.kill_after and done_this_run >= args.kill_after:
            print(f"[worker] simulating preemption after {done_this_run} batches", flush=True)
            os._exit(42)  # hard exit between batches — nothing mid-compile
    wall = time.perf_counter() - t0
    with open(wd / "worker_result.json", "w") as f:
        json.dump(
            {
                "batches_this_run": done_this_run,
                "wall_s": wall,
                "pairs_per_sec_sustained": done_this_run * args.batch / wall if wall else 0.0,
            },
            f,
        )
    return 0


def orchestrate(args) -> dict:
    wd = pathlib.Path(args.workdir)
    if wd.exists():
        for p in wd.glob("*"):
            p.unlink()
    wd.mkdir(parents=True, exist_ok=True)
    base = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker",
        "--pairs", str(args.pairs),
        "--batch", str(args.batch),
        "--measures", args.measures,
        "--workdir", str(wd),
    ]
    n_batches = args.pairs // args.batch
    kill_after = args.kill_after or max(1, n_batches // 3)

    print(f"[orchestrate] run 1 (will self-preempt after {kill_after} batches)", flush=True)
    r1 = subprocess.run(base + ["--kill-after", str(kill_after)])
    assert r1.returncode == 42, f"expected preemption exit 42, got {r1.returncode}"

    done_after_kill = sum(1 for _ in open(wd / "journal.jsonl"))
    print(f"[orchestrate] preempted with {done_after_kill} journaled; resuming", flush=True)
    t0 = time.perf_counter()
    r2 = subprocess.run(base)
    resume_wall = time.perf_counter() - t0
    assert r2.returncode == 0, f"resume failed rc={r2.returncode}"

    from strsim_tpu.parallel.restart import RunJournal

    journal = RunJournal(str(wd / "journal.jsonl"))
    assert len(journal.completed) == n_batches, (len(journal.completed), n_batches)
    stored = [json.loads(l) for l in open(wd / "store.jsonl")]
    stored_ids = [s["batch"] for s in stored]
    assert len(stored_ids) == len(set(stored_ids)) == n_batches, "every batch stored exactly once"

    worker_result = json.load(open(wd / "worker_result.json"))

    # integrity: recompute one preempted-run batch and one resumed batch on the
    # exact host path and compare a sample of rows
    from strsim_tpu.native.binding import native_compute_strings

    sample_checks = 0
    for bi in (0, n_batches - 1):
        col_a, col_b = make_skew_batch(bi, args.batch)
        rng = np.random.default_rng(bi)
        rows = rng.choice(args.batch, size=min(200, args.batch), replace=False)
        sa = [col_a[i] for i in rows]
        sb = [col_b[i] for i in rows]
        for m in args.measures.split(","):
            want = native_compute_strings(m, sa, sb)
            from strsim_tpu.api import compute

            got = compute(m, sa, sb)
            ok = np.array_equal(
                np.nan_to_num(got, nan=-1.0), np.nan_to_num(want, nan=-1.0)
            )
            assert ok, f"sample mismatch batch {bi} measure {m}"
            sample_checks += len(rows)

    summary = {
        "config": "5_skew_stream_restart",
        "n_pairs": args.pairs,
        "batch_size": args.batch,
        "n_batches": n_batches,
        "measures": args.measures,
        "preempted_after_batches": done_after_kill,
        "resume_skipped_batches": done_after_kill,
        "resume_ran_batches": worker_result["batches_this_run"],
        "resume_wall_s": round(resume_wall, 2),
        "pairs_per_sec_sustained_resume": round(worker_result["pairs_per_sec_sustained"]),
        "restart_demonstrated": True,
        "sample_rows_validated_exact": sample_checks,
    }
    with open(wd / "summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=100_000_000)
    ap.add_argument("--batch", type=int, default=5_000_000)
    ap.add_argument("--measures", type=str, default="levenshtein")
    ap.add_argument("--workdir", type=str, default="/tmp/strsim_stream_bench")
    ap.add_argument("--kill-after", type=int, default=0)
    ap.add_argument("--worker", action="store_true")
    args = ap.parse_args()
    if args.worker:
        sys.exit(worker(args))
    orchestrate(args)


if __name__ == "__main__":
    main()
