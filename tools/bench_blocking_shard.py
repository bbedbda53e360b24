"""Production-scale shard run: one worker of a 4-process blocked-dedup fleet.

Runs dedup_blocked_stream over shard 0/4 of the 1M-row corpus (~101M blocked
pairs) end-to-end on one TPU chip through the relay tunnel, journaled, and
records wall time + throughput + a bit-exact sample check in
BENCH_BLOCKING.json under "shard_run". Together with the sharding partition
contract (tested disjoint + exhaustive) this is the measured cost of one
worker in the documented multi-process pattern.

Run: timeout 5400 python tools/bench_blocking_shard.py
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
from bench_blocking import make_corpus  # noqa: E402

N = int(os.environ.get("STRSIM_SHARD_N", 1_000_000))
NUM_SHARDS = 4
CHUNK = 4_000_000
THRESH = 0.92
T0 = time.time()


def log(msg):
    print(f"[shard +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    names = make_corpus(N)
    jpath = "/tmp/strsim_shard0_journal.jsonl"
    if os.path.exists(jpath):
        os.remove(jpath)
    journal = RunJournal(jpath)

    n_hits = 0
    n_chunks = 0
    sample = []
    t = time.perf_counter()
    for cid, i, j, s in dedup_blocked_stream(
        names, key="soundex", "jaro_winkler", THRESH, journal=journal,
        pair_chunk=CHUNK, shard=0, num_shards=NUM_SHARDS,
    ):
        journal.mark_done(cid)
        n_hits += i.size
        n_chunks += 1
        if i.size and len(sample) < 500:
            k = min(20, i.size)
            sample.extend((int(a), int(b), float(v)) for a, b, v in zip(i[:k], j[:k], s[:k]))
        if n_chunks % 5 == 0:
            el = time.perf_counter() - t
            log(f"{n_chunks} chunks (~{n_chunks * CHUNK / 1e6:.0f}M pairs), "
                f"{n_hits} hits, {el:.0f}s ({n_chunks * CHUNK / el / 1e6:.2f}M pairs/s e2e)")
    wall = time.perf_counter() - t
    pairs = n_chunks * CHUNK  # chunks are full except the last; close enough ±1 chunk
    log(f"DONE: {n_chunks} chunks, {n_hits} hits, {wall:.0f}s")

    # bit-exact sample check vs the native C++ reference
    from strsim_tpu.native.binding import native_compute_strings

    ca = [names[a] for a, _, _ in sample]
    cb = [names[b] for _, b, _ in sample]
    want = native_compute_strings("jaro_winkler", ca, cb)
    got = np.array([v for _, _, v in sample])
    ok = got.tobytes() == want.tobytes()
    log(f"sample parity on {len(sample)} rows: {ok}")

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_BLOCKING.json",
    )
    res = json.load(open(path))
    res["shard_run"] = {
        "_what": f"one worker of a {NUM_SHARDS}-process fleet: dedup_blocked_stream(shard=0, num_shards={NUM_SHARDS}) over the {N}-row corpus, journaled, e2e through the ~30 MB/s relay tunnel",
        "rows": N,
        "num_shards": NUM_SHARDS,
        "threshold": THRESH,
        "chunks": n_chunks,
        "approx_pairs_scored": pairs,
        "pairs_above_threshold": int(n_hits),
        "wall_s": round(wall, 1),
        "e2e_pairs_per_sec": int(pairs / wall) if wall else 0,
        "sample_rows_bit_exact_vs_native": bool(ok),
    }
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    log("wrote shard_run entry")
    assert ok


if __name__ == "__main__":
    main()
