"""Shard-granular restartability for large batch jobs.

The workload is stateless per row pair, so checkpointing model state is
meaningless (SURVEY.md §5: reference has none); what a 100M-pair job needs is
to not recompute shards that already finished when a host is preempted. A
RunJournal records completed shard ids (append-only JSONL, crash-safe since
each line is written after its shard's results are durably stored by the
caller); on restart, completed shards are skipped.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Set


class RunJournal:
    def __init__(self, path: str):
        self.path = path
        self._done: Set[str] = set()
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        self._done.add(rec["shard"])

    def is_done(self, shard_id: str) -> bool:
        return shard_id in self._done

    def mark_done(self, shard_id: str, meta: Optional[Dict] = None) -> None:
        rec = {"shard": shard_id, "status": "done"}
        if meta:
            rec["meta"] = meta
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        self._done.add(shard_id)

    @property
    def completed(self) -> Set[str]:
        return set(self._done)


def run_restartable(
    journal: RunJournal,
    shard_ids: Sequence[str],
    run_shard,
    store_result,
) -> Dict[str, object]:
    """Run shards not yet marked done; `store_result(shard_id, result)` must
    persist before the journal marks completion. Returns results of the shards
    executed this invocation."""
    out = {}
    for sid in shard_ids:
        if journal.is_done(sid):
            continue
        result = run_shard(sid)
        store_result(sid, result)
        journal.mark_done(sid)
        out[sid] = result
    return out
