"""Streaming batch execution for datasets larger than memory.

compute_stream() iterates over (batch_id, col_a, col_b) batches and yields
scored results, with:

  * host-side pipelining: the NEXT batch is encoded in a background thread
    while the current batch runs on the device (the north star's "staging
    overlaps with kernel compute", at batch granularity);
  * optional shard-granular restart via parallel.restart.RunJournal — completed
    batch ids are skipped on resume, matching the stateless-workload recovery
    model (SURVEY.md §5);
  * bounded memory: one batch encoded ahead, results yielded as they finish.

This is the production entry point for 100M-pair record-linkage runs: feed it
batches of a few million pairs each.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional, Tuple

import numpy as np

from strsim_tpu.config import StrsimConfig, get_config
from strsim_tpu.models.measures import resolve_measures
from strsim_tpu.models.pipeline import compute_scores
from strsim_tpu.utils import encode as enc

_SENTINEL = object()


def _encode_batch(col_a, col_b):
    a, b = enc.encode_pair(col_a, col_b)
    return a, b


def compute_stream(
    batches: Iterable[Tuple[str, object, object]],
    measures,
    config: Optional[StrsimConfig] = None,
    journal=None,
    metrics=None,
    prefetch: int = 1,
) -> Iterator[Tuple[str, Dict[str, Tuple[np.ndarray, np.ndarray]]]]:
    """Yield (batch_id, {measure: (values, validity)}) per input batch.

    batches: iterable of (batch_id, col_a, col_b). With a RunJournal, batches
    whose id is already recorded are skipped, and each yielded batch is only
    marked done after the caller's loop body returns (i.e. mark it yourself
    via journal.mark_done after durably storing results — or use
    run_stream_restartable below which does both).
    """
    cfg = config or get_config()
    measures = resolve_measures(measures)

    q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
    err: list = []

    def producer():
        try:
            for batch_id, col_a, col_b in batches:
                if journal is not None and journal.is_done(batch_id):
                    continue
                q.put((batch_id, _encode_batch(col_a, col_b)))
        except BaseException as e:  # surfaced in the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        batch_id, (a, b) = item
        res = compute_scores(a, b, measures, config=cfg, metrics=metrics)
        yield batch_id, res


def run_stream_restartable(
    batches: Iterable[Tuple[str, object, object]],
    measures,
    store: Callable[[str, Dict], None],
    journal,
    config: Optional[StrsimConfig] = None,
    metrics=None,
) -> int:
    """Drive compute_stream to completion with durable restart bookkeeping:
    `store(batch_id, results)` persists each batch, then the journal marks it
    done. Returns the number of batches executed this invocation."""
    n = 0
    for batch_id, res in compute_stream(
        batches, measures, config=config, journal=journal, metrics=metrics
    ):
        store(batch_id, res)
        journal.mark_done(batch_id)
        n += 1
    return n
