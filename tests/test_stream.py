"""Streaming batch API: pipelined encode, journal restart, exactness."""
import numpy as np

from strsim_tpu.models.stream import compute_stream, run_stream_restartable
from strsim_tpu.parallel.restart import RunJournal
from strsim_tpu.ops.oracle import ORACLES


def _batches(n_batches=4, rows=50):
    words = ["phillips", "philips", "smith", "smyth", None, ""]
    for k in range(n_batches):
        col_a = [words[(i + k) % 6] for i in range(rows)]
        col_b = [words[(i * 3 + k) % 6] for i in range(rows)]
        yield f"batch-{k}", col_a, col_b


def test_stream_exactness():
    seen = {}
    for bid, res in compute_stream(_batches(), ("jaro",)):
        seen[bid] = res["jaro"]
    assert len(seen) == 4
    words = ["phillips", "philips", "smith", "smyth", None, ""]
    for k in range(4):
        vals, valid = seen[f"batch-{k}"]
        for i in range(50):
            a, b = words[(i + k) % 6], words[(i * 3 + k) % 6]
            if a is None or b is None:
                assert not valid[i]
            else:
                assert vals[i] == ORACLES["jaro"](a, b)


def test_stream_restart(tmp_path):
    journal = RunJournal(str(tmp_path / "j.jsonl"))
    stored = {}
    n1 = run_stream_restartable(_batches(), ("levenshtein",), stored.__setitem__, journal)
    assert n1 == 4 and len(stored) == 4
    # resume: nothing left to do
    n2 = run_stream_restartable(_batches(), ("levenshtein",), stored.__setitem__, journal)
    assert n2 == 0


def test_stream_producer_error_surfaces():
    def bad():
        yield "b0", ["a"], ["a"]
        raise RuntimeError("source failed")

    import pytest

    with pytest.raises(RuntimeError, match="source failed"):
        list(compute_stream(bad(), ("jaro",)))


def test_stream_prefetch_depth():
    out = dict(compute_stream(_batches(3, 20), ("jaccard",), prefetch=2))
    assert len(out) == 3
