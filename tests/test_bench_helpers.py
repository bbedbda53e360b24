"""bench.py helpers on the CPU backend (the TPU run is the driver's job)."""
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from bench import make_pairs, measure_resident
from strsim_tpu.utils import encode as enc


def _encode(col_a, col_b):
    a = enc.encode_column(col_a, pad=enc.PAD_A)
    b = enc.encode_column(col_b, pad=enc.PAD_B)
    w = max(a.width, b.width)
    return enc._repad(a, enc.PAD_A, w), enc._repad(b, enc.PAD_B, w)


def test_make_pairs_shape_and_content():
    col_a, col_b = make_pairs(5000)
    assert len(col_a) == len(col_b) == 5000
    lens = [len(s) for s in col_a if s is not None]
    assert max(lens) <= 64
    assert any(s is None for s in col_a)
    assert any(s == "" for s in col_b)


def test_measure_resident_cpu():
    col_a, col_b = make_pairs(4000)
    a, b = _encode(col_a, col_b)
    out = measure_resident(a, b, ("levenshtein",))
    assert out is not None
    pps, bucket_times, device_s = out
    assert pps > 0 and device_s > 0 and bucket_times


def test_resident_matches_e2e_stats():
    """The resident path must dispatch the same kernels the e2e path does —
    sanity: scoring still exact after a resident run warmed the cache."""
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.ops.oracle import ORACLES

    col_a, col_b = make_pairs(2000)
    a, b = _encode(col_a, col_b)
    measure_resident(a, b, ("jaro_winkler",))
    vals, valid = compute_scores(a, b, ("jaro_winkler",))["jaro_winkler"]
    idx = [i for i in range(2000) if valid[i]]
    want = [ORACLES["jaro_winkler"](col_a[i], col_b[i]) for i in idx[:500]]
    got = [vals[i] for i in idx[:500]]
    assert got == want
