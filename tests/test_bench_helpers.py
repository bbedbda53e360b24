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


def test_devicetime_runner_not_elided_at_single_chunk():
    """Regression (round 4): with one staged chunk the runner's slice index
    folds constant and XLA may hoist the kernel out of the trip loop,
    reporting the bare counter loop as the 'block time'. _ensure_two_chunks
    must keep wall(n) growing ~linearly in n."""
    import jax.numpy as jnp

    from strsim_tpu.utils.devicetime import _ensure_two_chunks, _runner, _wall

    def heavy(codes, lens):
        x = codes.astype(jnp.int32)
        for _ in range(30):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            x = x ^ (x >> 7)
        return jnp.stack([jnp.sum(x, axis=1) + lens[:, 0]])

    codes3 = jnp.ones((1, 4096, 64), jnp.int8)
    lens3 = jnp.ones((1, 4096, 2), jnp.int32)
    c3, l3 = _ensure_two_chunks(codes3, lens3)
    assert c3.shape[0] == 2 and l3.shape[0] == 2
    run = _runner(heavy)
    _wall(run, c3, l3, 1)
    t1 = min(_wall(run, c3, l3, 1) for _ in range(3))
    t64 = min(_wall(run, c3, l3, 64) for _ in range(3))
    assert t64 > 20 * t1, (t1, t64)


def test_measure_resident_prewarm_only():
    """prewarm_only compiles and first-executes without measuring."""
    from bench import measure_resident

    col_a, col_b = make_pairs(3000)
    a, b = _encode(col_a, col_b)
    assert measure_resident(a, b, ("levenshtein",), prewarm_only=True) is None
    out = measure_resident(a, b, ("levenshtein",))
    assert out is not None and out[0] > 0
