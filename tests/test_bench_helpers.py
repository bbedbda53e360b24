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
    # A hoisted kernel shows ratio ~1; real per-chunk work shows ~64x. Bound
    # at 8x (not 20x) so fixed dispatch overhead on a loaded CI runner can't
    # compress a genuine linear signal below the threshold (ADVICE round 4).
    assert t64 > 8 * t1, (t1, t64)


def test_headline_final_is_reprintable(capsys):
    """Regression (rounds 1/2/4 shipped parsed:null): the final headline print
    must be unguarded — it re-prints the remembered levenshtein payload after
    the early once-only print, so the JSON can be the process's last line."""
    import json

    import bench

    state_before = dict(bench._headline_state)
    try:
        bench._headline_state.update({"payload": None, "early_printed": False})
        bench._print_headline({"resident_pairs_per_sec": 1.25e9,
                               "resident_speedup_vs_single_core": 650.0})
        bench._print_headline({"resident_pairs_per_sec": 9.9})  # guarded: no-op
        bench._print_headline_final()
        bench._print_headline_final()  # unguarded: prints every time
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
        assert len(lines) == 3
        payloads = [json.loads(ln) for ln in lines]
        assert all(p == payloads[0] for p in payloads)
        assert payloads[-1]["value"] == 1.25e9
        assert payloads[-1]["vs_baseline"] == 650.0

        # error path: nothing measured -> final print emits the error payload
        bench._headline_state.update({"payload": None, "early_printed": False})
        bench._print_headline_final()
        err = json.loads(capsys.readouterr().out.strip())
        assert err["value"] == 0.0 and "error" in err
    finally:
        bench._headline_state.update(state_before)


def test_measure_resident_prewarm_only():
    """prewarm_only compiles and first-executes without measuring."""
    from bench import measure_resident

    col_a, col_b = make_pairs(3000)
    a, b = _encode(col_a, col_b)
    assert measure_resident(a, b, ("levenshtein",), prewarm_only=True) is None
    out = measure_resident(a, b, ("levenshtein",))
    assert out is not None and out[0] > 0
