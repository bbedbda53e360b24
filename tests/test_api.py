"""End-to-end API tests: golden parity through the full pipeline, the README
demo table (README.md:59-72), null propagation, broadcast rules, and shape
errors (src/expressions/strsim.rs:41-107 semantics)."""
import math

import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.ops.oracle import ORACLES

CORE_MEASURES = ("jaccard", "jaro", "jaro_winkler", "levenshtein", "sorensen_dice")

THRESHOLD = 1e-8


@pytest.mark.parametrize("measure", CORE_MEASURES)
def test_golden_through_pipeline(golden, measure):
    cases = golden[measure]
    col_a = [a for a, _, _ in cases]
    col_b = [b for _, b, _ in cases]
    got = st.compute(measure, col_a, col_b)
    want = np.array([e for _, _, e in cases])
    assert np.all(np.abs(got - want) < THRESHOLD)


@pytest.mark.parametrize("measure", CORE_MEASURES)
def test_bitexact_vs_oracle(golden, measure):
    """Stronger than the golden tolerance: pipeline scores must be bit-for-float
    identical to the oracle (which evaluates the reference's f64 formulas)."""
    cases = golden[measure]
    col_a = [a for a, _, _ in cases]
    col_b = [b for _, b, _ in cases]
    got = st.compute(measure, col_a, col_b)
    want = np.array([ORACLES[measure](a, b) for a, b, _ in cases])
    assert got.tobytes() == want.tobytes()


def test_readme_demo_table():
    """README.md:59-72 — exact expected values incl. empty and null rows."""
    name_a = ["phillips", "phillips", "", "", None, None]
    name_b = ["phillips", "philips", "phillips", "", "phillips", None]
    expected = {
        "levenshtein": [1.0, 0.875, 0.0, 1.0, None, None],
        "jaro": [1.0, 0.9583333333333334, 0.0, 1.0, None, None],
        "jaro_winkler": [1.0, 0.975, 0.0, 1.0, None, None],
        "jaccard": [1.0, 0.875, 0.0, 1.0, None, None],
        "sorensen_dice": [1.0, 0.9333333333333333, 0.0, 1.0, None, None],
    }
    out = st.compute_many(list(expected), name_a, name_b)
    for measure, want in expected.items():
        got = out[measure]
        for i, w in enumerate(want):
            if w is None:
                assert math.isnan(got[i]), (measure, i)
            else:
                assert abs(got[i] - w) < 1e-12, (measure, i, got[i], w)


def test_null_propagation():
    values, validity = st.compute_with_validity(
        "jaro", ["a", None, "c", None], ["a", "b", None, None]
    )
    assert list(validity) == [True, False, False, False]
    assert values[0] == 1.0 and all(math.isnan(v) for v in values[1:])


def test_broadcast_literal():
    got = st.compute("levenshtein", ["smith", "smyth", None], st.lit("smith"))
    assert got[0] == 1.0
    assert abs(got[1] - 0.8) < 1e-12
    assert math.isnan(got[2])
    # bare str in array mode is a broadcast literal too
    got2 = st.compute("levenshtein", "smith", ["smith", "smyth"])
    assert got2[0] == 1.0 and abs(got2[1] - 0.8) < 1e-12


def test_shape_mismatch_raises():
    with pytest.raises(ValueError, match="same length"):
        st.compute("jaro", ["a", "b"], ["a", "b", "c"])


def test_null_literal_raises():
    with pytest.raises(ValueError, match="null literal"):
        st.compute("jaro", ["a", "b"], st.lit(None))


def test_mixed_length_bucketing():
    """Rows spanning several buckets (incl. >512 overflow) come back in order."""
    rng = np.random.default_rng(7)
    cases = [
        ("a" * 5, "a" * 4),
        ("b" * 30, "b" * 31),
        ("c" * 100, "c" * 90),
        ("d" * 600, "d" * 601),  # beyond the largest standard bucket
        ("x", "y"),
    ]
    col_a = [a for a, _ in cases]
    col_b = [b for _, b in cases]
    for measure in ("levenshtein", "jaccard"):
        got = st.compute(measure, col_a, col_b)
        want = np.array([ORACLES[measure](a, b) for a, b in cases])
        assert got.tobytes() == want.tobytes(), measure


def test_empty_column():
    got = st.compute("jaro", [], [])
    assert got.shape == (0,)


def test_config_override():
    cfg = st.get_config().replace(equal_fast_path=False, buckets=(8, 16))
    got = st.compute("levenshtein", ["same", "longer-than-sixteen-chars"],
                     ["same", "longer-than-sixteen-chars!"], config=cfg)
    assert got[0] == 1.0
    want = ORACLES["levenshtein"]("longer-than-sixteen-chars", "longer-than-sixteen-chars!")
    assert got[1] == want


def test_compile_timeout_falls_back_to_host():
    """A zero compile deadline forces the exact host fallback — results must
    be bit-identical to the oracle."""
    cfg = st.get_config().replace(compile_timeout_s=0.000001, fallback="native")
    cases = [("phillips", "philips"), ("kitten", "sitting"), ("a" * 40, "b" * 39)]
    got = st.compute("levenshtein", [a for a, _ in cases], [b for _, b in cases], config=cfg)
    want = np.array([ORACLES["levenshtein"](a, b) for a, b in cases])
    # the background compile may win the race for later buckets; either path
    # is exact, so just require exact values
    assert got.tobytes() == want.tobytes()


def test_compile_timeout_oracle_fallback():
    cfg = st.get_config().replace(compile_timeout_s=0.000001, fallback="oracle")
    got = st.compute("jaro_winkler", ["martha"], ["marhta"])
    assert abs(got[0] - 0.9611111111111111) < 1e-12


def test_no_fast_path_still_exact():
    """With the equal fast path off, equal pairs (incl. the len-1 window edge,
    strsim.rs:197-199) must still be exact through the kernels."""
    cfg = st.get_config().replace(equal_fast_path=False)
    col_a = ["s", "s", "x", "same", "ab"]
    col_b = ["s", "t", "x", "same", "ab"]
    for measure in CORE_MEASURES:
        got = st.compute(measure, col_a, col_b, config=cfg)
        want = np.array([ORACLES[measure](a, b) for a, b in zip(col_a, col_b)])
        assert got.tobytes() == want.tobytes(), measure


def test_kernel_cache_stable_across_calls():
    """Repeated same-shape calls must not grow the kernel cache (no retraces)."""
    from strsim_tpu.models import pipeline as pp

    st.compute("jaro", ["warm"], ["warmup"])
    before = len(pp._kernel_cache)
    for _ in range(3):
        st.compute("jaro", ["abc"], ["abd"])
    assert len(pp._kernel_cache) == before


def test_execute_timeout_falls_back_to_host():
    """A zero execution deadline forces the exact host fallback path."""
    cfg = st.get_config().replace(execute_timeout_s=1e-9)
    got = st.compute("levenshtein", ["phillips", "kitten"], ["philips", "sitting"], config=cfg)
    want = np.array([ORACLES["levenshtein"]("phillips", "philips"),
                     ORACLES["levenshtein"]("kitten", "sitting")])
    assert got.tobytes() == want.tobytes()


def test_host_short_circuit_skips_device():
    """Below the threshold, kernel-needing rows score on the exact host path
    and the device is never dispatched (cold-start latency guard)."""
    from strsim_tpu.models.pipeline import compute_scores
    from strsim_tpu.utils.metrics import RunMetrics

    cfg = st.get_config().replace(host_short_circuit_rows=8192)
    m = RunMetrics()
    col_a = ["smith", "johnson", "wbc", None, ""]
    col_b = ["smyth", "jonson", "abc", "x", ""]
    out = compute_scores(col_a, col_b, ("levenshtein", "jaro_winkler"), config=cfg, metrics=m)
    assert m.device_rows == 0
    assert m.oracle_rows == 3  # the three real pairs; null + both-empty resolve earlier
    for measure in ("levenshtein", "jaro_winkler"):
        vals, valid = out[measure]
        assert not valid[3]
        assert vals[4] == 1.0
        for i in range(3):
            assert vals[i] == ORACLES[measure](col_a[i], col_b[i])


def test_pallas_compile_error_degrades_to_xla_kernel(monkeypatch):
    """A pallas_scan compile ERROR (flaky Mosaic service) must degrade to the
    same-contract XLA kernel on-device, not fail and not lose exactness."""
    from strsim_tpu.models import pipeline as pp

    real = pp._compiled_kernel
    seen = []

    def flaky(measures, impls, *args, **kw):
        if any(v == "pallas_scan" for _, v in impls):
            seen.append("pallas_raise")
            raise RuntimeError("Mosaic HTTP 500 (simulated)")
        seen.append(dict(impls)["levenshtein"])
        return real(measures, impls, *args, **kw)

    monkeypatch.setattr(pp, "_compiled_kernel", flaky)
    cfg = st.get_config().replace(
        levenshtein_impl="pallas_scan", host_short_circuit_rows=0
    )
    col_a = ["phillips", "kitten", "abc"] * 8
    col_b = ["philips", "sitting", "abd"] * 8
    got = st.compute("levenshtein", col_a, col_b, config=cfg)
    want = np.array(
        [ORACLES["levenshtein"](a, b) for a, b in zip(col_a, col_b)]
    )
    assert got.tobytes() == want.tobytes()
    assert "pallas_raise" in seen and "myers" in seen

    # drain background compiles kicked off by prewarm (the interpret-mode
    # pallas compile): a daemon thread still inside XLA at interpreter exit
    # aborts process teardown
    from strsim_tpu.utils import compile_guard

    for fut in list(compile_guard._futures.values()):
        fut.event.wait(120)


def test_jaro_impl_routing_by_dtype_and_max_char(monkeypatch):
    """auto routing of the fused jaro kernel: byte compaction for int8 tiles,
    halfword for BMP int32 buckets, full-word for astral, bitmask when the
    bucket max is unknown or the backend is not TPU."""
    from strsim_tpu.models import pipeline as pp

    cfg = st.get_config()
    assert cfg.jaro_impl == "auto"
    monkeypatch.setattr(pp.jax, "default_backend", lambda: "tpu")
    assert pp._jaro_impl_for(cfg, 15, np.int8) == "pallas_scan"
    assert pp._jaro_impl_for(cfg, 15, np.int32, max_char=0x4F60) == "pallas_scan_h"
    assert pp._jaro_impl_for(cfg, 15, np.int32, max_char=0x1F600) == "pallas_scan_f"
    assert pp._jaro_impl_for(cfg, 15, np.int32) == "bitmask"  # unknown max
    assert pp._jaro_impl_for(cfg, 640, np.int32, max_char=1000) == "bitmask"
    # measured width cutoffs (BENCH_UNICODE.json): pack=2 <= 95, pack=1 <= 63
    assert pp._jaro_impl_for(cfg, 95, np.int32, max_char=0x4F60) == "pallas_scan_h"
    assert pp._jaro_impl_for(cfg, 127, np.int32, max_char=0x4F60) == "bitmask"
    assert pp._jaro_impl_for(cfg, 63, np.int32, max_char=0x1F600) == "pallas_scan_f"
    assert pp._jaro_impl_for(cfg, 95, np.int32, max_char=0x1F600) == "bitmask"
    monkeypatch.setattr(pp.jax, "default_backend", lambda: "cpu")
    assert pp._jaro_impl_for(cfg, 15, np.int8) == "bitmask"


def test_narrow_bucket_reports_max_char():
    """_narrow_bucket: int8 + no scan for pure-ASCII columns, int32 + the
    bucket's max codepoint for unicode buckets (feeds jaro pack selection)."""
    from strsim_tpu.models import pipeline as pp
    from strsim_tpu.utils import encode as enc

    cfg = st.get_config()
    a = enc.encode_column(["Мюллер", "你好"], pad=enc.PAD_A)
    b = enc.encode_column(["Миллер", "你woof"], pad=enc.PAD_B, width=a.width)
    sel = np.arange(2)
    dtype, mx = pp._narrow_bucket(cfg, a, b, sel, a.width)
    assert dtype == np.int32 and mx == max(max(map(ord, "Мюллер你好")), ord("w"))

    a8 = enc.encode_column(["abc", "def"], pad=enc.PAD_A)
    b8 = enc.encode_column(["abd", "dxf"], pad=enc.PAD_B, width=a8.width)
    dtype8, mx8 = pp._narrow_bucket(cfg, a8, b8, sel, a8.width)
    assert dtype8 == np.int8
