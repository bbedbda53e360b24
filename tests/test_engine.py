"""StrsimEngine session API + polars expression layer (skipped without polars)."""
import numpy as np
import pytest

import strsim_tpu as st


def test_engine_basic():
    eng = st.StrsimEngine()
    eng.prewarm(("levenshtein",), widths=[8])
    out = eng.compute("levenshtein", ["phillips"], ["philips"])
    assert abs(out[0] - 0.875) < 1e-12
    rep = eng.report()
    assert rep["n_rows"] == 1 and rep["pairs_per_sec"] > 0


def test_engine_custom_config():
    eng = st.StrsimEngine(st.get_config().replace(equal_fast_path=False))
    out = eng.compute_many(("jaro", "jaccard"), ["same"], ["same"])
    assert out["jaro"][0] == 1.0 and out["jaccard"][0] == 1.0


def test_polars_expression_layer():
    pl = pytest.importorskip("polars")
    from strsim_tpu import levenshtein, jaro_winkler

    df = pl.DataFrame(
        {"a": ["phillips", "phillips", None], "b": ["phillips", "philips", "x"]}
    ).with_columns(
        lev=levenshtein("a", "b"),
        jw=jaro_winkler("a", pl.col("b")),
    )
    assert df["lev"].to_list()[0] == 1.0
    assert abs(df["lev"].to_list()[1] - 0.875) < 1e-12
    assert df["lev"].to_list()[2] is None
    assert abs(df["jw"].to_list()[1] - 0.975) < 1e-12


def test_polars_literal_broadcast():
    pl = pytest.importorskip("polars")
    from strsim_tpu import levenshtein

    df = pl.DataFrame({"a": ["smith", "smyth"]}).with_columns(
        lev=levenshtein("a", pl.lit("smith"))
    )
    assert df["lev"].to_list() == [1.0, 0.8]


def test_engine_metrics_accumulate():
    eng = st.StrsimEngine()
    eng.compute("jaro", ["abc"], ["abd"])
    eng.compute("jaro", ["x", "y"], ["x", "z"])
    rep = eng.report()
    assert rep["n_rows"] == 3
    eng.reset_metrics()
    assert eng.report()["n_rows"] == 0


def test_engine_compute_with_validity():
    eng = st.StrsimEngine()
    res = eng.compute_with_validity(("jaccard",), ["ab", None], ["ba", "x"])
    vals, valid = res["jaccard"]
    assert vals[0] == 1.0 and not valid[1]
