"""StrsimEngine session API + polars expression layer.

Every expression-contract test runs against minipl always and against real
polars when importable (`_backends`). With STRSIM_REQUIRE_POLARS=1 (set by
the `polars` CI job), a missing/broken polars install FAILS the suite loudly
instead of silently exercising only minipl (VERDICT r4 item 8)."""
import os

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


def _backends():
    """Expression backends to test: minipl always; real polars when present."""
    from strsim_tpu import minipl

    out = [("minipl", minipl)]
    try:
        import polars

        out.append(("polars", polars))
    except ImportError:
        pass
    return out


def test_required_polars_backend_present():
    """The polars CI job sets STRSIM_REQUIRE_POLARS=1: if polars then fails
    to import (broken wheel, version conflict), every parametrized contract
    test would silently run minipl-only — this guard makes that drift a loud
    failure instead of a green lie."""
    if not os.environ.get("STRSIM_REQUIRE_POLARS"):
        pytest.skip("STRSIM_REQUIRE_POLARS not set (dev sandbox has no polars)")
    names = [n for n, _ in _backends()]
    assert "polars" in names, (
        "STRSIM_REQUIRE_POLARS=1 but real polars is not importable — the "
        "contract tests below would cover only minipl"
    )


@pytest.mark.parametrize("name,pl", _backends())
def test_polars_expression_layer(name, pl):
    from strsim_tpu import levenshtein, jaro_winkler

    df = pl.DataFrame(
        {"a": ["phillips", "phillips", None], "b": ["phillips", "philips", "x"]}
    ).with_columns(
        lev=levenshtein(pl.col("a"), pl.col("b")),
        jw=jaro_winkler(pl.col("a"), "b"),  # bare str -> pl.col (utils.py:36)
    )
    assert df["lev"].to_list()[0] == 1.0
    assert abs(df["lev"].to_list()[1] - 0.875) < 1e-12
    assert df["lev"].to_list()[2] is None
    assert abs(df["jw"].to_list()[1] - 0.975) < 1e-12


@pytest.mark.parametrize("name,pl", _backends())
def test_expression_layer_extension_measures(name, pl):
    """Extension measures ride the same expression plumbing as the core five."""
    from strsim_tpu.ops.oracle import ORACLES

    rows = [("ab", "ba"), ("night", "nacht"), ("phillips", "philips")]
    df = pl.DataFrame(
        {"a": [r[0] for r in rows] + [None], "b": [r[1] for r in rows] + ["x"]}
    ).with_columns(
        osa=st.osa(pl.col("a"), pl.col("b")),
        cos=st.cosine(pl.col("a"), pl.col("b")),
        lcs=st.lcs_seq(pl.col("a"), pl.col("b")),
    )
    for out_name, m in (("osa", "osa"), ("cos", "cosine"), ("lcs", "lcs_seq")):
        got = df[out_name].to_list()
        for i, (x, y) in enumerate(rows):
            assert got[i] == ORACLES[m](x, y), (m, x, y)
        assert got[3] is None


@pytest.mark.parametrize("name,pl", _backends())
def test_polars_literal_broadcast(name, pl):
    from strsim_tpu import levenshtein

    df = pl.DataFrame({"a": ["smith", "smyth"]}).with_columns(
        lev=levenshtein(pl.col("a"), pl.lit("smith"))
    )
    assert df["lev"].to_list() == [1.0, 0.8]


@pytest.mark.parametrize("name,pl", _backends())
def test_polars_readme_demo_table(name, pl):
    """The reference demo (demo.py:4-18) through df.with_columns: the full
    README.md:59-72 table, bit-for-float, including empty and null rows."""
    from strsim_tpu import jaccard, jaro, jaro_winkler, levenshtein, sorensen_dice

    df = pl.DataFrame(
        {
            "name_a": ["phillips", "phillips", "", "", None, None],
            "name_b": ["phillips", "philips", "phillips", "", "phillips", None],
        }
    ).with_columns(
        levenshtein=levenshtein(pl.col("name_a"), pl.col("name_b")),
        jaro=jaro(pl.col("name_a"), pl.col("name_b")),
        jaro_winkler=jaro_winkler(pl.col("name_a"), pl.col("name_b")),
        jaccard=jaccard(pl.col("name_a"), pl.col("name_b")),
        sorensen_dice=sorensen_dice(pl.col("name_a"), pl.col("name_b")),
    )
    want = {
        "levenshtein": [1.0, 0.875, 0.0, 1.0, None, None],
        "jaro": [1.0, 0.9583333333333334, 0.0, 1.0, None, None],
        "jaro_winkler": [1.0, 0.975, 0.0, 1.0, None, None],
        "jaccard": [1.0, 0.875, 0.0, 1.0, None, None],
        "sorensen_dice": [1.0, 0.9333333333333333, 0.0, 1.0, None, None],
    }
    for m, exp in want.items():
        got = df[m].to_list()
        assert got == exp, (m, got)


@pytest.mark.parametrize("name,pl", _backends())
def test_expression_alias_override(name, pl):
    """A user .alias() chained after the measure expr must rename the output
    column (the binding pre-aliases to the measure name internally —
    polars_compat.build_expr's .alias(measure) must not pin the name)."""
    from strsim_tpu import levenshtein

    df = pl.DataFrame({"a": ["smith", "smyth"]}).with_columns(
        levenshtein(pl.col("a"), pl.lit("smith")).alias("my_score")
    )
    assert "my_score" in df.columns
    assert df["my_score"].to_list() == [1.0, 0.8]


@pytest.mark.parametrize("name,pl", _backends())
def test_expression_struct_field_no_collision(name, pl):
    """Two strsim exprs over overlapping columns in ONE with_columns: both
    build internal structs with the same field names (__strsim_a/__strsim_b);
    the engine (and real polars' CSE) must keep them distinct, and struct
    fields must resolve by NAME, not position."""
    from strsim_tpu import jaro, levenshtein

    df = pl.DataFrame({"a": ["night", "abc"], "b": ["nacht", "acb"]}).with_columns(
        lev_ab=levenshtein(pl.col("a"), pl.col("b")),
        lev_ba=levenshtein(pl.col("b"), pl.col("a")),
        jaro_ab=jaro(pl.col("a"), pl.col("b")),
    )
    from strsim_tpu.ops.oracle import ORACLES

    for i, (x, y) in enumerate([("night", "nacht"), ("abc", "acb")]):
        assert df["lev_ab"].to_list()[i] == ORACLES["levenshtein"](x, y)
        assert df["lev_ba"].to_list()[i] == ORACLES["levenshtein"](y, x)
        assert df["jaro_ab"].to_list()[i] == ORACLES["jaro"](x, y)


@pytest.mark.parametrize("name,pl", _backends())
def test_expression_lazy_streaming_engine(name, pl):
    """is_elementwise=True through the REAL streaming engine: lazy collect
    with engine='streaming' must match eager row-for-row (the reference
    registers its plugin with the same flag — polars_strsim/__init__.py).
    minipl's chunked analogue is test_minipl_streaming_chunks."""
    if not hasattr(pl, "LazyFrame"):
        pytest.skip("streaming engine is real-polars-only")
    from strsim_tpu import jaro_winkler

    data = {"a": ["phillips", None, "", "jonsen"] * 8, "b": ["philips"] * 32}
    eager = pl.DataFrame(data).with_columns(
        jw=jaro_winkler(pl.col("a"), pl.col("b"))
    )
    lazy = (
        pl.DataFrame(data).lazy()
        .with_columns(jw=jaro_winkler(pl.col("a"), pl.col("b")))
        .collect(engine="streaming")
    )
    assert eager["jw"].to_list() == lazy["jw"].to_list()


def test_minipl_streaming_chunks():
    """is_elementwise=True must hold under chunked (streaming-engine-style)
    evaluation: results identical when the engine splits batches."""
    from strsim_tpu import levenshtein, minipl as pl

    data = {"a": ["abc", "abd", None, "", "xyz", "abc"], "b": ["abc"] * 6}
    whole = pl.DataFrame(data).with_columns(lev=levenshtein(pl.col("a"), pl.col("b")))
    try:
        pl.set_streaming_chunk_size(2)
        chunked = pl.DataFrame(data).with_columns(
            lev=levenshtein(pl.col("a"), pl.col("b"))
        )
    finally:
        pl.set_streaming_chunk_size(None)
    assert whole["lev"].to_list() == chunked["lev"].to_list()


def test_minipl_null_literal_divergence():
    """Reference PANICS on a null literal (strsim.rs:62,65). Through the
    expression layer a null literal broadcasts to null rows (null in -> null
    out) — the documented divergence; array mode raises instead."""
    from strsim_tpu import levenshtein, minipl as pl

    df = pl.DataFrame({"a": ["x", "y"]}).with_columns(
        lev=levenshtein(pl.col("a"), pl.lit(None, dtype=pl.Utf8))
    )
    assert df["lev"].to_list() == [None, None]
    with pytest.raises(ValueError, match="null literal"):
        st.compute("levenshtein", ["x", "y"], st.lit(None))


def test_minipl_errors():
    from strsim_tpu import levenshtein, minipl as pl

    with pytest.raises(pl.ColumnNotFoundError):
        pl.DataFrame({"a": ["x"]}).with_columns(
            lev=levenshtein(pl.col("a"), pl.col("missing"))
        )
    with pytest.raises(pl.ShapeError):
        pl.DataFrame({"a": ["x", "y"], "b": ["z"]})


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
