"""Normalization steps (EXTENSION — utils/preprocess.py) and their
integration with compute(..., preprocess=...). The contract: preprocessing
changes WHICH strings are compared, never how comparisons are scored —
compute(m, A, B, preprocess=s) ≡ compute(m, pre(A), pre(B))."""
import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.utils.preprocess import preprocess_column


def test_steps():
    col = ["  John   SMITH ", "Çelik", "straße", None, ""]
    got = preprocess_column(col, ("strip", "collapse_spaces"))
    assert got.tolist() == ["John SMITH", "Çelik", "straße", None, ""]
    got = preprocess_column(col, ("casefold",))
    assert got[2] == "strasse"  # full Unicode folding
    got = preprocess_column(col, ("strip_accents",))
    assert got[1] == "Celik"
    got = preprocess_column(["smith john", "b a c"], ("token_sort",))
    assert got.tolist() == ["john smith", "a b c"]
    got = preprocess_column(["b a b a"], ("token_set",))
    assert got.tolist() == ["a b"]
    with pytest.raises(ValueError):
        preprocess_column(col, ("nope",))


def test_null_passthrough_and_idempotence():
    col = ["A  b", None, "x"]
    once = preprocess_column(col, ("casefold", "collapse_spaces", "token_sort"))
    twice = preprocess_column(once, ("casefold", "collapse_spaces", "token_sort"))
    assert once.tolist() == twice.tolist()
    assert once[1] is None


def test_compute_preprocess_equivalence():
    a = ["john smith", "MÜLLER", "  padded  ", None]
    b = ["smith john", "mueller", "padded", "x"]
    steps = ("casefold", "strip_accents", "strip", "collapse_spaces", "token_sort")
    got = st.compute("jaro_winkler", a, b, preprocess=steps)
    want = st.compute(
        "jaro_winkler", preprocess_column(a, steps), preprocess_column(b, steps)
    )
    assert got.tobytes() == want.tobytes()
    assert got[0] == 1.0  # token order neutralized
    assert np.isnan(got[3])


def test_token_sort_makes_order_insensitive():
    scores = st.compute_many(
        ("levenshtein", "jaccard", "indel"),
        ["maria garcia lopez"],
        ["lopez maria garcia"],
        preprocess=("token_sort",),
    )
    for m, v in scores.items():
        assert v[0] == 1.0, m


def test_preprocess_through_expression_layer():
    """preprocess= threads through the measure functions' expression mode
    (minipl map_batches, incl. streaming chunk splits)."""
    from strsim_tpu import minipl as pl

    df = pl.DataFrame(
        {"a": ["john smith", "MÜLLER"], "b": ["smith john", "muller"]}
    )
    out = df.with_columns(
        st.indel(pl.col("a"), pl.col("b"),
                 preprocess=("casefold", "strip_accents", "token_sort"))
    )
    vals = out["indel"].to_list()
    assert vals[0] == 1.0 and vals[1] == 1.0


def test_strip_accents_recovers_soundex_key():
    # unpreprocessed: Ç is skipped (code E420); folded: C420 — matches "Celik"
    got = st.compute("soundex", ["Çelik"], ["Celik"], preprocess=("strip_accents",))
    assert got[0] == 1.0


def test_preprocess_through_linkage_and_blocking():
    """preprocess= threads through both serving paths with the same
    equivalence contract as compute."""
    import strsim_tpu as st
    from strsim_tpu.utils.preprocess import preprocess_column

    queries = ["JOHN  SMITH", "garcia jose"]
    cands = ["smith john", "José García", "taylor ann", None]
    steps = ("casefold", "strip_accents", "collapse_spaces", "token_sort")
    # blocked top-k
    i1, s1 = st.top_k_matches_blocked(queries, cands, "jaro_winkler", k=2,
                                      preprocess=steps)
    i2, s2 = st.top_k_matches_blocked(
        preprocess_column(queries, steps), preprocess_column(cands, steps),
        "jaro_winkler", k=2)
    np.testing.assert_array_equal(i1, i2)
    assert s1.tobytes() == s2.tobytes()
    assert i1[0, 0] == 0 and s1[0, 0] == 1.0  # token order + case neutralized
    assert i1[1, 0] == 1 and s1[1, 0] == 1.0  # accents + order neutralized
    # brute-force f32 serving path agrees on the winner
    i3, _ = st.top_k_matches(queries, cands, "jaro_winkler", k=1, preprocess=steps)
    assert i3[0, 0] == 0 and i3[1, 0] == 1
    # record dedup — key pinned to soundex: under it 'john' (J500) and
    # 'john x' (J520) never block together; the union DEFAULT adds a 2-char
    # prefix key, which correctly pairs them (jw 0.933 >= 0.9)
    i, j, s = st.dedup_records_blocked(
        [["JOHN", "john x"]], measures="jaro_winkler", threshold=0.9,
        key="soundex", preprocess=("casefold",))
    assert (1, 0) not in set(zip(i.tolist(), j.tolist()))  # 'john x' != 'john'
    i, j, s = st.dedup_records_blocked(
        [["JOHN", "john x"]], measures="jaro_winkler", threshold=0.9,
        preprocess=("casefold",))
    assert (1, 0) in set(zip(i.tolist(), j.tolist()))  # union default pairs them
    i, j, s = st.dedup_blocked(["JOHN", "john"], threshold=0.99,
                               preprocess=("casefold",))
    assert (1, 0) in set(zip(i.tolist(), j.tolist()))
