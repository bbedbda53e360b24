"""Top-k candidate matching (single- and multi-field) vs brute-force oracle
ranking."""
import numpy as np
import pytest

from strsim_tpu.models.linkage import (
    ensemble_scores,
    top_k_matches,
    top_k_matches_multi,
)
from strsim_tpu.ops.oracle import ORACLES


CANDIDATES = [
    "phillips", "philips", "phelps", "smith", "smyth", "schmidt",
    "johnson", "jonson", "johnston", None, "washington", "",
]


def brute_topk(query, k, measure="jaro_winkler"):
    scores = [
        (ORACLES[measure](query, c), i)
        for i, c in enumerate(CANDIDATES)
        if c is not None
    ]
    scores.sort(key=lambda t: (-t[0], t[1]))
    return scores[:k]


@pytest.mark.parametrize("measure", ["jaro_winkler", "levenshtein", "jaccard"])
def test_topk_matches_oracle_ranking(measure):
    queries = ["phillips", "jonsen", "washingtom"]
    idx, scores = top_k_matches(queries, CANDIDATES, measure=measure, k=3,
                                query_block=2, candidate_block=5)
    for qi, q in enumerate(queries):
        want = brute_topk(q, 3, measure)
        got_scores = scores[qi]
        want_scores = np.array([s for s, _ in want], dtype=np.float32)
        np.testing.assert_allclose(got_scores, want_scores, atol=2e-6)
        # top-1 index must agree when the winner is unique
        if len(want) > 1 and want[0][0] - want[1][0] > 1e-5:
            assert idx[qi, 0] == want[0][1]


def test_topk_null_query_and_small_k():
    idx, scores = top_k_matches(["phillips", None], CANDIDATES, k=2)
    assert idx[1, 0] == -1 and np.isnan(scores[1]).all()
    assert idx[0, 0] == 0 and scores[0, 0] == 1.0  # exact self-match wins


def test_topk_k_larger_than_candidates():
    # output is always [Q, k]: columns past the candidate count are -1/NaN
    idx, scores = top_k_matches(["abc"], ["abc", "abd"], k=10)
    assert idx.shape == (1, 10) and scores.shape == (1, 10)
    assert idx[0, 0] == 0
    assert (idx[0, 2:] == -1).all() and np.isnan(scores[0, 2:]).all()


def test_topk_degenerate_inputs():
    idx, scores = top_k_matches([], ["a", "b"], k=3)
    assert idx.shape == (0, 3)
    idx, scores = top_k_matches(["a"], [], k=3)
    assert idx.shape == (1, 3)
    assert (idx == -1).all() and np.isnan(scores).all()
    idx, scores = top_k_matches(["a"], ["a"], k=0)
    assert idx.shape == (1, 0)


def test_topk_multi_k_larger_than_candidates():
    idx, scores = top_k_matches_multi([["abc"]], [["abc", "abd"]], k=4,
                                      measures="jaro")
    assert idx.shape == (1, 4) and scores.shape == (1, 4)
    assert idx[0, 0] == 0
    assert (idx[0, 2:] == -1).all() and np.isnan(scores[0, 2:]).all()


def test_topk_k_exceeds_candidate_block():
    # regression: the scan carry must be k wide even when a candidate block
    # is narrower than k
    cands = ["phillips", "philips", "phelps", "smith", "smyth",
             "schmidt", "johnson", "jonson", "johnston", "washington"]
    idx, scores = top_k_matches(["philips"], cands, k=8, candidate_block=3,
                                measure="jaro")
    assert idx.shape == (1, 8)
    want = brute_topk("philips", 8, "jaro")
    np.testing.assert_allclose(
        scores[0], np.array([s for s, _ in want], dtype=np.float32), atol=2e-6
    )


# ---------------------------------------------------------------------------
# Multi-field ensemble matching
# ---------------------------------------------------------------------------

Q_GIVEN = ["john", "mary", None, "willam"]
Q_SUR = ["phillips", "smyth", "johnson", None]
C_GIVEN = ["jon", "john", "marie", None, "william", "mary"]
C_SUR = ["philips", "phelps", "smith", "jonson", None, "smyth"]
MEASURES = ("jaro_winkler", "levenshtein")
WEIGHTS = (1.0, 2.0)


def brute_multi(qrec, missing, k=3):
    rows = []
    for i, crec in enumerate(zip(C_GIVEN, C_SUR)):
        num = den = 0.0
        anyv = False
        for f, (qv, cv) in enumerate(zip(qrec, crec)):
            if qv is None or cv is None:
                continue
            anyv = True
            num += WEIGHTS[f] * ORACLES[MEASURES[f]](qv, cv)
            den += WEIGHTS[f]
        if missing == "zero":
            den = sum(WEIGHTS) if anyv else 0.0
        if anyv and den > 0:
            rows.append((num / den, i))
    rows.sort(key=lambda t: (-t[0], t[1]))
    return rows[:k]


@pytest.mark.parametrize("missing", ["renormalize", "zero"])
def test_topk_multi_oracle_ranking(missing):
    idx, scores = top_k_matches_multi(
        [Q_GIVEN, Q_SUR], [C_GIVEN, C_SUR],
        measures=MEASURES, weights=WEIGHTS, k=3, missing=missing,
        query_block=2, candidate_block=4,
    )
    for qi, qrec in enumerate(zip(Q_GIVEN, Q_SUR)):
        want = brute_multi(qrec, missing)
        np.testing.assert_allclose(
            scores[qi], np.array([s for s, _ in want], dtype=np.float32),
            atol=2e-6, err_msg=f"query {qi} ({qrec})",
        )
        if len(want) > 1 and want[0][0] - want[1][0] > 1e-5:
            assert idx[qi, 0] == want[0][1]


def test_topk_multi_all_null_query_and_unmatchable_candidate():
    idx, scores = top_k_matches_multi(
        [[None, "john"], [None, "phillips"]],
        [[None, "john"], [None, "phillips"]],
        measures="jaro", k=2,
    )
    # all-null query record: no basis -> -1 / NaN
    assert (idx[0] == -1).all() and np.isnan(scores[0]).all()
    # all-null candidate record 0 never matches
    assert 0 not in idx[1]
    assert idx[1, 0] == 1 and scores[1, 0] == 1.0


def test_topk_multi_validation():
    with pytest.raises(ValueError):
        top_k_matches_multi([["a"]], [["a"], ["b"]])  # field count mismatch
    with pytest.raises(ValueError):
        top_k_matches_multi([["a"]], [["a"]], measures=("jaro", "jaro"))
    with pytest.raises(ValueError):
        top_k_matches_multi([["a"]], [["a"]], weights=(0.0,))
    with pytest.raises(ValueError):
        top_k_matches_multi([["a"]], [["a"]], missing="drop")
    with pytest.raises(ValueError):
        top_k_matches_multi([["a", "b"], ["c"]], [["d"], ["e"]])


@pytest.mark.parametrize("missing", ["renormalize", "zero"])
def test_ensemble_scores_exact(missing):
    a_fields = [["john", "mary", None, "anne"], ["phillips", None, "x", None]]
    b_fields = [["jon", "marie", "kate", None], ["philips", "smith", "y", None]]
    got = ensemble_scores(a_fields, b_fields, measures=MEASURES,
                          weights=WEIGHTS, missing=missing)
    for i in range(4):
        num = den = 0.0
        anyv = False
        for f in range(2):
            qv, cv = a_fields[f][i], b_fields[f][i]
            if qv is None or cv is None:
                continue
            anyv = True
            num += WEIGHTS[f] * ORACLES[MEASURES[f]](qv, cv)
            den += WEIGHTS[f]
        if missing == "zero":
            den = sum(WEIGHTS) if anyv else 0.0
        if anyv and den > 0:
            assert got[i] == num / den, i  # exact f64: same op order
        else:
            assert np.isnan(got[i]), i


def test_ensemble_matches_topk_rescoring():
    """ensemble_scores on the pairs returned by top_k_matches_multi agrees
    with the device ensemble at f32 tolerance."""
    idx, scores = top_k_matches_multi(
        [Q_GIVEN, Q_SUR], [C_GIVEN, C_SUR],
        measures=MEASURES, weights=WEIGHTS, k=2,
    )
    for qi in range(len(Q_GIVEN)):
        for r in range(2):
            ci = idx[qi, r]
            if ci < 0:
                continue
            exact = ensemble_scores(
                [[Q_GIVEN[qi]], [Q_SUR[qi]]],
                [[C_GIVEN[ci]], [C_SUR[ci]]],
                measures=MEASURES,
                weights=WEIGHTS,
            )
            np.testing.assert_allclose(scores[qi, r], exact[0], atol=2e-6)


def test_topk_multi_unicode_and_width_skew():
    """Fields with very different widths and non-ASCII/astral codepoints."""
    qg = ["bjørk", "𝄞clef"]
    qs = ["a-very-long-surname-field", "shrt"]
    cg = ["bjork", "bjørk", "𝄞clef"]
    cs = ["a-very-long-surname-feild", "a-very-long-surname-field", "shrt"]
    idx, scores = top_k_matches_multi(
        [qg, qs], [cg, cs], measures=("jaro", "levenshtein"), k=1
    )
    # exact two-field self-matches exist at candidates 1 and 2
    assert idx[0, 0] == 1 and scores[0, 0] == 1.0
    assert idx[1, 0] == 2 and scores[1, 0] == 1.0


def test_dedup_top_k_excludes_self():
    from strsim_tpu.models.linkage import dedup_top_k

    names = ["phillips", "philips", "smith", "smyth", "phillips"]
    idx, scores = dedup_top_k([names], measures="jaro_winkler", k=2)
    n = len(names)
    for r in range(n):
        assert r not in idx[r], (r, idx[r])
    # exact duplicate pair (0, 4) must find each other at 1.0
    assert idx[0, 0] == 4 and scores[0, 0] == 1.0
    assert idx[4, 0] == 0 and scores[4, 0] == 1.0
    # near-duplicates pair up
    assert idx[2, 0] == 3 and idx[3, 0] == 2


def test_exclude_index_custom_and_validation():
    # exclude candidate 0 for every query: it may never be returned
    idx, scores = top_k_matches_multi(
        [["phillips", "philips"]], [["phillips", "philips", "phelps"]],
        measures="jaro", k=3, exclude_index=[0, 0],
    )
    assert 0 not in idx
    with pytest.raises(ValueError):
        top_k_matches_multi([["a"]], [["a"]], exclude_index=[0, 1])
