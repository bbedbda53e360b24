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


# ---------------------------------------------------------------------------
# Batch-mesh sharded linkage (VERDICT r2 item 5): query-axis data parallelism
# over the 8 virtual devices must be bit-identical to the single-device path.
# ---------------------------------------------------------------------------


def test_topk_sharded_matches_single_device():
    import jax

    n_dev = min(8, len(jax.devices()))
    queries = ["phillips", "jonsen", None, "washingtom", "smith"] * 5
    ref_i, ref_s = top_k_matches(queries, CANDIDATES, measure="jaro_winkler",
                                 k=4, candidate_block=5)
    got_i, got_s = top_k_matches(queries, CANDIDATES, measure="jaro_winkler",
                                 k=4, candidate_block=5,
                                 data_parallel_devices=n_dev)
    np.testing.assert_array_equal(got_i, ref_i)
    np.testing.assert_array_equal(got_s, ref_s)


def test_topk_multi_sharded_matches_single_device():
    import jax

    n_dev = min(8, len(jax.devices()))
    qf = [Q_GIVEN * 3, Q_SUR * 3]
    cf = [C_GIVEN, C_SUR]
    kw = dict(measures=MEASURES, weights=WEIGHTS, k=3, candidate_block=4)
    ref_i, ref_s = top_k_matches_multi(qf, cf, **kw)
    got_i, got_s = top_k_matches_multi(qf, cf, data_parallel_devices=n_dev, **kw)
    np.testing.assert_array_equal(got_i, ref_i)
    np.testing.assert_array_equal(got_s, ref_s)


def test_dedup_sharded_matches_single_device():
    import jax

    n_dev = min(8, len(jax.devices()))
    from strsim_tpu.models.linkage import dedup_top_k

    names = ["phillips", "philips", "smith", "smyth", "phillips", "jones"] * 2
    ref = dedup_top_k([names], measures="jaro", k=3)
    got = dedup_top_k([names], measures="jaro", k=3, data_parallel_devices=n_dev)
    np.testing.assert_array_equal(got[0], ref[0])
    np.testing.assert_array_equal(got[1], ref[1])


# ---------------------------------------------------------------------------
# Adversarial f32 ranking ties (VERDICT r2 item 6)
#
# The top-k path ranks on device f32 scores. Jaro scores are rationals with
# denominators up to 3*la*lb*m, so two candidates can have exact f64 scores
# that differ by ~1e-9 — BELOW one f32 ulp — while being genuinely distinct.
# These tests construct such candidates (plus an exact duplicate), and assert
# (a) the returned (index, score) pairs are deterministic, (b) f32-tied
# groups return ascending candidate indices (lax.top_k's stable tie break),
# and (c) the documented exact-f64 rescoring companion restores the
# reference order that f32 cannot see.
# ---------------------------------------------------------------------------

_TIE_LA = 509


def _tie_query() -> str:
    return "".join(chr(0x4E00 + i) for i in range(_TIE_LA))


def _tie_candidate(q: str, m: int, lb: int, t_raw: int) -> str:
    """A candidate realizing exact jaro stats (m, t_raw) against `q`: the
    first m query chars (each adjacent swap contributes 2 raw transpositions)
    followed by lb-m junk chars disjoint from the query alphabet. The greedy
    window bound max(la,lb)//2-1 >= 253 covers every constructed position."""
    mm = [q[i] for i in range(m)]
    for p in range(t_raw // 2):
        mm[2 * p], mm[2 * p + 1] = mm[2 * p + 1], mm[2 * p]
    junk = [chr(0x6000 + 16 * lb + i) for i in range(lb - m)]
    return "".join(mm + junk)


# (m, lb, t_raw) stat pairs whose exact f64 jaro scores vs the 509-char query
# differ by ~1e-9..2e-8 (distinct) yet collide in f32. LO scores strictly
# below HI in exact f64.
_TIE_LO = (10, 157, 4)
_TIE_HI = (12, 454, 4)


def test_f32_tie_premise_and_exact_rescoring_restores_order():
    import strsim_tpu as st

    q = _tie_query()
    c_lo = _tie_candidate(q, *_TIE_LO)
    c_hi = _tie_candidate(q, *_TIE_HI)
    exact = st.compute("jaro", [q, q], [c_lo, c_hi])
    # premise: genuinely distinct in f64, indistinguishable in f32
    assert exact[0] < exact[1]
    assert np.float32(exact[0]) == np.float32(exact[1])

    cands = [c_lo, c_hi, c_lo]  # exact duplicate of c_lo at index 2
    idx1, sc1 = top_k_matches([q], cands, measure="jaro", k=3)
    idx2, sc2 = top_k_matches([q], cands, measure="jaro", k=3)
    # (a) deterministic across runs
    np.testing.assert_array_equal(idx1, idx2)
    np.testing.assert_array_equal(sc1, sc2)
    # (b) the whole group is one f32 tie -> stable ascending-index order
    assert len(set(sc1[0].tolist())) == 1
    np.testing.assert_array_equal(idx1[0], [0, 1, 2])
    # (c) exact-f64 rescoring of the returned pairs recovers the true order
    resc = st.compute("jaro", [q] * 3, [cands[i] for i in idx1[0]])
    true_winner = idx1[0][int(np.argmax(resc))]
    assert true_winner == 1  # c_hi — invisible to the f32 ranking
    # and the exact duplicates rescore byte-identically
    assert resc[0] == resc[2]


@pytest.mark.parametrize("missing", ["renormalize", "zero"])
def test_f32_tie_multi_deterministic_both_missing_policies(missing):
    import strsim_tpu as st

    q = _tie_query()
    c_lo = _tie_candidate(q, *_TIE_LO)
    c_hi = _tie_candidate(q, *_TIE_HI)
    cands = [c_lo, c_hi, c_lo]
    # second field null on the query side: exercises the missing policy on
    # every candidate while field 1 carries the f32-tied scores
    qf = [[q], [None]]
    cf = [cands, ["x", None, "x"]]
    runs = [
        top_k_matches_multi(qf, cf, measures=("jaro", "levenshtein"),
                            weights=(2.0, 1.0), k=3, missing=missing)
        for _ in range(2)
    ]
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_array_equal(runs[0][1], runs[1][1])
    idx, sc = runs[0]
    np.testing.assert_array_equal(idx[0], [0, 1, 2])  # stable f32 tie order
    # exact rescoring companion (same field order contract) breaks the tie
    resc = ensemble_scores(
        [[q] * 3, [None] * 3],
        [[cands[i] for i in idx[0]], ["x", None, "x"]],
        measures=("jaro", "levenshtein"), weights=(2.0, 1.0), missing=missing,
    )
    assert resc[1] == max(resc)  # c_hi wins in exact f64


def test_exclude_index_custom_and_validation():
    # exclude candidate 0 for every query: it may never be returned
    idx, scores = top_k_matches_multi(
        [["phillips", "philips"]], [["phillips", "philips", "phelps"]],
        measures="jaro", k=3, exclude_index=[0, 0],
    )
    assert 0 not in idx
    with pytest.raises(ValueError):
        top_k_matches_multi([["a"]], [["a"]], exclude_index=[0, 1])
