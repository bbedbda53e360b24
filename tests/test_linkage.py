"""Top-k candidate matching vs brute-force oracle ranking."""
import numpy as np
import pytest

from strsim_tpu.models.linkage import top_k_matches
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
    idx, scores = top_k_matches(["abc"], ["abc", "abd"], k=10)
    assert idx.shape == (1, 2)
    assert idx[0, 0] == 0


def test_topk_degenerate_inputs():
    idx, scores = top_k_matches([], ["a", "b"], k=3)
    assert idx.shape == (0, 2)
    idx, scores = top_k_matches(["a"], [], k=3)
    assert idx.shape == (1, 0)
    idx, scores = top_k_matches(["a"], ["a"], k=0)
    assert idx.shape == (1, 0)
