"""Edge-case cross product: every pair from a pool of pathological strings,
through the full pipeline, bit-exact vs oracle for all core measures."""
import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.ops.oracle import ORACLES

POOL = [
    "", "a", "b", "aa", "ab", "ba", "aaa", "ab" * 30,
    "é", "éé", "aé", "日本", "𝄞", "a𝄞", "\x00", "a\x00b",
    " ", "  a  ", "abcdefghijklmnopqrstuvwxyz",
    "x" * 63, "x" * 64, "x" * 65,
]


@pytest.mark.parametrize(
    "measure", ["levenshtein", "jaro", "jaro_winkler", "jaccard", "sorensen_dice"]
)
def test_edge_cross_product(measure):
    pairs = [(a, b) for a in POOL for b in POOL]
    col_a = [a for a, _ in pairs]
    col_b = [b for _, b in pairs]
    got = st.compute(measure, col_a, col_b)
    want = np.array([ORACLES[measure](a, b) for a, b in pairs])
    bad = np.nonzero(got != want)[0]
    assert bad.size == 0, f"{measure}: {[(pairs[i], got[i], want[i]) for i in bad[:3]]}"
