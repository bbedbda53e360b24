"""Bigram-multiset extension measures (not in the reference)."""
import random

import numpy as np

import strsim_tpu as st
from strsim_tpu.ops.oracle import ORACLES


def test_bigram_examples():
    # "night" vs "nacht": bigrams {ni,ig,gh,ht} vs {na,ac,ch,ht} -> inter 1
    got = st.compute("jaccard_bigram", ["night"], ["nacht"])
    assert abs(got[0] - 1.0 / 7.0) < 1e-12
    got = st.compute("sorensen_dice_bigram", ["night"], ["nacht"])
    assert abs(got[0] - 2.0 / 8.0) < 1e-12


def test_bigram_edges():
    out = st.compute_many(
        ["jaccard_bigram", "sorensen_dice_bigram"],
        ["", "a", "ab", "ab", None],
        ["", "a", "ab", "cd", "x"],
    )
    for m in out:
        v = out[m]
        assert v[0] == 1.0      # both empty
        assert v[1] == 1.0      # equal len-1 (fast path)
        assert v[2] == 1.0      # equal
        assert v[3] == 0.0      # disjoint bigrams
        assert np.isnan(v[4])   # null


def test_bigram_kernel_vs_oracle_fuzz():
    rng = random.Random(17)
    pairs = [
        (
            "".join(rng.choice("abc") for _ in range(rng.randrange(0, 20))),
            "".join(rng.choice("abc") for _ in range(rng.randrange(0, 20))),
        )
        for _ in range(400)
    ]
    col_a = [a for a, _ in pairs]
    col_b = [b for _, b in pairs]
    for m in ("jaccard_bigram", "sorensen_dice_bigram"):
        got = st.compute(m, col_a, col_b)
        want = np.array([ORACLES[m](a, b) for a, b in pairs])
        assert got.tobytes() == want.tobytes(), m
