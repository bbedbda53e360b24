"""Differential lock: every implementation of every measure must agree
bit-for-float on one shared mixed corpus (unicode, empties, equals, len-1,
cross-bucket lengths, overflow)."""
import random

import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.ops.oracle import ORACLES

CORE_MEASURES = ("jaccard", "jaro", "jaro_winkler", "levenshtein", "sorensen_dice")
from strsim_tpu.native import native_available, native_compute_strings


def _corpus(n=600):
    rng = random.Random(42)
    alphabets = ["ab", "abcdefgh", "aé日𝄞x"]
    rows = []
    for i in range(n):
        alpha = alphabets[i % 3]
        la = rng.randrange(0, 70)
        lb = rng.randrange(0, 70)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        if i % 13 == 0:
            b = a  # equal pair
        if i % 29 == 0:
            a = a[:1]
            b = b[:1]  # len-0/1 pairs
        rows.append((a, b))
    rows.append(("x" * 800, "x" * 799 + "y"))  # overflow bucket
    return rows


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


@pytest.mark.parametrize("measure", CORE_MEASURES)
def test_all_implementations_agree(corpus, measure):
    col_a = [a for a, _ in corpus]
    col_b = [b for _, b in corpus]
    want = np.array([ORACLES[measure](a, b) for a, b in corpus])

    got_xla = st.compute(measure, col_a, col_b)
    assert got_xla.tobytes() == want.tobytes(), "xla pipeline"

    cfg = st.get_config().replace(
        levenshtein_impl="pallas", jaro_impl="pallas", equal_fast_path=False
    )
    got_pl = st.compute(measure, col_a, col_b, config=cfg)
    assert got_pl.tobytes() == want.tobytes(), "pallas pipeline"

    if native_available():
        got_nat = native_compute_strings(measure, col_a, col_b)
        assert got_nat.tobytes() == want.tobytes(), "native"


@pytest.mark.parametrize(
    "lev,jaro,multiset",
    [
        ("myers", "bitmask", "chunked"),  # XLA production kernels
        ("pallas_scan", "bitmask", "pallas_scan"),  # TPU "auto" default at w<=31
        ("myers", "bitmask", "xla"),  # 1-position-per-step multiset scan
        ("wavefront", "scan", "table"),  # round-1 kernels stay locked
    ],
)
@pytest.mark.parametrize("measure", CORE_MEASURES)
def test_impl_matrix_agrees(corpus, measure, lev, jaro, multiset):
    rows = corpus
    if "pallas_scan" in (lev, multiset):
        # keep the forced-pallas row inside the W=1 widths: the W=2
        # multiword bodies (widths 33-64) are TPU-only in production and
        # take minutes per width under the CPU interpreter (see
        # tests/test_pallas.py for the full CI-cost rationale + the
        # TPU-side parity evidence covering them)
        rows = [(a, b) for a, b in corpus if max(len(a), len(b)) <= 31]
        assert len(rows) >= 150
    col_a = [a for a, _ in rows]
    col_b = [b for _, b in rows]
    want = np.array([ORACLES[measure](a, b) for a, b in rows])
    cfg = st.get_config().replace(
        levenshtein_impl=lev, jaro_impl=jaro, multiset_impl=multiset,
        equal_fast_path=False,
    )
    got = st.compute(measure, col_a, col_b, config=cfg)
    assert got.tobytes() == want.tobytes(), f"{lev}/{jaro}/{multiset}"
