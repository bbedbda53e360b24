"""EXTENSION measures (not in the reference): cosine, overlap, hamming,
lcs_seq. Bit-exact lock between the pipeline (device kernels + host
finalizers) and the pure-Python oracles, plus an independent classic-DP
cross-check for the bit-parallel LCS kernel."""
import random

import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.ops.oracle import ORACLES

EXT_MEASURES = ("cosine", "overlap", "hamming", "lcs_seq", "indel", "osa", "soundex")


def _corpus(n=400):
    rng = random.Random(7)
    alphabets = ["ab", "abcdefgh", "aé日𝄞x"]
    rows = []
    for i in range(n):
        alpha = alphabets[i % 3]
        a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 70)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 70)))
        if i % 13 == 0:
            b = a
        rows.append((a, b))
    rows += [("", ""), ("", "x"), ("x", ""), ("a", "a"), ("ab", "ba")]
    return rows


@pytest.fixture(scope="module")
def corpus():
    return _corpus()


def _lcs_dp(a, b):
    m, n = len(a), len(b)
    prev = [0] * (n + 1)
    for i in range(1, m + 1):
        cur = [0] * (n + 1)
        for j in range(1, n + 1):
            cur[j] = (
                prev[j - 1] + 1 if a[i - 1] == b[j - 1] else max(prev[j], cur[j - 1])
            )
        prev = cur
    return prev[n]


def test_lcs_oracle_matches_classic_dp(corpus):
    from strsim_tpu.ops.oracle import lcs_length

    for a, b in corpus:
        assert lcs_length(a, b) == _lcs_dp(a, b), (a, b)


def test_lcs_kernel_matches_dp(corpus):
    """The bit-parallel V=(V+U)|(V^U) kernel vs the classic DP, through the
    encode path (covers multiword widths, empties, unicode)."""
    import jax.numpy as jnp

    from strsim_tpu.ops.lcs import lcs_length as lcs_kernel
    from strsim_tpu.utils import encode as enc

    for width in (15, 63):
        pairs = [
            (a, b) for a, b in corpus if max(len(a), len(b)) <= width
        ]
        ca = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=width)
        cb = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=width)
        got = np.asarray(
            lcs_kernel(
                jnp.asarray(ca.codes),
                jnp.asarray(cb.codes),
                jnp.asarray(ca.lengths),
                jnp.asarray(cb.lengths),
            )
        )
        want = np.array([_lcs_dp(a, b) for a, b in pairs])
        np.testing.assert_array_equal(got, want)


def test_osa_known_values():
    """Transposition semantics: adjacent swap costs 1; the classic OSA-vs-
    unrestricted-Damerau separator ca/abc costs 3 (no substring edited twice)."""
    from strsim_tpu.ops.oracle import osa_distance

    assert osa_distance("ab", "ba") == 1
    assert osa_distance("ca", "abc") == 3  # unrestricted Damerau would be 2
    assert osa_distance("abcdef", "abdcef") == 1
    assert osa_distance("kitten", "sitting") == 3  # no transpositions: = lev
    assert st.osa(["ab"], ["ba"])[0] == 0.5


def test_osa_kernel_matches_oracle_dp(corpus):
    """The bit-parallel Hyyrö D0 kernel vs the classic 3-row OSA DP, through
    the encode path (covers multiword widths W=1/2/3 — the cross-word TR and
    HP/HN shift carries — plus empties and unicode)."""
    import jax.numpy as jnp

    from strsim_tpu.ops.oracle import osa_distance
    from strsim_tpu.ops.osa_myers import osa_distance_myers
    from strsim_tpu.utils import encode as enc

    for width in (15, 63, 70):
        pairs = [
            (a, b)
            for a, b in corpus
            if max(len(a), len(b)) <= width and len(a) >= 1 and len(b) >= 1
        ]
        ca = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=width)
        cb = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=width)
        got = np.asarray(
            osa_distance_myers(
                jnp.asarray(ca.codes),
                jnp.asarray(cb.codes),
                jnp.asarray(ca.lengths),
                jnp.asarray(cb.lengths),
            )
        )
        want = np.array([osa_distance(a, b) for a, b in pairs])
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("measure", EXT_MEASURES)
def test_pipeline_matches_oracle_bit_exact(corpus, measure):
    col_a = [a for a, _ in corpus]
    col_b = [b for _, b in corpus]
    want = np.array([ORACLES[measure](a, b) for a, b in corpus])
    got = st.compute(measure, col_a, col_b)
    assert got.tobytes() == want.tobytes()
    # and through the kernels with the fast paths off
    cfg = st.get_config().replace(equal_fast_path=False, host_short_circuit_rows=0)
    got2 = st.compute(measure, col_a, col_b, config=cfg)
    assert got2.tobytes() == want.tobytes()


def test_fused_with_core_measures(corpus):
    """Extensions fuse with the reference measures in one device pass
    (cosine/overlap share the inter stat with jaccard/dice)."""
    col_a = [a for a, _ in corpus]
    col_b = [b for _, b in corpus]
    measures = ("jaccard", "cosine", "overlap", "lcs_seq", "indel", "hamming", "osa")
    out = st.compute_many(measures, col_a, col_b)
    for m in measures:
        want = np.array([ORACLES[m](a, b) for a, b in corpus])
        assert out[m].tobytes() == want.tobytes(), m


def test_nulls_propagate():
    out = st.compute_many(("cosine", "hamming"), ["ab", None], ["ab", "x"])
    assert out["cosine"][0] == 1.0 and np.isnan(out["cosine"][1])
    assert out["hamming"][0] == 1.0 and np.isnan(out["hamming"][1])
