"""Device kernels (XLA integer-stat path) vs the trusted oracle.

The kernels must produce the oracle's exact integer statistics — distance,
jaro (m, t), prefix length, multiset intersection — on golden strings and on
randomized Unicode fuzz inputs.
"""
import random

import numpy as np
import jax.numpy as jnp
import pytest

from strsim_tpu.ops import oracle, stats
from strsim_tpu.utils import encode as enc


def _tiles(pairs, width=None):
    a = enc.encode_column([p[0] for p in pairs], pad=enc.PAD_A, width=width)
    b = enc.encode_column([p[1] for p in pairs], pad=enc.PAD_B, width=width)
    w = width or max(a.width, b.width)
    a = enc._repad(a, enc.PAD_A, w)
    b = enc._repad(b, enc.PAD_B, w)
    return (
        jnp.asarray(a.codes),
        jnp.asarray(b.codes),
        jnp.asarray(a.lengths),
        jnp.asarray(b.lengths),
    )


def _nonempty(pairs):
    return [(a, b) for a, b in pairs if a and b]


def _rand_pairs(rng, n, maxlen, alphabet):
    out = []
    for _ in range(n):
        la = rng.randrange(0, maxlen + 1)
        lb = rng.randrange(0, maxlen + 1)
        out.append(
            (
                "".join(rng.choice(alphabet) for _ in range(la)),
                "".join(rng.choice(alphabet) for _ in range(lb)),
            )
        )
    return out


ALPHABETS = [
    "ab",  # high collision rate → stresses greedy matching and transpositions
    "abcde",
    "abcdefghijklmnopqrstuvwxyz",
    "aé日𝄞",  # multi-plane Unicode incl. astral 𝄞
]


@pytest.fixture(scope="module")
def fuzz_pairs():
    rng = random.Random(20260816)
    pairs = []
    for alphabet in ALPHABETS:
        pairs += _rand_pairs(rng, 120, 12, alphabet)
        pairs += _rand_pairs(rng, 30, 50, alphabet)
    return pairs


def test_levenshtein_kernel_golden(golden):
    pairs = _nonempty([(a, b) for a, b, _ in golden["levenshtein"]])
    ca, cb, la, lb = _tiles(pairs)
    d = np.asarray(stats.levenshtein_distance(ca, cb, la, lb))
    want = np.array([oracle.levenshtein_distance(a, b) for a, b in pairs])
    np.testing.assert_array_equal(d, want)


def test_levenshtein_kernel_fuzz(fuzz_pairs):
    pairs = _nonempty(fuzz_pairs)
    ca, cb, la, lb = _tiles(pairs)
    d = np.asarray(stats.levenshtein_distance(ca, cb, la, lb))
    want = np.array([oracle.levenshtein_distance(a, b) for a, b in pairs])
    np.testing.assert_array_equal(d, want)


def test_jaro_kernel_golden(golden):
    pairs = _nonempty(
        [(a, b) for a, b, _ in golden["jaro"] + golden["jaro_winkler"]]
    )
    pairs = [(a, b) for a, b in pairs if not (len(a) == 1 and len(b) == 1)]
    ca, cb, la, lb = _tiles(pairs)
    m, t = (np.asarray(x) for x in stats.jaro_match_stats(ca, cb, la, lb))
    want = [oracle.jaro_stats(a, b) for a, b in pairs]
    np.testing.assert_array_equal(m, np.array([w[0] for w in want]))
    np.testing.assert_array_equal(t, np.array([w[1] for w in want]))


def test_jaro_kernel_fuzz(fuzz_pairs):
    pairs = [
        (a, b)
        for a, b in _nonempty(fuzz_pairs)
        if not (len(a) == 1 and len(b) == 1)
    ]
    ca, cb, la, lb = _tiles(pairs)
    m, t = (np.asarray(x) for x in stats.jaro_match_stats(ca, cb, la, lb))
    want = [oracle.jaro_stats(a, b) for a, b in pairs]
    np.testing.assert_array_equal(m, np.array([w[0] for w in want]))
    np.testing.assert_array_equal(t, np.array([w[1] for w in want]))


def test_prefix_kernel(fuzz_pairs):
    pairs = _nonempty(fuzz_pairs)
    ca, cb, la, lb = _tiles(pairs)
    p = np.asarray(stats.shared_prefix_length(ca, cb))
    want = np.array([oracle.shared_prefix_length(a, b) for a, b in pairs])
    np.testing.assert_array_equal(p, want)


def test_multiset_kernel_golden(golden):
    pairs = _nonempty([(a, b) for a, b, _ in golden["jaccard"]])
    ca, cb, la, lb = _tiles(pairs)
    inter = np.asarray(stats.multiset_intersection(ca, cb, la, lb))
    want = np.array([oracle.multiset_intersection(a, b) for a, b in pairs])
    np.testing.assert_array_equal(inter, want)


def test_multiset_kernel_fuzz(fuzz_pairs):
    pairs = _nonempty(fuzz_pairs)
    ca, cb, la, lb = _tiles(pairs)
    inter = np.asarray(stats.multiset_intersection(ca, cb, la, lb))
    want = np.array([oracle.multiset_intersection(a, b) for a, b in pairs])
    np.testing.assert_array_equal(inter, want)


def test_multiset_table_impl_via_config():
    import strsim_tpu as st

    cfg = st.get_config().replace(multiset_impl="table", equal_fast_path=False)
    col_a = ["myers", "phillips", "aabbcc"]
    col_b = ["myres", "philips", "abcabc"]
    got = st.compute("jaccard", col_a, col_b, config=cfg)
    want = np.array([oracle.ORACLES["jaccard"](a, b) for a, b in zip(col_a, col_b)])
    assert got.tobytes() == want.tobytes()


def test_multiset_chunked_kernel_fuzz(fuzz_pairs):
    from strsim_tpu.ops.multiset_loop import multiset_intersection_chunked

    pairs = _nonempty(fuzz_pairs)
    ca, cb, la, lb = _tiles(pairs)
    inter = np.asarray(multiset_intersection_chunked(ca, cb, la, lb))
    want = np.array([oracle.multiset_intersection(a, b) for a, b in pairs])
    np.testing.assert_array_equal(inter, want)


def test_multiset_chunked_wide_dynamic_path():
    """Width > 63 exercises the chunked kernel's dynamic chunk loop."""
    from strsim_tpu.ops.multiset_loop import multiset_intersection_chunked

    rng = random.Random(20260818)
    pairs = _nonempty(_rand_pairs(rng, 64, 100, "abcd"))
    ca, cb, la, lb = _tiles(pairs, width=127)
    inter = np.asarray(multiset_intersection_chunked(ca, cb, la, lb))
    want = np.array([oracle.multiset_intersection(a, b) for a, b in pairs])
    np.testing.assert_array_equal(inter, want)


@pytest.mark.parametrize("batch", [7, 8, 12, 520])
def test_sublane_fold_any_batch_size(batch):
    """The sublane-packed Myers/jaro kernels must stay exact for batches not
    divisible by 8 (S falls back to 1) and for folded batches alike."""
    from strsim_tpu.ops.jaro_bitmask import jaro_match_stats_bitmask
    from strsim_tpu.ops.levenshtein_myers import levenshtein_distance_myers

    rng = random.Random(batch)
    pairs = _nonempty(_rand_pairs(rng, batch, 14, "abcde"))[:batch]
    while len(pairs) < batch:
        pairs.append(("x", "xy"))
    ca, cb, la, lb = _tiles(pairs, width=15)
    d = np.asarray(levenshtein_distance_myers(ca, cb, la, lb))
    np.testing.assert_array_equal(
        d, np.array([oracle.levenshtein_distance(a, b) for a, b in pairs])
    )
    m, t = (np.asarray(x) for x in jaro_match_stats_bitmask(ca, cb, la, lb))
    want = [oracle.jaro_stats(a, b) for a, b in pairs]
    one_one = [(len(a) == 1 and len(b) == 1) for a, b in pairs]
    want_m = [
        (1 if a == b else 0) if oo else w[0]
        for (a, b), oo, w in zip(pairs, one_one, want)
    ]
    np.testing.assert_array_equal(m, np.array(want_m))
    np.testing.assert_array_equal(
        t, np.array([0 if oo else w[1] for oo, w in zip(one_one, want)])
    )


def test_jaro_adversarial_transpositions():
    """Heavy-repeat and alternating strings stress the greedy window +
    rank-match transposition count."""
    pairs = [
        ("ababababab", "bababababa"),
        ("aaaaabbbbb", "bbbbbaaaaa"),
        ("abcabcabc", "cbacbacba"),
        ("aaaaaaaaaa", "aaaaabaaaa"),
        ("abab", "bbaa"),
        ("aabb", "bbaa"),
    ]
    ca, cb, la, lb = _tiles(pairs)
    m, t = (np.asarray(x) for x in stats.jaro_match_stats(ca, cb, la, lb))
    want = [oracle.jaro_stats(a, b) for a, b in pairs]
    np.testing.assert_array_equal(m, np.array([w[0] for w in want]))
    np.testing.assert_array_equal(t, np.array([w[1] for w in want]))


def test_forced_pack2_contract_debug_check(monkeypatch):
    """ADVICE r3: forcing jaro_impl='pallas_scan_h' on tiles whose codepoints
    exceed 16 bits silently corrupts the transposition count (two codepoints
    share a 32-bit compaction slot). STRSIM_DEBUG_PACK_CONTRACT=1 turns that
    contract violation into a host-side error before dispatch."""
    import strsim_tpu as st

    monkeypatch.setenv("STRSIM_DEBUG_PACK_CONTRACT", "1")
    cfg = st.get_config().replace(jaro_impl="pallas_scan_h", equal_fast_path=False)
    col_a = ["a\U0001F600b", "name"]  # astral codepoint >= U+10000
    col_b = ["ab", "mane"]
    with pytest.raises(ValueError, match="halfword compaction"):
        st.compute("jaro", col_a, col_b, config=cfg)
