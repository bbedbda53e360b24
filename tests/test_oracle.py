"""The host oracle must reproduce every golden case within the reference's own
tolerance (1e-8 absolute, src/expressions/strsim.rs:350)."""
import pytest

from strsim_tpu.ops.oracle import ORACLES

CORE_MEASURES = ("jaccard", "jaro", "jaro_winkler", "levenshtein", "sorensen_dice")

THRESHOLD = 1e-8


@pytest.mark.parametrize("measure", CORE_MEASURES)
def test_oracle_golden(golden, measure):
    fn = ORACLES[measure]
    for a, b, expected in golden[measure]:
        got = fn(a, b)
        assert abs(got - expected) < THRESHOLD, f"{measure}({a!r}, {b!r}) = {got}, want {expected}"


def test_oracle_edge_semantics():
    for name, fn in ORACLES.items():
        assert fn("", "") == 1.0, name
        assert fn("", "abc") == 0.0, name
        assert fn("abc", "") == 0.0, name
        assert fn("same", "same") == 1.0, name


def test_multiset_semantics_anagram():
    # char-multiset (not set, not bigram): anagrams score 1.0 (strsim.rs:1354)
    assert ORACLES["jaccard"]("myers", "myres") == 1.0
    assert ORACLES["sorensen_dice"]("myers", "myres") == 1.0


def test_unicode_chars_not_bytes():
    # é is 2 UTF-8 bytes but 1 char; per-char semantics give distance 1 over len 4
    assert ORACLES["levenshtein"]("café", "cafe") == 1.0 - 1.0 / 4.0
    assert ORACLES["jaccard"]("日本語", "日本話") == 2.0 / 4.0
