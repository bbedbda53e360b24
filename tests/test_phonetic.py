"""Soundex phonetic encoder (EXTENSION — ops/phonetic.py spec): published
American-Soundex vectors incl. the H/W rule, the packed-code device kernel vs
the Python oracle on both int8 (ASCII) and int32 (unicode) tiles, and the
`soundex` measure through the full pipeline."""
import random

import numpy as np
import pytest

import strsim_tpu as st
from strsim_tpu.ops.oracle import soundex_code

# the National-Archives/census examples (incl. the H/W-rule cases) plus
# engine-spec edges: case folding, non-letters skipped, letterless strings
GOLDEN = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",   # H transparent: S then C same class -> skipped
    "Ashcroft": "A261",
    "Tymczak": "T522",    # Y resets; C,Z same class -> Z skipped
    "Pfister": "P236",    # first letter's class seeds "previous": F skipped
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "VanDeusen": "V532",
    "lee": "L000",
    "O'Brien": "O165",
    "de la Cruz": "D426",
    "": "",
    "123": "",
    "Çelik": "E420",      # non-ASCII letters are skipped (pre-fold explicitly)
    "Hw": "H000",
    "Wh": "W000",
    "a1b2c3": "A120",
}


def test_golden_codes():
    for s, want in GOLDEN.items():
        assert soundex_code(s) == want, (s, soundex_code(s), want)


def _packed(code: str) -> int:
    return 0 if not code else ord(code[0]) * 1000 + int(code[1:])


@pytest.mark.parametrize("alphabet", ["ascii", "unicode"])
def test_device_kernel_matches_oracle(alphabet):
    from strsim_tpu.ops.phonetic import soundex_code as dev_code
    from strsim_tpu.utils.encode import PAD_A, encode_column

    rng = random.Random(11)
    chars = (
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ '-123"
        if alphabet == "ascii"
        else "abchwyzé日𝄞 HW"
    )
    names = [s for s in GOLDEN if alphabet == "unicode" or s.isascii()] + [
        "".join(rng.choice(chars) for _ in range(rng.randrange(0, 70)))
        for _ in range(500)
    ]
    col = encode_column(names, pad=PAD_A)
    if alphabet == "ascii":
        assert col.codes.dtype == np.int8  # native ASCII fast path exercised
    codes = np.asarray(dev_code(col.codes, col.lengths))
    want = np.array([_packed(soundex_code(s)) for s in names])
    bad = np.nonzero(codes != want)[0]
    assert bad.size == 0, [(names[i], codes[i], want[i]) for i in bad[:3]]


def test_measure_through_pipeline():
    a = ["Robert", "smith", "Washington", None, "", "abc", "123", "Çelik", "x"]
    b = ["Rupert", "smyth", "Washinton", "x", "", "xyz", "456", "elik", ""]
    got = st.compute("soundex", a, b)
    # Robert/Rupert same code; smith/smyth same; Washington/Washinton differ
    # (W252 vs W253); null -> NaN; both-empty -> 1.0; letterless pair shares
    # the empty code -> 1.0; one-empty -> 0.0
    want = np.array([1.0, 1.0, 0.0, np.nan, 1.0, 0.0, 1.0, 1.0, 0.0])
    np.testing.assert_array_equal(got, want)


NYSIIS_GOLDEN = {
    # hand-traced through the documented rule set (ops/oracle.py:nysiis_code)
    "MACINTOSH": "MCANT",   # MAC->MCC, vowels->A, adjacent dedup, -A
    "KNIGHT": "NAGT",       # KN->NN, silent-H rule
    "PHILLIPS": "FALAP",    # PH->FF, trailing S dropped
    "BESSY": "BASY",
    "knight": "NAGT",       # case-insensitive
    "O'Malley": "ONALY",    # non-letters dropped; M->N
    "": "",
    "123": "",
    "A": "A",
    "SCHMIDT": "SNAD",      # SCH->SSS, DT->D ending
    "LAWSON": "LASAN",      # W after vowel -> previous (A), dedup
}


def test_nysiis_golden():
    from strsim_tpu.ops.oracle import nysiis_code

    for s, want in NYSIIS_GOLDEN.items():
        assert nysiis_code(s) == want, (s, nysiis_code(s), want)


def test_nysiis_keys_and_blocking():
    from strsim_tpu.models.blocking import nysiis_keys, top_k_matches_blocked
    from strsim_tpu.ops.oracle import nysiis_code

    names = ["smith", "smitt", None, "", "knight", "night", "smith"]
    keys = nysiis_keys(names)
    assert keys[2] is None and keys[3] == ""
    assert keys[0] == keys[6] == nysiis_code("smith")
    assert keys[0] == keys[1] == "SNAT"  # smith/smitt fold together
    # Y is NOT a NYSIIS vowel: smyth keys apart (SNYT) — documented behavior
    assert nysiis_code("smyth") == "SNYT" != keys[0]
    # knight (KN->NN) vs night (N...) — both NAGT under this rule set
    assert keys[4] == keys[5] == "NAGT"
    idx, sco = top_k_matches_blocked(
        ["smits"], ["smith", "taylor", "smitt"], "levenshtein", k=2, key="nysiis"
    )
    assert idx[0, 0] in (0, 2)  # blocks with the SNAT names only
    assert idx[0, 1] in (0, 2) and idx[0, 1] != idx[0, 0]


def test_native_phonetic_codes_match_oracles():
    """The threaded C++ batch encoder vs the Python oracles, both methods,
    on random strings incl. unicode/nulls/letterless."""
    from strsim_tpu.native import native_available
    from strsim_tpu.native.binding import native_phonetic_codes
    from strsim_tpu.ops.oracle import nysiis_code, soundex_code

    if not native_available():
        pytest.skip("native toolchain unavailable")
    rng = random.Random(23)
    chars = "abchwyzé HWK' nSCHmac123"
    names = [
        "".join(rng.choice(chars) for _ in range(rng.randrange(0, 40)))
        for _ in range(2000)
    ] + [None, "", "MACINTOSH", "knight", "Pfister"]
    for method, oracle in (("nysiis", nysiis_code), ("soundex", soundex_code)):
        got = native_phonetic_codes(names, method)
        for s, g in zip(names, got):
            want = None if s is None else oracle(s)
            assert g == want, (method, s, g, want)


def test_fused_with_core_measures():
    """soundex shares a kernel launch with the core five (stat-union fusion)."""
    a = ["Robert", "catherine", ""]
    b = ["Rupert", "katherine", ""]
    scores = st.compute_many(("soundex", "jaro_winkler", "levenshtein"), a, b)
    assert scores["soundex"][0] == 1.0 and scores["soundex"][1] == 0.0
    assert scores["levenshtein"][2] == 1.0
