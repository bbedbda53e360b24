"""Ingestion layer: vectorized UCS4 decode, padding sentinels, equality scan."""
import numpy as np
import pytest

from strsim_tpu.utils import encode as enc


def test_basic_roundtrip():
    col = ["abc", "", "héllo", None, "日本語x"]
    e = enc.encode_column(col)
    assert e.codes.shape[0] == 5
    assert list(e.lengths) == [3, 0, 5, 0, 4]
    assert list(e.validity) == [True, True, True, False, True]
    for i, s in enumerate(col):
        if s is not None:
            assert enc.decode_row(e.codes[i], int(e.lengths[i])) == s


def test_padding_sentinels():
    a = enc.encode_column(["ab"], pad=enc.PAD_A, width=4)
    b = enc.encode_column(["ab"], pad=enc.PAD_B, width=4)
    assert list(a.codes[0]) == [97, 98, enc.PAD_A, enc.PAD_A]
    assert list(b.codes[0]) == [97, 98, enc.PAD_B, enc.PAD_B]
    # pads never equal each other nor any codepoint
    assert enc.PAD_A != enc.PAD_B and enc.PAD_A < 0 and enc.PAD_B < 0


def test_astral_plane():
    e = enc.encode_column(["a𝄞b"])  # 𝄞 = U+1D11E, one scalar
    assert int(e.lengths[0]) == 3
    assert list(e.codes[0]) == [ord("a"), 0x1D11E, ord("b")]


def test_nul_char_inside_string():
    e = enc.encode_column(["a\x00b"])
    assert int(e.lengths[0]) == 3
    assert list(e.codes[0])[:3] == [97, 0, 98]


def test_nul_char_trailing(monkeypatch):
    """Trailing U+0000 counts toward length on BOTH encode paths (numpy
    str_len would treat it as padding — ADVICE round 1): levenshtein('a\\0',
    'a') must be 0.5, not 1.0."""
    import strsim_tpu as st

    for force_numpy in (False, True):
        if force_numpy:
            monkeypatch.setattr(enc, "_encode_fast", lambda *a, **k: None)
        e = enc.encode_column(["a\x00", "\x00"])
        assert list(e.lengths) == [2, 1]
        assert list(e.codes[0])[:2] == [97, 0]
        got = st.compute("levenshtein", ["a\x00"], ["a"])
        assert got[0] == 0.5


def test_equal_rows():
    a, b = enc.encode_pair(["same", "diff1", "", "ab"], ["same", "diff2", "", "abc"])
    assert list(enc.equal_rows(a, b)) == [True, False, True, False]


def test_encode_pair_shared_width():
    a, b = enc.encode_pair(["a"], ["longerstring"])
    assert a.width == b.width == 12


def test_empty_and_all_empty_columns():
    e = enc.encode_column([])
    assert e.n == 0
    e2 = enc.encode_column(["", ""])
    assert e2.width == 1 and list(e2.lengths) == [0, 0]


def test_non_string_raises():
    with pytest.raises(TypeError):
        enc.encode_column(["ok", 3])


def test_width_too_small_raises():
    with pytest.raises(ValueError):
        enc.encode_column(["abcdef"], width=3)


def test_pipeline_harmonizes_encoded_widths():
    import strsim_tpu as st

    a = enc.encode_column(["phillips"], pad=enc.PAD_A)       # width 8
    b = enc.encode_column(["philipsfamily"], pad=enc.PAD_B)  # width 13
    from strsim_tpu.models.pipeline import compute_scores

    vals, valid = compute_scores(a, b, ("levenshtein",))["levenshtein"]
    from strsim_tpu.ops.oracle import ORACLES

    assert vals[0] == ORACLES["levenshtein"]("phillips", "philipsfamily")
