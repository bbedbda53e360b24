"""Arrow-layout ingestion path (native decoder + numpy fallback)."""
import numpy as np
import pytest

from strsim_tpu.utils.arrow_io import ArrowStringColumn
from strsim_tpu.utils import encode as enc
import strsim_tpu as st


COL = ["hello", "", "héllo", None, "日本語", "a𝄞b", "phillips"]


def test_from_strings_roundtrip():
    col = ArrowStringColumn.from_strings(COL)
    assert col.n == len(COL)
    e = col.encode(pad=enc.PAD_A)
    ref = enc.encode_column(COL, pad=enc.PAD_A, width=e.width)
    np.testing.assert_array_equal(e.codes, ref.codes)
    np.testing.assert_array_equal(e.lengths, ref.lengths)
    np.testing.assert_array_equal(e.validity, ref.validity)


def test_max_chars():
    col = ArrowStringColumn.from_strings(COL)
    assert col.max_chars() == 8  # "phillips"


def test_compute_through_arrow_columns():
    a = ArrowStringColumn.from_strings(["phillips", "smith", None])
    b = ArrowStringColumn.from_strings(["philips", "smith", "x"])
    got = st.compute("levenshtein", a, b)
    assert abs(got[0] - 0.875) < 1e-12
    assert got[1] == 1.0
    assert np.isnan(got[2])


def test_validity_none_when_all_present():
    col = ArrowStringColumn.from_strings(["a", "b"])
    assert col.validity is None
    e = col.encode()
    assert e.validity.all()


def test_max_chars_numpy_fallback(monkeypatch):
    from strsim_tpu.native import build as nb

    monkeypatch.setattr(nb, "get_lib", lambda: None)
    col = ArrowStringColumn.from_strings(["héllo", "ab", None, "日本語語"])
    assert col.max_chars() == 5


def test_decode_numpy_fallback(monkeypatch):
    from strsim_tpu.native import binding as nbind

    monkeypatch.setattr(nbind, "get_lib", lambda: None)
    col = ArrowStringColumn.from_strings(["héllo", "", None])
    e = col.encode(pad=enc.PAD_A)
    ref = enc.encode_column(["héllo", "", None], pad=enc.PAD_A, width=e.width)
    np.testing.assert_array_equal(e.codes, ref.codes)
    np.testing.assert_array_equal(e.lengths, ref.lengths)
