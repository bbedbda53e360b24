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


# --- round-2 native ingestion paths -----------------------------------------


def test_ascii_column_encodes_int8():
    col = ["smith", "jones", None, ""]
    a = enc.encode_column(col, pad=enc.PAD_A)
    if a.codes.dtype == np.int8:  # native PyUnicode path available
        assert a.codes[0, :5].tolist() == [115, 109, 105, 116, 104]
        assert (a.codes[2] == enc.PAD_A).all()
    assert a.lengths.tolist() == [5, 5, 0, 0]
    assert a.validity.tolist() == [True, True, False, True]


def test_non_ascii_column_encodes_int32_exact():
    col = ["héllo", "日本語", "a𝄞b", "a\0b", "x" * 40]
    a = enc.encode_column(col, pad=enc.PAD_A)
    assert a.codes.dtype == np.int32
    for i, s in enumerate(col):
        assert enc.decode_row(a.codes[i], int(a.lengths[i])) == s


def test_numpy_str_and_subclass_rows():
    class S(str):
        pass

    col = [np.str_("abc"), S("üx"), "plain", None]
    a = enc.encode_column(col, pad=enc.PAD_A)
    assert enc.decode_row(a.codes[0], 3) == "abc"
    assert enc.decode_row(a.codes[1], 2) == "üx"
    assert not a.validity[3]


def test_equal_rows_matches_python_semantics():
    col_a = ["same", "same", "", "a\0b", "ab", None, "ü"]
    col_b = ["same", "saMe", "", "a\0b", "abc", "x", "ü"]
    a = enc.encode_column(col_a, pad=enc.PAD_A)
    b = enc.encode_column(col_b, pad=enc.PAD_B)
    eq = enc.equal_rows(a, b)
    want = [(x == y) if (x is not None and y is not None) else (x is y)
            for x, y in zip(["same","same","","a\0b","ab","",  "ü"],
                             ["same","saMe","","a\0b","abc","x","ü"])]
    # null row encodes as empty+invalid; equality there is masked by validity
    assert eq[:5].tolist() == want[:5]
    assert eq[6]


def test_fast_empty_is_writable_and_correct_shape():
    from strsim_tpu.utils.alloc import fast_empty

    for shape, dtype in (((3, 5), np.int8), ((1 << 21,), np.int32), (7, np.float64)):
        a = fast_empty(shape, dtype)
        a.fill(3)
        assert a.dtype == np.dtype(dtype)
        assert (a == 3).all()


# --- round-5 joint/raw-pointer encode paths ---------------------------------


def test_encode_pair_list_and_ndarray_routes_agree():
    """The list ob_item route, the object-ndarray data route, and the legacy
    per-column path must produce identical tiles."""
    col_a = ["smith", None, "", "héllo", "a" * 40]
    col_b = ["smyth", "x", None, "hello", "b"]
    arr_a = np.empty(5, object); arr_a[:] = col_a
    arr_b = np.empty(5, object); arr_b[:] = col_b
    a1, b1 = enc.encode_pair(col_a, col_b)
    a2, b2 = enc.encode_pair(arr_a, arr_b)
    for x, y in ((a1, a2), (b1, b2)):
        assert x.codes.dtype == y.codes.dtype
        assert (x.codes == y.codes).all()
        assert (x.lengths == y.lengths).all()
        assert (x.validity == y.validity).all()
    assert a1.width == b1.width


def test_encode_pair_joint_dtype_consistent():
    """Joint path: one shared dtype for the pair — int8 only when BOTH sides
    are pure ASCII (previously a could be int8 while b was int32)."""
    a, b = enc.encode_pair(["abc"], ["héllo"])
    if a.codes.dtype == np.int32:  # native joint path active
        assert b.codes.dtype == np.int32
    a, b = enc.encode_pair(["abc"], ["xyzw"])
    assert a.codes.dtype == b.codes.dtype


def test_encode_pair_errors_match_per_column_path():
    with pytest.raises(TypeError, match="row 1"):
        enc.encode_pair(["ok", 3], ["ok", "ok"])
    with pytest.raises(TypeError, match="row 0"):
        enc.encode_pair(["ok", "ok"], [b"bytes", "ok"])
    with pytest.raises(ValueError):
        enc.encode_pair(["abcdef"], ["ab"], width=3)


def test_encode_pair_explicit_width_and_broadcast_lengths():
    a, b = enc.encode_pair(["ab"], ["x", "yy", None], width=7)
    assert a.width == b.width == 7
    assert a.n == 1 and b.n == 3
    assert (a.codes[0, 2:] == enc.PAD_A).all()
    assert (b.codes[2] == enc.PAD_B).all() and not b.validity[2]


def test_encode_column_does_not_mutate_caller_array(monkeypatch):
    """The numpy fallback replaces None with '' — on a COPY, never on the
    caller's ndarray (round 5: the raw-pointer route hands the caller's own
    buffer downstream)."""
    monkeypatch.setattr(enc, "_encode_objects_ptr", lambda *a, **k: None)
    monkeypatch.setattr(enc, "_encode_fast", lambda *a, **k: None)
    arr = np.empty(3, object)
    arr[:] = ["a", None, "c"]
    e = enc.encode_column(arr)
    assert arr[1] is None
    assert not e.validity[1]


def test_list_items_addr_self_validates():
    """The CPython layout probe must either validate (and then agree with
    id()s on a fresh list) or disable the path — never return garbage."""
    lst = ["x", None, "z"]
    addr = enc._list_items_addr(lst)
    if addr is None:
        assert enc._LIST_ITEMS_OFFSET == -1
        return
    import ctypes

    items = (ctypes.c_void_p * 3).from_address(addr)
    assert [items[i] for i in range(3)] == [id(v) for v in lst]
    assert enc._list_items_addr([]) is None


def test_pack_bucket_matches_numpy_pack():
    from strsim_tpu.native.binding import pack_bucket

    rng = np.random.default_rng(0)
    n, w_src, width = 1000, 12, 15
    codes_a = rng.integers(97, 123, size=(n, w_src)).astype(np.int8)
    codes_b = rng.integers(97, 123, size=(n, w_src)).astype(np.int8)
    la = rng.integers(1, w_src + 1, size=n).astype(np.int32)
    lb = rng.integers(1, w_src + 1, size=n).astype(np.int32)
    sel = rng.choice(n, size=300, replace=False)
    out = pack_bucket(codes_a, codes_b, la, lb, sel, width, enc.PAD_A, enc.PAD_B, 512)
    if out is None:  # no native lib in this env
        return
    packed, lens = out
    assert packed.shape == (512, 2 * width) and lens.shape == (512, 2)
    for r in range(300):
        s = sel[r]
        assert packed[r, :w_src].tolist() == codes_a[s].tolist()
        assert (packed[r, w_src:width] == enc.PAD_A).all()
        assert packed[r, width:width + w_src].tolist() == codes_b[s].tolist()
        assert (packed[r, width + w_src:] == enc.PAD_B).all()
        assert lens[r].tolist() == [la[s], lb[s]]
    assert (packed[300:, :width] == enc.PAD_A).all()
    assert (packed[300:, width:] == enc.PAD_B).all()
    assert (lens[300:] == 0).all()
