"""numpy/ctypes bindings over the native host library."""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence, Tuple

import numpy as np

from strsim_tpu.native.build import get_lib, get_pylib

MEASURE_IDS = {
    "levenshtein": 0,
    "jaro": 1,
    "jaro_winkler": 2,
    "jaccard": 3,
    "sorensen_dice": 4,
    # extension measures (ids must match strsim_host.cpp compute_range)
    "jaccard_bigram": 5,
    "sorensen_dice_bigram": 6,
    "cosine": 7,
    "overlap": 8,
    "hamming": 9,
    "lcs_seq": 10,
    "indel": 11,
    "osa": 12,
    "soundex": 13,
}


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


# stat fields per measure, in the (s0, s1, s2) order strsim_host.cpp's
# finalize_range expects (mirrors ops/stats.STAT_FIELDS semantics)
_FINALIZE_FIELDS = {
    "levenshtein": ("lev_d",),
    "jaro": ("jaro_m", "jaro_t"),
    "jaro_winkler": ("jaro_m", "jaro_t", "prefix"),
    "jaccard": ("inter",),
    "sorensen_dice": ("inter",),
    "jaccard_bigram": ("inter2", "eq"),
    "sorensen_dice_bigram": ("inter2", "eq"),
    "cosine": ("inter",),
    "overlap": ("inter",),
    "hamming": ("ham_m",),
    "lcs_seq": ("lcs_len",),
    "indel": ("lcs_len",),
    "osa": ("osa_d",),
    "soundex": ("sdx_eq",),
}


def finalize_scatter(
    measure: str,
    stats: dict,
    la: np.ndarray,
    lb: np.ndarray,
    out: np.ndarray,
    sel: Optional[np.ndarray] = None,
) -> bool:
    """Threaded C++ finalize (exact f64, reference evaluation order — see
    strsim_host.cpp finalize_range) fused with the scatter into `out`
    (out[sel[i]] = score(i); identity when sel is None). Bit-identical to
    ops/finalize.py's numpy finalizers (tests/test_native.py). Returns
    False when the native library is unavailable or inputs don't qualify
    (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "strsim_finalize_scatter"):
        return False
    fields = _FINALIZE_FIELDS.get(measure)
    if fields is None:
        return False
    n = la.shape[0]
    svec = []
    for f in fields:
        s = stats.get(f)
        if s is None:
            return False
        s = np.ascontiguousarray(s, dtype=np.int32)
        if s.shape[0] != n:
            return False
        svec.append(s)
    while len(svec) < 3:
        svec.append(None)
    la32 = np.ascontiguousarray(la, dtype=np.int32)
    lb32 = np.ascontiguousarray(lb, dtype=np.int32)
    if sel is not None:
        sel = np.ascontiguousarray(sel, dtype=np.int64)
        if sel.shape[0] != n:
            return False
    if out.dtype != np.float64 or not out.flags.c_contiguous:
        return False
    lib.strsim_finalize_scatter.restype = None
    lib.strsim_finalize_scatter(
        ctypes.c_int32(MEASURE_IDS[measure]),
        _ptr(svec[0], ctypes.c_int32),
        _ptr(svec[1], ctypes.c_int32) if svec[1] is not None else None,
        _ptr(svec[2], ctypes.c_int32) if svec[2] is not None else None,
        _ptr(la32, ctypes.c_int32),
        _ptr(lb32, ctypes.c_int32),
        _ptr(sel, ctypes.c_int64) if sel is not None else None,
        ctypes.c_int64(n),
        _ptr(out, ctypes.c_double),
    )
    return True


def scan_object_ptr(
    objs_addr: int, n: int
) -> Optional[Tuple[int, bool, np.ndarray, np.ndarray]]:
    """Pass 1 over a raw PyObject** array (threaded C++, no refcount traffic):
    returns (max_len | -(row+1) on a non-str row, all_ascii, lengths,
    validity). Returns None when the native library is unavailable. The
    caller owns error formatting (it knows the original column object).

    Called through the PyDLL handle: the GIL stays HELD for the duration,
    so no other Python thread can mutate the source list / object array
    while the native threads read its ob_item slots (build.get_pylib)."""
    lib = get_pylib()
    if lib is None or not hasattr(lib, "strsim_scan_object_column"):
        return None
    lib.strsim_scan_object_column.restype = ctypes.c_int64
    lengths = np.empty(n, dtype=np.int32)
    validity = np.empty(n, dtype=np.uint8)
    all_ascii = ctypes.c_int32(0)
    rc = lib.strsim_scan_object_column(
        ctypes.c_void_p(objs_addr),
        ctypes.c_int64(n),
        ctypes.c_void_p(id(None)),
        ctypes.c_void_p(id(str)),
        _ptr(lengths, ctypes.c_int32),
        _ptr(validity, ctypes.c_uint8),
        ctypes.byref(all_ascii),
    )
    return int(rc), bool(all_ascii.value), lengths, validity


def encode_object_ptr(
    objs_addr: int, n: int, width: int, pad: int, codes: np.ndarray
) -> int:
    """Pass 2: fill the caller-allocated [n, width] tile (int8 for an
    all-ASCII column, else int32) from a raw PyObject** array. Returns 0 or
    row+1 when a row exceeds `width`. PyDLL handle: GIL held throughout
    (see scan_object_ptr)."""
    lib = get_pylib()
    lib.strsim_encode_object_column.restype = ctypes.c_int64
    return int(lib.strsim_encode_object_column(
        ctypes.c_void_p(objs_addr),
        ctypes.c_int64(n),
        ctypes.c_void_p(id(None)),
        ctypes.c_int32(width),
        ctypes.c_int32(pad),
        ctypes.c_int32(codes.dtype.itemsize),
        ctypes.c_void_p(codes.ctypes.data),
    ))


def equal_rows_native(
    codes_a: np.ndarray,
    codes_b: np.ndarray,
    len_a: np.ndarray,
    len_b: np.ndarray,
) -> Optional[np.ndarray]:
    """Threaded per-row tile equality (lengths match + prefix memcmp).
    Returns bool [n], or None when the native path does not apply."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "strsim_equal_rows"):
        return None
    if codes_a.dtype != codes_b.dtype or codes_a.shape != codes_b.shape:
        return None
    if not (codes_a.flags.c_contiguous and codes_b.flags.c_contiguous):
        return None
    n, w = codes_a.shape
    la = np.ascontiguousarray(len_a, dtype=np.int32)
    lb = np.ascontiguousarray(len_b, dtype=np.int32)
    out = np.empty(n, dtype=np.uint8)
    lib.strsim_equal_rows(
        ctypes.c_void_p(codes_a.ctypes.data),
        ctypes.c_void_p(codes_b.ctypes.data),
        _ptr(la, ctypes.c_int32),
        _ptr(lb, ctypes.c_int32),
        ctypes.c_int64(n),
        ctypes.c_int32(w),
        ctypes.c_int32(codes_a.dtype.itemsize),
        _ptr(out, ctypes.c_uint8),
    )
    return out.view(bool)


def pack_bucket(
    codes_a: np.ndarray,
    codes_b: np.ndarray,
    len_a: np.ndarray,
    len_b: np.ndarray,
    sel: np.ndarray,
    width: int,
    pad_a: int,
    pad_b: int,
    n_out: int,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Gather bucket rows straight into the packed [n_out, 2*width] staging
    tile + [n_out, 2] lengths (one threaded C++ pass, no gather temps).
    Returns None when the native path does not apply (caller packs in numpy).
    """
    lib = get_lib()
    if lib is None or not hasattr(lib, "strsim_pack_bucket"):
        return None
    if codes_a.dtype != codes_b.dtype or codes_a.shape[1] != codes_b.shape[1]:
        return None
    if not (codes_a.flags.c_contiguous and codes_b.flags.c_contiguous):
        return None
    from strsim_tpu.utils.alloc import fast_empty

    sel64 = np.ascontiguousarray(sel, dtype=np.int64)
    la = np.ascontiguousarray(len_a, dtype=np.int32)
    lb = np.ascontiguousarray(len_b, dtype=np.int32)
    packed = fast_empty((n_out, 2 * width), codes_a.dtype, populate=False)
    lens = np.empty((n_out, 2), dtype=np.int32)
    lib.strsim_pack_bucket(
        ctypes.c_void_p(codes_a.ctypes.data),
        ctypes.c_void_p(codes_b.ctypes.data),
        ctypes.c_int32(codes_a.shape[1]),
        _ptr(la, ctypes.c_int32),
        _ptr(lb, ctypes.c_int32),
        _ptr(sel64, ctypes.c_int64),
        ctypes.c_int64(sel64.shape[0]),
        ctypes.c_int32(width),
        ctypes.c_int32(pad_a),
        ctypes.c_int32(pad_b),
        ctypes.c_int32(codes_a.dtype.itemsize),
        ctypes.c_void_p(packed.ctypes.data),
        _ptr(lens, ctypes.c_int32),
        ctypes.c_int64(n_out),
    )
    return packed, lens


def decode_utf8_column(
    data: np.ndarray,
    offsets: np.ndarray,
    validity: Optional[np.ndarray],
    width: int,
    pad: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Arrow string buffers → ([n, width] int32 padded codes, [n] lengths).

    data: uint8 UTF-8 bytes; offsets: int64 [n+1]; validity: optional uint8 [n]
    (0 = null). Raises if any row exceeds `width` chars.
    """
    lib = get_lib()
    n = offsets.shape[0] - 1
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    val = (
        np.ascontiguousarray(validity, dtype=np.uint8)
        if validity is not None
        else None
    )
    from strsim_tpu.utils.alloc import fast_empty

    codes = fast_empty((n, width), np.int32, populate=(lib is None))
    lengths = np.empty(n, dtype=np.int32)
    if lib is None:
        return _decode_utf8_py(data, offsets, val, width, pad, codes, lengths)
    rc = lib.strsim_decode_utf8_column(
        _ptr(data, ctypes.c_uint8),
        _ptr(offsets, ctypes.c_int64),
        _ptr(val, ctypes.c_uint8) if val is not None else None,
        n,
        width,
        pad,
        _ptr(codes, ctypes.c_int32),
        _ptr(lengths, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError(f"row {rc - 1} longer than tile width {width}")
    return codes, lengths


def _decode_utf8_py(data, offsets, validity, width, pad, codes, lengths):
    codes.fill(pad)
    for r in range(offsets.shape[0] - 1):
        if validity is not None and not validity[r]:
            lengths[r] = 0
            continue
        s = bytes(data[offsets[r] : offsets[r + 1]]).decode("utf-8")
        if len(s) > width:
            raise ValueError(f"row {r} longer than tile width {width}")
        lengths[r] = len(s)
        for i, ch in enumerate(s):
            codes[r, i] = ord(ch)
    return codes, lengths


def _ragged_from_encoded(codes: np.ndarray, lengths: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Padded [n, w] tile → (concatenated codes, int64 offsets)."""
    lengths = lengths.astype(np.int64)
    offsets = np.zeros(lengths.shape[0] + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    w = codes.shape[1]
    mask = np.arange(w)[None, :] < lengths[:, None]
    flat = codes[mask].astype(np.int32)
    return np.ascontiguousarray(flat), offsets


def native_compute(
    measure: str,
    codes_a: np.ndarray,
    lengths_a: np.ndarray,
    codes_b: np.ndarray,
    lengths_b: np.ndarray,
    validity: Optional[np.ndarray] = None,
    threads: int = 1,
) -> np.ndarray:
    """Scalar scoring over padded tiles (exact reference math). threads=1 is
    the per-core baseline; threads=0 uses all cores (the engine's host
    fallback, analogous to the reference's rayon pool)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    fa, oa = _ragged_from_encoded(codes_a, lengths_a)
    fb, ob = _ragged_from_encoded(codes_b, lengths_b)
    n = lengths_a.shape[0]
    out = np.empty(n, dtype=np.float64)
    val = (
        np.ascontiguousarray(validity.astype(np.uint8))
        if validity is not None
        else None
    )
    args = (
        MEASURE_IDS[measure],
        _ptr(fa, ctypes.c_int32),
        _ptr(oa, ctypes.c_int64),
        _ptr(fb, ctypes.c_int32),
        _ptr(ob, ctypes.c_int64),
        _ptr(val, ctypes.c_uint8) if val is not None else None,
        n,
    )
    if threads == 1:
        lib.strsim_compute(*args, _ptr(out, ctypes.c_double))
    else:
        lib.strsim_compute_mt(*args, threads, _ptr(out, ctypes.c_double))
    return out


def native_compute_strings(measure: str, col_a: Sequence, col_b: Sequence) -> np.ndarray:
    """Convenience: python string columns → native single-core scores."""
    from strsim_tpu.utils import encode as enc

    a = enc.encode_column(col_a, pad=enc.PAD_A)
    b = enc.encode_column(col_b, pad=enc.PAD_B)
    validity = a.validity & b.validity
    return native_compute(measure, a.codes, a.lengths, b.codes, b.lengths, validity)


PHONETIC_METHODS = {"soundex": 0, "nysiis": 1}


def native_phonetic_codes(
    col, method: str = "soundex", key_width: int = 32, threads: int = 0
) -> np.ndarray:
    """Batch phonetic codes via the threaded C++ encoder: object ndarray of
    str (None at null rows, "" for letterless strings). NYSIIS codes longer
    than key_width are truncated (codes are bounded by the string length;
    32 covers any realistic name)."""
    from strsim_tpu.utils import encode as enc

    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if method not in PHONETIC_METHODS:
        raise KeyError(f"unknown phonetic method {method!r}; available: "
                       f"{', '.join(PHONETIC_METHODS)}")
    c = col if isinstance(col, enc.EncodedColumn) else enc.encode_column(col, pad=enc.PAD_A)
    flat, off = _ragged_from_encoded(c.codes, c.lengths)
    n = c.n
    out = np.zeros((n, key_width), dtype=np.uint8)
    out_lens = np.empty(n, dtype=np.int32)
    val = np.ascontiguousarray(c.validity.astype(np.uint8))
    lib.strsim_phonetic_codes(
        PHONETIC_METHODS[method],
        _ptr(flat, ctypes.c_int32),
        _ptr(off, ctypes.c_int64),
        _ptr(val, ctypes.c_uint8),
        n,
        key_width,
        threads,
        _ptr(out, ctypes.c_uint8),
        _ptr(out_lens, ctypes.c_int32),
    )
    res = np.empty(n, dtype=object)
    view = out.view("S%d" % key_width).ravel()
    for i in range(n):
        ln = out_lens[i]
        res[i] = None if ln < 0 else view[i][:ln].decode("ascii")
    return res
