"""numpy/ctypes bindings over the native host library."""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence, Tuple

import numpy as np

from strsim_tpu.native.build import get_lib

MEASURE_IDS = {
    "levenshtein": 0,
    "jaro": 1,
    "jaro_winkler": 2,
    "jaccard": 3,
    "sorensen_dice": 4,
}


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


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
    codes = np.empty((n, width), dtype=np.int32)
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
