"""Host-side string ingestion: columns of strings → codepoint arrays.

The reference decodes UTF-8 per row into reusable Vec<char> scratch buffers
inside each kernel (src/expressions/strsim.rs:131-140). A TPU engine needs the
opposite shape: decode the WHOLE column up front into a rectangular codepoint
tile that can be shipped to HBM in one transfer.

Fast path: numpy's fixed-width unicode dtype ('<U{L}') stores UCS4 codepoints.
`np.asarray(list_of_str, dtype='U{L}')` is a single C-speed pass that yields a
[N, L] uint32 codepoint matrix — an exact per-Unicode-scalar decode with no
Python-level loop. Lengths come from the original Python strings (len(s)), so
embedded and trailing NUL characters are handled exactly (np str_len would
treat a trailing U+0000 as padding).

Arrow ingestion (offsets + UTF-8 data + validity bitmap) is handled by the
native C++ extension (strsim_tpu/native) with a numpy fallback here.

Padding sentinels: PAD_A = -1 and PAD_B = -2 (as int32). Real codepoints are
>= 0, so a-pad never equals b-pad and neither equals any real character —
kernels need no extra validity masks on character equality.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

PAD_A = -1
PAD_B = -2

@dataclasses.dataclass
class EncodedColumn:
    """A decoded string column.

    codes:    [N, L] codepoints, PAD-filled past each row's length (pad value
              chosen by the caller via `pad`). Dtype is int8 when the native
              encoder proved the whole column ASCII, else int32; PAD values
              (-1/-2) are identical in both. All consumers are dtype-agnostic.
    lengths:  [N] int32 codepoint counts (0 for null rows).
    validity: [N] bool — False where the input was null (None).
    """

    codes: np.ndarray
    lengths: np.ndarray
    validity: np.ndarray

    @property
    def n(self) -> int:
        return self.codes.shape[0]

    @property
    def width(self) -> int:
        return self.codes.shape[1]

    def slice(self, start: int, stop: int) -> "EncodedColumn":
        return EncodedColumn(
            codes=self.codes[start:stop],
            lengths=self.lengths[start:stop],
            validity=self.validity[start:stop],
        )


# CPython list fast path: a PyListObject's ob_item field IS the PyObject**
# array the native scan/encode passes consume — reading it directly skips the
# 1M-row object-ndarray copy (~32 ms per column at 1M rows). The field offset
# (24 = PyObject_VAR_HEAD on 64-bit builds) is validated at first use by a
# probe list whose item addresses must read back equal to their id()s; any
# mismatch (or a non-CPython / free-threaded build) disables the path forever.
_LIST_ITEMS_OFFSET: Optional[int] = None  # None=unprobed, -1=disabled


def _list_items_addr(lst: list) -> Optional[int]:
    """Address of `lst`'s PyObject** item array, or None if unavailable.
    Caller must keep `lst` alive and un-resized while the address is in use
    (appends can realloc ob_item)."""
    global _LIST_ITEMS_OFFSET
    import ctypes

    if _LIST_ITEMS_OFFSET is None:
        import sys

        ok = False
        if (
            sys.implementation.name == "cpython"
            and sys.maxsize > 2**32
            and sys.getsizeof([]) == 56  # PyObject(16)+size(8)+ob_item(8)+alloc(8)+GC(16)
        ):
            probe = [None, "probe", 3.5]
            addr = ctypes.c_void_p.from_address(id(probe) + 24).value
            if addr:
                items = (ctypes.c_void_p * 3).from_address(addr)
                ok = all((items[i] or 0) == id(probe[i]) for i in range(3))
        _LIST_ITEMS_OFFSET = 24 if ok else -1
    if _LIST_ITEMS_OFFSET < 0 or not lst:
        return None
    return ctypes.c_void_p.from_address(id(lst) + _LIST_ITEMS_OFFSET).value


def _column_objects(col):
    """Normalize a column to (objs_addr, n, keepalive) where objs_addr points
    at n contiguous PyObject*s and keepalive[i] is row i (for error messages).
    Returns None for inputs the raw-pointer paths don't serve (pyarrow /
    ArrowStringColumn take the buffer route; empty columns take the legacy
    path so width/dtype defaults stay identical)."""
    if hasattr(col, "offsets") and hasattr(col, "encode"):
        return None  # ArrowStringColumn: native UTF-8 buffer route is faster
    if type(col).__module__.split(".")[0] == "pyarrow":
        return None
    if type(col) is list:
        addr = _list_items_addr(col)
        if addr is not None:
            return addr, len(col), col
    if (
        isinstance(col, np.ndarray)
        and col.dtype == object
        and col.ndim == 1
        and col.flags.c_contiguous
        and col.shape[0]
    ):
        # an object ndarray's data buffer is already the PyObject** array
        return col.ctypes.data, col.shape[0], col
    arr = _to_object_array(col)
    if arr.shape[0] == 0:
        return None
    return arr.ctypes.data, arr.shape[0], arr


def _to_object_array(col) -> np.ndarray:
    """Normalize any supported column input to a 1-D object ndarray of str|None."""
    # polars Series / arrow arrays expose to_list; plain lists/tuples pass through.
    if hasattr(col, "to_list"):
        col = col.to_list()
    elif hasattr(col, "to_pylist"):
        col = col.to_pylist()
    if isinstance(col, np.ndarray) and col.dtype != object:
        col = col.tolist()
    arr = np.empty(len(col), dtype=object)
    arr[:] = list(col)
    return arr


def encode_column(col, pad: int = PAD_A, width: Optional[int] = None) -> EncodedColumn:
    """Decode a column of str|None into an EncodedColumn.

    `width`: pad/truncate-check target width; defaults to the max row length
    (min 1 so empty columns still produce a [N, 1] array).

    Accepts: lists/np arrays of str|None, ArrowStringColumn (native UTF-8
    decode path), pyarrow arrays (zero-copy buffer route), polars Series, and
    anything exposing to_list/to_pylist.
    """
    if hasattr(col, "offsets") and hasattr(col, "encode"):  # ArrowStringColumn
        return col.encode(pad=pad, width=width)
    if type(col).__module__.split(".")[0] == "pyarrow":
        from strsim_tpu.utils.arrow_io import ArrowStringColumn

        return ArrowStringColumn.from_pyarrow(col).encode(pad=pad, width=width)
    co = _column_objects(col)
    if co is not None:
        # raw PyObject** route: list ob_item / object-ndarray data, no copy
        obj = _encode_objects_ptr(co[0], co[1], co[2], pad, width)
        if obj is not None:
            return obj
    arr = (
        co[2]
        if co is not None and isinstance(co[2], np.ndarray)
        else _to_object_array(col)
    )
    fast = _encode_fast(arr, pad, width)
    if fast is not None:
        return fast
    arr = arr.copy()  # the null-replacement below must not mutate caller data
    n = arr.shape[0]
    validity = np.ones(n, dtype=bool)
    for i, v in enumerate(arr):
        if v is None:
            validity[i] = False
            arr[i] = ""
        elif not isinstance(v, str):
            raise TypeError(f"expected str or None at row {i}, got {type(v).__name__}")

    if n == 0:
        w = width or 1
        return EncodedColumn(
            codes=np.full((0, w), pad, dtype=np.int32),
            lengths=np.zeros(0, dtype=np.int32),
            validity=validity,
        )

    u = np.asarray(arr, dtype=str)  # one C pass: object strs → UCS4 '<Umax'
    # lengths come from the original Python strings, NOT np str_len on the
    # U-dtype array: str_len treats a string's trailing U+0000 as padding
    # ('a\0' would report length 1 and lose its NUL; the reference counts it)
    lengths = np.fromiter(map(len, arr.tolist()), dtype=np.int32, count=n)
    max_len = int(lengths.max()) if n else 0
    w = width if width is not None else max(max_len, 1)
    if max_len > w:
        raise ValueError(f"width {w} smaller than longest row ({max_len})")
    if u.dtype.itemsize != 4 * w:
        u = u.astype(f"<U{w}")
    codes = u.view(np.uint32).reshape(n, w).astype(np.int32)
    mask = np.arange(w, dtype=np.int32)[None, :] < lengths[:, None]
    codes = np.where(mask, codes, np.int32(pad))
    return EncodedColumn(codes=codes, lengths=lengths, validity=validity)


def _encode_objects_ptr(
    objs_addr: int, n: int, rows, pad: int, width: Optional[int]
) -> Optional[EncodedColumn]:
    """Native encode over a raw PyObject** array (`rows[i]` must be row i —
    a list or object ndarray kept alive by the caller)."""
    try:
        from strsim_tpu.native import binding as nb

        if nb.get_lib() is None:
            return None
    except Exception:
        return None
    try:
        scan = nb.scan_object_ptr(objs_addr, n)
    except Exception:
        return None
    if scan is None:
        return None
    rc, all_ascii, lengths, validity = scan
    if rc < 0:
        row = -rc - 1
        raise TypeError(
            f"expected str or None at row {row}, got {type(rows[row]).__name__}"
        )
    w = width if width is not None else max(rc, 1)
    if rc > w:
        raise ValueError(f"width {w} smaller than longest row ({rc})")
    from strsim_tpu.utils.alloc import fast_empty

    dtype = np.int8 if all_ascii else np.int32
    codes = fast_empty((n, w), dtype, populate=False)
    erc = nb.encode_object_ptr(objs_addr, n, w, pad, codes)
    if erc != 0:
        raise ValueError(f"row {erc - 1} longer than tile width {w}")
    return EncodedColumn(codes=codes, lengths=lengths,
                         validity=validity.view(bool))


def _encode_fast(arr: np.ndarray, pad: int, width: Optional[int]) -> Optional[EncodedColumn]:
    """C-speed bulk encode via the native UTF-8 decoder: one ''.join + one
    .encode() pass on the host, then the C++ column decoder (ASCII rows are a
    straight widening copy). ~10x faster than numpy's per-object U-dtype
    conversion on large columns. Returns None when unavailable (no toolchain)
    so the caller falls through to the numpy path."""
    try:
        from strsim_tpu.native.build import get_lib

        if get_lib() is None:
            return None
        from strsim_tpu.native.binding import decode_utf8_column
    except Exception:
        return None

    n = arr.shape[0]
    if n == 0:
        return None
    validity = np.ones(n, dtype=bool)
    none_mask = np.array([v is None for v in arr], dtype=bool)
    if none_mask.any():
        validity = ~none_mask
        arr = arr.copy()
        arr[none_mask] = ""
    for i, v in enumerate(arr):
        if not isinstance(v, str):
            raise TypeError(f"expected str or None at row {i}, got {type(v).__name__}")

    parts = arr.tolist()
    joined = "".join(parts)
    data = joined.encode("utf-8")
    char_lens = np.fromiter(map(len, parts), dtype=np.int64, count=n)
    if len(data) == len(joined):  # pure ASCII: byte offsets == char offsets
        byte_lens = char_lens
    else:
        byte_lens = np.fromiter(
            (len(s.encode("utf-8")) for s in parts), dtype=np.int64, count=n
        )
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(byte_lens, out=offsets[1:])

    max_len = int(char_lens.max()) if n else 0
    w = width if width is not None else max(max_len, 1)
    if max_len > w:
        raise ValueError(f"width {w} smaller than longest row ({max_len})")
    codes, lengths = decode_utf8_column(
        np.frombuffer(data, dtype=np.uint8) if data else np.zeros(0, np.uint8),
        offsets,
        None,
        w,
        pad,
    )
    return EncodedColumn(codes=codes, lengths=lengths, validity=validity)


def encode_pair(
    col_a, col_b, width: Optional[int] = None
) -> Tuple[EncodedColumn, EncodedColumn]:
    """Encode two columns with a shared tile width (needed by paired kernels)."""
    joint = _encode_pair_native(col_a, col_b, width)
    if joint is not None:
        return joint
    a = encode_column(col_a, pad=PAD_A, width=None)
    b = encode_column(col_b, pad=PAD_B, width=None)
    w = width if width is not None else max(a.width, b.width)
    a = _repad(a, PAD_A, w)
    b = _repad(b, PAD_B, w)
    return a, b


def _encode_pair_native(
    col_a, col_b, width: Optional[int]
) -> Optional[Tuple[EncodedColumn, EncodedColumn]]:
    """Joint native encode: scan BOTH columns first (threaded length/ASCII
    pass, ~1 ms/M rows), then encode each straight into the shared-width tile
    — no post-hoc `_repad` (one alloc + full copy saved per call) and one
    consistent dtype for the pair (int8 iff both sides are pure ASCII).
    Returns None when any piece of the native path does not apply; the caller
    falls back to the per-column path. ~3x the per-column path's throughput
    at 1M rows (round-5 profile: repad 41 ms + second alloc 18 ms +
    object-array copies 64 ms all eliminated via the list ob_item route)."""
    try:
        from strsim_tpu.native import binding as nb

        if nb.get_lib() is None:
            return None
    except Exception:
        return None
    ca = _column_objects(col_a)
    cb = _column_objects(col_b)
    if ca is None or cb is None:
        return None
    sa = nb.scan_object_ptr(ca[0], ca[1])
    sb = nb.scan_object_ptr(cb[0], cb[1])
    if sa is None or sb is None:
        return None
    for scan, keep in ((sa, ca[2]), (sb, cb[2])):
        if scan[0] < 0:
            row = -scan[0] - 1
            raise TypeError(
                f"expected str or None at row {row}, got {type(keep[row]).__name__}"
            )
    max_len = max(sa[0], sb[0])
    w = width if width is not None else max(max_len, 1)
    if max_len > w:
        raise ValueError(f"width {w} smaller than longest row ({max_len})")
    from strsim_tpu.utils.alloc import fast_empty

    dtype = np.int8 if (sa[1] and sb[1]) else np.int32
    out = []
    for (addr, n, keep), (_, _, lengths, validity), pad in (
        (ca, sa, PAD_A),
        (cb, sb, PAD_B),
    ):
        # populate=False: the threaded encode pass first-touches every byte
        codes = fast_empty((n, w), dtype, populate=False)
        rc = nb.encode_object_ptr(addr, n, w, pad, codes)
        if rc != 0:
            raise ValueError(f"row {rc - 1} longer than tile width {w}")
        out.append(EncodedColumn(codes=codes, lengths=lengths,
                                 validity=validity.view(bool)))
    return out[0], out[1]


def _repad(c: EncodedColumn, pad: int, width: int) -> EncodedColumn:
    if c.width == width:
        return c
    if c.width > width:
        raise ValueError("cannot shrink below content width")
    from strsim_tpu.utils.alloc import fast_empty

    wide = fast_empty((c.n, width), c.codes.dtype)
    wide[:, : c.width] = c.codes
    wide[:, c.width :] = pad
    return EncodedColumn(
        codes=wide,
        lengths=c.lengths,
        validity=c.validity,
    )


def decode_row(codes: np.ndarray, length: int) -> str:
    """Inverse of encode (for tests): codepoints → str."""
    return "".join(chr(int(c)) for c in codes[:length])


def equal_rows(a: EncodedColumn, b: EncodedColumn) -> np.ndarray:
    """Vectorized per-row string equality (the reference's a == b fast path,
    src/expressions/strsim.rs:128). Pads differ between sides (PAD_A vs
    PAD_B), so padded tails never compare equal and a-chars never equal
    b-pads — a row is equal iff the lengths match and every in-length
    position matches. Native path: threaded length-check + prefix memcmp.
    Numpy fallback counts equal positions per row (no row gather temps):
    pads can never contribute, so count == len_a == len_b is exact."""
    if a.width != b.width:
        w = max(a.width, b.width)
        a = _repad(a, PAD_A, w)
        b = _repad(b, PAD_B, w)
    try:
        from strsim_tpu.native.binding import equal_rows_native

        out = equal_rows_native(a.codes, b.codes, a.lengths, b.lengths)
        if out is not None:
            return out
    except Exception:
        pass
    same_len = a.lengths == b.lengths
    eq_count = np.count_nonzero(a.codes == b.codes, axis=1)
    return same_len & (eq_count == a.lengths)
