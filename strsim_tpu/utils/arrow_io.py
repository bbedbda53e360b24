"""Arrow string-column ingestion.

The reference receives Polars/Arrow string Series through its FFI boundary
(src/expressions/strsim.rs:46-47). This engine's equivalent accepts the Arrow
large_utf8/utf8 physical layout directly — a UTF-8 data buffer, an offsets
vector, and an optional validity bitmap — and decodes it to padded codepoint
tiles with the native C++ decoder (ASCII fast path; numpy fallback without a
toolchain). pyarrow is optional: ArrowStringColumn can be built from raw
buffers, from a pyarrow.Array/ChunkedArray, or from a polars Series.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from strsim_tpu.utils.encode import EncodedColumn, PAD_A


@dataclasses.dataclass
class ArrowStringColumn:
    """Arrow string column: utf-8 `data`, int offsets [n+1], optional validity
    (bool per row, True = present)."""

    data: np.ndarray        # uint8
    offsets: np.ndarray     # int64 (int32 accepted, widened)
    validity: Optional[np.ndarray] = None

    @property
    def n(self) -> int:
        return self.offsets.shape[0] - 1

    @classmethod
    def from_pyarrow(cls, arr) -> "ArrowStringColumn":
        import pyarrow as pa

        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_string(arr.type):
            arr = arr.cast(pa.large_string())
        buffers = arr.buffers()
        validity_buf, offsets_buf, data_buf = buffers[0], buffers[1], buffers[2]
        n = len(arr)
        off = np.frombuffer(offsets_buf, dtype=np.int64, count=n + 1, offset=arr.offset * 8)
        data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.zeros(0, np.uint8)
        validity = None
        if validity_buf is not None:
            bits = np.unpackbits(
                np.frombuffer(validity_buf, dtype=np.uint8), bitorder="little"
            )
            validity = bits[arr.offset : arr.offset + n].astype(bool)
        return cls(data=data, offsets=np.ascontiguousarray(off), validity=validity)

    @classmethod
    def from_polars(cls, series) -> "ArrowStringColumn":
        return cls.from_pyarrow(series.to_arrow())

    @classmethod
    def from_strings(cls, strings) -> "ArrowStringColumn":
        data = bytearray()
        offsets = np.zeros(len(strings) + 1, dtype=np.int64)
        validity = np.ones(len(strings), dtype=bool)
        for i, s in enumerate(strings):
            if s is None:
                validity[i] = False
            else:
                data.extend(s.encode("utf-8"))
            offsets[i + 1] = len(data)
        return cls(
            data=np.frombuffer(bytes(data), dtype=np.uint8) if data else np.zeros(0, np.uint8),
            offsets=offsets,
            validity=validity if not validity.all() else None,
        )

    def max_chars(self) -> int:
        from strsim_tpu.native.build import get_lib

        lib = get_lib()
        offsets = np.ascontiguousarray(self.offsets, dtype=np.int64)
        if lib is not None:
            import ctypes

            data = np.ascontiguousarray(self.data, dtype=np.uint8)
            val = (
                np.ascontiguousarray(self.validity.astype(np.uint8))
                if self.validity is not None
                else None
            )
            u8p = ctypes.POINTER(ctypes.c_uint8)
            return int(
                lib.strsim_utf8_max_chars(
                    data.ctypes.data_as(u8p),
                    offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                    val.ctypes.data_as(u8p) if val is not None else None,
                    self.n,
                )
            )
        # numpy fallback: count non-continuation bytes per row
        nc = (self.data & 0xC0) != 0x80
        cum = np.concatenate([[0], np.cumsum(nc)])
        chars = cum[self.offsets[1:]] - cum[self.offsets[:-1]]
        if self.validity is not None:
            chars = np.where(self.validity, chars, 0)
        return int(chars.max()) if self.n else 0

    def encode(self, pad: int = PAD_A, width: Optional[int] = None) -> EncodedColumn:
        from strsim_tpu.native.binding import decode_utf8_column

        w = width if width is not None else max(self.max_chars(), 1)
        val8 = self.validity.astype(np.uint8) if self.validity is not None else None
        codes, lengths = decode_utf8_column(
            np.ascontiguousarray(self.data, dtype=np.uint8),
            np.ascontiguousarray(self.offsets, dtype=np.int64),
            val8,
            w,
            pad,
        )
        validity = (
            self.validity.copy() if self.validity is not None else np.ones(self.n, dtype=bool)
        )
        return EncodedColumn(codes=codes, lengths=lengths, validity=validity)
