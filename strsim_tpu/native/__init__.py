"""Native host runtime: C++ UTF-8/Arrow decode + single-core scalar kernels.

Compiled on demand with g++ (build.py); every entry point has a pure-Python
fallback so the engine works without a toolchain.
"""

from strsim_tpu.native.build import get_lib, native_available
from strsim_tpu.native.binding import (
    decode_utf8_column,
    native_compute,
    native_compute_strings,
    native_phonetic_codes,
)

__all__ = [
    "get_lib",
    "native_available",
    "decode_utf8_column",
    "native_compute",
    "native_compute_strings",
    "native_phonetic_codes",
]
