"""On-demand build + ctypes load of the native host library.

No pybind11 in this environment; the ABI is plain C (extern "C") driven via
ctypes with numpy buffers. The library is built once per source hash into
~/.cache/tpu-strsim/ and memoized.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess
import threading
from typing import Optional

_SRC = pathlib.Path(__file__).parent / "strsim_host.cpp"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_PYLIB: Optional[ctypes.PyDLL] = None
_TRIED = False


def _cache_dir() -> pathlib.Path:
    d = pathlib.Path(os.environ.get("TPU_STRSIM_CACHE", "~/.cache/tpu-strsim")).expanduser()
    d.mkdir(parents=True, exist_ok=True)
    return d


_CXXFLAGS = [
    "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", "-pthread",
    # bit-for-float parity with the reference requires strict IEEE ops:
    # no FMA contraction (x*y+z fused changes the last ulp of winkler)
    "-ffp-contract=off",
    # the CPython-header ingestion path must compile to pure struct reads:
    # NDEBUG drops the assert() calls inside the inline unicode accessors
    "-DNDEBUG",
]


def _python_include_flags() -> list:
    """Include path for Python.h (optional — the C++ guards on __has_include)."""
    try:
        import sysconfig

        inc = sysconfig.get_paths().get("include")
        if inc and os.path.exists(os.path.join(inc, "Python.h")):
            return [f"-I{inc}"]
    except Exception:
        pass
    return []


def build_library() -> pathlib.Path:
    flags = [*_CXXFLAGS, *_python_include_flags()]
    src = _SRC.read_bytes() + " ".join(flags).encode()
    tag = hashlib.sha256(src).hexdigest()[:16]
    out = _cache_dir() / f"strsim_host_{tag}.so"
    if out.exists():
        return out
    tmp = out.with_suffix(".so.tmp")
    cmd = ["g++", *flags, str(_SRC), "-o", str(tmp)]
    subprocess.run(cmd, check=True, capture_output=True)
    tmp.replace(out)
    return out


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if the toolchain is unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = ctypes.CDLL(str(build_library()))
        except Exception:
            return None
        i8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.strsim_decode_utf8_column.restype = ctypes.c_int64
        lib.strsim_decode_utf8_column.argtypes = [
            i8p, i64p, i8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p,
        ]
        lib.strsim_utf8_max_chars.restype = ctypes.c_int64
        lib.strsim_utf8_max_chars.argtypes = [i8p, i64p, i8p, ctypes.c_int64]
        lib.strsim_compute.restype = None
        lib.strsim_compute.argtypes = [
            ctypes.c_int32, i32p, i64p, i32p, i64p, i8p, ctypes.c_int64, f64p,
        ]
        lib.strsim_compute_mt.restype = None
        lib.strsim_compute_mt.argtypes = [
            ctypes.c_int32, i32p, i64p, i32p, i64p, i8p, ctypes.c_int64,
            ctypes.c_int32, f64p,
        ]
        lib.strsim_phonetic_codes.restype = None
        lib.strsim_phonetic_codes.argtypes = [
            ctypes.c_int32, i32p, i64p, i8p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, i8p, i32p,
        ]
        _LIB = lib
        return _LIB


def get_pylib() -> Optional[ctypes.PyDLL]:
    """The native library loaded via PyDLL — calls through THIS handle keep
    the GIL held. Required for the raw PyObject** routes
    (strsim_scan_object_column / strsim_encode_object_column): they read a
    live list's ob_item array and each row's PyUnicode internals, so the
    calling thread must prevent every other Python thread from running
    (a concurrent list.append could realloc ob_item, or an object-array
    store could decref a row, mid-read — use-after-free). The C++ side is
    internally threaded, so holding the GIL costs no parallelism."""
    global _PYLIB
    if _PYLIB is not None:
        return _PYLIB
    if get_lib() is None:  # drives the build + argtype setup exactly once
        return None
    with _LOCK:
        if _PYLIB is None:
            try:
                _PYLIB = ctypes.PyDLL(str(build_library()))
            except Exception:
                return None
    return _PYLIB


def native_available() -> bool:
    return get_lib() is not None
