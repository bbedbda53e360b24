"""Fast host allocation for large staging buffers.

Large fresh allocations from numpy (`np.empty`) are serviced by 4 KiB-granular
first-touch page faults, measured at only ~0.2-1 GB/s in this environment —
for a [1M, 48] int32 codes tile (192 MB) that is 1-3 s of pure fault service,
dwarfing the actual decode/pack work. Anonymous mmap with MADV_HUGEPAGE makes
faults 2 MiB-granular (~1.5 GB/s measured), and MADV_POPULATE_WRITE (advice 23,
Linux 5.14+) pre-faults the whole range in one syscall (~3.3 GB/s measured).

`fast_empty` returns a numpy array backed by such a mapping. The mapping's
lifetime is tied to the array (numpy holds the mmap as `base`), so it behaves
exactly like `np.empty` to callers. Small requests fall through to np.empty —
malloc reuse makes them cheap and mmap setup would dominate.

The reference has no analogue (rayon threads reuse malloc arenas,
src/expressions/strsim.rs:78-84 scratch reuse); this solves the TPU engine's
column-at-a-time staging problem instead.
"""
from __future__ import annotations

import ctypes
import math
import mmap

import numpy as np

# Below this, np.empty (malloc arena reuse) is as fast and has less setup cost.
_MMAP_THRESHOLD = 4 << 20

_MADV_POPULATE_WRITE = 23  # not exposed by the mmap module on this Python

_libc = None


def _get_libc():
    global _libc
    if _libc is None:
        try:
            _libc = ctypes.CDLL("libc.so.6", use_errno=True)
            _libc.madvise.restype = ctypes.c_int
            _libc.madvise.argtypes = (
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.c_int,
            )
        except Exception:
            _libc = False
    return _libc or None


def fast_empty(shape, dtype, populate: bool = True) -> np.ndarray:
    """np.empty drop-in that avoids the slow 4 KiB first-touch fault path.

    populate=False skips MADV_POPULATE_WRITE and leaves fault service to the
    consumer's first write. Use it when a THREADED writer immediately fills
    the whole buffer (the native encode/pack passes): 8 threads fault 2 MiB
    huge pages in parallel, measured ~1.4x faster end-to-end than the single
    POPULATE_WRITE syscall (16.9 vs 23.2 ms for a 48 MB tile, round 5).
    Keep populate=True when the first writer is single-threaded numpy."""
    dtype = np.dtype(dtype)
    if isinstance(shape, (int, np.integer)):
        shape = (int(shape),)
    count = math.prod(shape) if shape else 1
    nbytes = count * dtype.itemsize
    if nbytes < _MMAP_THRESHOLD:
        return np.empty(shape, dtype)
    try:
        m = mmap.mmap(-1, nbytes)
    except (OSError, ValueError):
        return np.empty(shape, dtype)
    try:
        m.madvise(mmap.MADV_HUGEPAGE)
    except Exception:
        pass
    libc = _get_libc()
    if populate and libc is not None:
        try:
            view = ctypes.c_char.from_buffer(m)
            libc.madvise(ctypes.addressof(view), nbytes, _MADV_POPULATE_WRITE)
            del view  # release the exported buffer so numpy can own it
        except Exception:
            pass
    return np.frombuffer(m, dtype=dtype, count=count).reshape(shape)
