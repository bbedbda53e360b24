"""A/B: dynamic-range histogram multiset kernel (wide int8 buckets,
ops/multiset_pallas.multiset_intersection_hist) vs the chunked XLA scan —
the wide-bucket counterpart of tools/ab_multiset_r3.py. O(range·L) vs
O(L²): for lowercase name data range ≈ 26, so the histogram should win from
~w127 and dominate at 255/511.

Usage: timeout 3000 python tools/ab_multiset_hist.py [widths...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.multiset_loop import multiset_intersection_chunked
from strsim_tpu.ops.multiset_pallas import multiset_intersection_hist
from strsim_tpu.utils.encode import PAD_A, PAD_B
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 65536


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = PAD_A
    packed[:, width:][pos >= lens[:, 1:2]] = PAD_B
    return packed.astype(np.int8), lens


def wrap(fn, width):
    def kernel(codes, lens):
        out = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1])
        return out[None]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [95, 127, 255, 511]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(multiset_intersection_chunked, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        try:
            hk = wrap(multiset_intersection_hist, width)
            r1 = np.asarray(jax.jit(hk)(codes3[0], lens3[0]))
            tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
            t = marginal_block_time(hk, codes3, lens3)
            print(f"w{width:3d} pallas-hist : {t*1000:8.3f} ms/block = "
                  f"{BLOCK/t/1e6:8.1f} M pairs/s{tag}", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:150]
            print(f"w{width:3d} pallas-hist : FAIL {type(e).__name__}: {msg}",
                  flush=True)
        t = marginal_block_time(base, codes3, lens3)
        print(f"w{width:3d} xla-chunked : {t*1000:8.3f} ms/block = "
              f"{BLOCK/t/1e6:8.1f} M pairs/s", flush=True)
    print("DONE")


if __name__ == "__main__":
    main()
