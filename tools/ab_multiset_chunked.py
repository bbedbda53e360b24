"""A/B: multiset-intersection kernel formulations, relay-immune timing.

Hypothesis (docs/ROOFLINE.md "known headroom"): the streaming scan's 13%
efficiency at w<=15 is per-step overhead, and the [L, L, B] table's earlier
loss at w15 was its 65K-row block cap (pipeline._block_rows), not the
algorithm. Candidates, all computing the identical integer stat
(occurrence-rank identity, ops/stats.py:241-262):

  loop      — production streaming scan (ops/multiset_loop.py)
  table     — fully-parallel [L, L, B] compare tables at the FULL 262144-row
              block (production caps it to 16M elements)
  chunk<G>  — NEW: G i-positions per step as one fused [G, L, B]
              compare-reduce, statically inlined (L/G steps); amortizes the
              scan's per-step fixed cost G-fold with [G*L, B] peak memory.

Usage: timeout 1800 python tools/ab_multiset_chunked.py [widths...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.multiset_loop import multiset_intersection_loop
from strsim_tpu.ops.stats import multiset_intersection
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144


def multiset_intersection_chunked(a, b, len_a, len_b, G=8):
    """Same stat as multiset_intersection_loop; G i-positions per step."""
    del len_b
    B, L = a.shape
    aT = a.T  # [L, B]
    bT = b.T
    steps = -(-L // G)
    Lp = steps * G
    if Lp > L:
        aTp = jnp.concatenate(
            [aT, jnp.full((Lp - L, B), -1, dtype=aT.dtype)], axis=0
        )
    else:
        aTp = aT
    kk = jnp.arange(L, dtype=jnp.int32)  # positions k in a
    g = jnp.arange(G, dtype=jnp.int32)
    inter = jnp.zeros((B,), jnp.int32)
    for s in range(steps):  # static inline; indices constant-fold
        i0 = s * G
        ai = aTp[i0 : i0 + G]  # [G, B]
        cnt_b = jnp.sum(ai[:, None, :] == bT[None, :, :], axis=1)  # [G, B]
        before = (kk[None, :] < (i0 + g)[:, None])[:, :, None]  # [G, L, 1]
        occ = jnp.sum((ai[:, None, :] == aT[None, :, :]) & before, axis=1)
        valid = (i0 + g)[:, None] < len_a[None, :]  # [G, B]
        inter = inter + jnp.sum(
            (occ < cnt_b) & valid, axis=0, dtype=jnp.int32
        )
    return inter


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = -1
    packed[:, width:][pos >= lens[:, 1:2]] = -2
    return packed.astype(np.int8), lens


def wrap(fn, width, **kw):
    def kernel(codes, lens):  # [B, 2W], [B, 2] -> [1, B]
        a = codes[:, :width]
        b = codes[:, width:]
        out = fn(a, b, lens[:, 0], lens[:, 1], **kw)
        return out[None, :]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31, 63]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])  # [1, B, 2W]
        lens3 = jnp.asarray(lens[None])
        variants = [
            ("loop", wrap(multiset_intersection_loop, width)),
            ("table", wrap(multiset_intersection, width)),
        ]
        for G in (4, 8, 16):
            if G < width:
                variants.append(
                    (f"chunk{G}", wrap(multiset_intersection_chunked, width, G=G))
                )
        # correctness cross-check first (device, full block)
        ref = None
        for name, k in variants:
            out = np.asarray(jax.jit(k)(codes3[0], lens3[0]))
            if ref is None:
                ref = out
            elif not np.array_equal(ref, out):
                print(f"w{width} {name}: MISMATCH vs loop", flush=True)
                continue
        for name, k in variants:
            t = marginal_block_time(k, codes3, lens3)
            print(
                f"w{width:3d} {name:8s}: {t*1000:8.4f} ms/block "
                f"= {BLOCK/t/1e6:8.1f} M pairs/s",
                flush=True,
            )
    print("DONE")


if __name__ == "__main__":
    main()
