"""A/B: jaro transposition-count formulations (the measure's dominant term).

The production loop-free transposition (`_transposition_from_masks`) builds a
[L, L, B] pair tensor from 5 broadcast ops per cell (fa&fb, ra==rb, a!=b,
two &s). Two exact alternatives:

  * sentinel — fold the match flags INTO the ranks (unmatched a-rank = -1,
    unmatched b-rank = -2; sentinels never compare equal), cutting the
    [L, L, B] work to 3 ops per cell (==, !=, &).
  * sort — avoid L² entirely: compact each side's matched chars by rank with
    one lax.sort over the L axis (key = rank if matched else L, value =
    char), then t = sum over r < m of (ac[r] != bc[r]) — O(B·L·log²L)
    compare network vs O(B·L²) table.

Both preserve the reference pairing semantics exactly (r-th matched a-char
vs r-th flagged b-char, strsim.rs:220-237): the scan is byte-identical, only
the rank-alignment evaluation changes. Exactness is asserted vs the
production kernel on every run before timing.

Usage: timeout 1800 python tools/ab_jaro_transpose.py [widths...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import strsim_tpu.ops.jaro_bitmask as jb
from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
_WORD = 32


def _expand(mask, L):
    """[W, B] packed mask -> (bit [L, B] bool, rank [L, B] i32) — identical
    math to the production _transposition_from_masks internals."""
    i32, _ = jnp.int32, jnp.uint32
    W = mask.shape[0]
    jj = jnp.arange(L, dtype=i32)
    jw = jj // _WORD
    jb_ = (jj % _WORD).astype(jnp.uint32)
    ww = jnp.arange(W, dtype=i32)
    below = jb._satmask(jj[:, None] - ww[None, :] * _WORD)  # [L, W]
    sel = mask[jw, :]
    bit = (sel >> jb_[:, None]) & 1
    pc = lax.population_count(mask[None, :, :] & below[:, :, None])
    rank = jnp.sum(pc, axis=1).astype(i32)
    return bit.astype(bool), rank


def transposition_sentinel(aT, bT, matched, flagged):
    L, B = aT.shape
    fa, ra = _expand(matched, L)
    fb, rb = _expand(flagged, L)
    ra_s = jnp.where(fa, ra, -1)  # sentinels never equal across sides
    rb_s = jnp.where(fb, rb, -2)
    pair = (ra_s[:, None, :] == rb_s[None, :, :]) & (
        aT[:, None, :] != bT[None, :, :]
    )
    return jnp.sum(pair, axis=(0, 1)).astype(jnp.int32)


def transposition_sort(aT, bT, matched, flagged):
    L, B = aT.shape
    i32 = jnp.int32
    fa, ra = _expand(matched, L)
    fb, rb = _expand(flagged, L)
    key_a = jnp.where(fa, ra, L).T  # [B, L]; unmatched sort to the tail
    key_b = jnp.where(fb, rb, L).T
    ka, va = lax.sort((key_a, aT.T.astype(i32)), dimension=1, num_keys=1)
    kb, vb = lax.sort((key_b, bT.T.astype(i32)), dimension=1, num_keys=1)
    # both sides have exactly m in-range keys (0..m-1): r-th matched a-char
    # aligns with r-th flagged b-char at sorted position r
    t = jnp.sum((ka < L) & (va != vb), axis=1)
    return t.astype(i32)


def make_kernel(trans, width):
    def kernel(codes, lens):
        old = jb._transposition_from_masks
        jb._transposition_from_masks = trans
        try:
            m, t = jb.jaro_match_stats_bitmask(
                codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1]
            )
        finally:
            jb._transposition_from_masks = old
        return jnp.stack([m, t])

    return kernel


def make_inputs(width, seed=0, block=BLOCK):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(block, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(block, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = -1
    packed[:, width:][pos >= lens[:, 1:2]] = -2
    return packed.astype(np.int8), lens


VARIANTS = (
    ("base", jb._transposition_from_masks),
    ("sentinel", transposition_sentinel),
    ("sort", transposition_sort),
)


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        ref = None
        for name, trans in VARIANTS:
            k = make_kernel(trans, width)
            r = np.asarray(jax.jit(k)(codes3[0], lens3[0]))
            if ref is None:
                ref = r
            tag = "" if np.array_equal(ref, r) else "  MISMATCH!"
            t = marginal_block_time(k, codes3, lens3)
            print(
                f"w{width:3d} {name:9s}: {t*1000:8.4f} ms/block "
                f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                flush=True,
            )
    print("DONE")


if __name__ == "__main__":
    main()
