"""A/B: jaro bitmask scan with sublane-packed state ([W,8,B/8] vs [W,B]).

Same hypothesis as ab_myers_sublane (proven there: +42%/+54% at w15/w31):
the greedy match scan's loop state is [W,B] words + [B] counters, which
leaves 7/8 sublanes idle when the minor-2 dims are (1|W, B). The packed
variant folds the batch into (8, B/8) for the scan; the loop-free
transposition reduce keeps the original [L, L, B] layout (already full
tiles).

Usage: timeout 1800 python tools/ab_jaro_sublane.py [widths...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.jaro_bitmask import (
    _WORD,
    _ALL_ONES,
    _satmask,
    _transposition_from_masks,
    jaro_match_stats_bitmask,
)
from strsim_tpu.utils.encode import PAD_B
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
SUB = 8


def jaro_match_stats_sublane(a, b, len_a, len_b):
    B, L = a.shape
    assert B % SUB == 0
    B2 = B // SUB
    W = -(-L // _WORD)
    u32, i32 = jnp.uint32, jnp.int32
    aT, bT = a.T, b.T

    la = len_a.reshape(SUB, B2).astype(i32)
    lb = len_b.reshape(SUB, B2).astype(i32)
    bound = jnp.maximum(la, lb) // 2 - 1

    bits = np.uint32(1) << jnp.arange(_WORD, dtype=u32)
    Lp = W * _WORD
    bTp = bT
    if Lp > L:
        bTp = jnp.concatenate(
            [bT, jnp.full((Lp - L, B), PAD_B, dtype=bT.dtype)], axis=0
        )
    eq4 = bTp.reshape(W, _WORD, B)[None, :, :, :] == aT[:, None, None, :]
    EqB = jnp.sum(
        jnp.where(eq4, bits[None, None, :, None], np.uint32(0)),
        axis=2,
        dtype=u32,
    ).reshape(L, W, SUB, B2)

    def body(i, state):
        flagged, matched, m = state  # [W,8,B2] u32 x2, [8,B2] i32
        eqb = lax.dynamic_slice_in_dim(EqB, i, 1, axis=0)[0]  # [W,8,B2]
        active = (i < la) & (i < lb + bound)
        lo = i - bound
        hi = jnp.minimum(i + bound, lb - 1)

        found = jnp.zeros((SUB, B2), bool)
        new_flagged = []
        for w in range(W):
            win = _satmask(hi + 1 - w * _WORD) & ~_satmask(lo - w * _WORD)
            cand = eqb[w] & ~flagged[w] & win & jnp.where(active, _ALL_ONES, 0)
            cand = jnp.where(found, np.uint32(0), cand)
            lsb = cand & (~cand + np.uint32(1))
            new_flagged.append(flagged[w] | lsb)
            found = found | (cand != 0)

        flagged = jnp.stack(new_flagged)
        iw = jnp.asarray(i // _WORD, dtype=i32)
        ib = jnp.asarray(i % _WORD, dtype=u32)
        setbit = jnp.where(found, np.uint32(1) << ib, np.uint32(0))
        if W == 1:
            matched = matched.at[0].set(matched[0] | setbit)
        else:
            ww = jnp.arange(W, dtype=i32)[:, None, None]
            matched = matched | jnp.where(
                ww == iw, setbit[None, :, :], np.uint32(0)
            )
        m = m + found.astype(i32)
        return flagged, matched, m

    state0 = (
        jnp.zeros((W, SUB, B2), u32),
        jnp.zeros((W, SUB, B2), u32),
        jnp.zeros((SUB, B2), i32),
    )
    i_max = jnp.clip(jnp.max(jnp.minimum(la, lb + bound)), 0, L)
    flagged, matched, m = lax.fori_loop(0, i_max, body, state0)

    m = m.reshape(B)
    t = _transposition_from_masks(
        aT, bT, matched.reshape(W, B), flagged.reshape(W, B)
    )

    one_one = (len_a == 1) & (len_b == 1)
    eq11 = aT[0, :] == bT[0, :]
    m = jnp.where(one_one, eq11.astype(jnp.int32), m)
    t = jnp.where(one_one, 0, t)
    return m, t


def make_inputs(width, seed=0):
    rng = np.random.default_rng(seed)
    packed = rng.integers(97, 123, size=(BLOCK, 2 * width), dtype=np.int32)
    lens = rng.integers(1, width + 1, size=(BLOCK, 2), dtype=np.int32)
    pos = np.arange(width)[None, :]
    packed[:, :width][pos >= lens[:, :1]] = -1
    packed[:, width:][pos >= lens[:, 1:2]] = -2
    return packed.astype(np.int8), lens


def wrap(fn, width):
    def kernel(codes, lens):
        m, t = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1])
        return jnp.stack([m, t])

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(jaro_match_stats_bitmask, width)
        pack = wrap(jaro_match_stats_sublane, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        r1 = np.asarray(jax.jit(pack)(codes3[0], lens3[0]))
        tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
        for name, k in (("jaro", base), ("jaro8", pack)):
            t = marginal_block_time(k, codes3, lens3)
            print(
                f"w{width:3d} {name:8s}: {t*1000:8.4f} ms/block "
                f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                flush=True,
            )
    print("DONE")


if __name__ == "__main__":
    main()
