"""A/B: Myers levenshtein with sublane-packed state ([W,8,B/8] vs [W,B]).

Hypothesis (docs/ROOFLINE.md "known headroom" #2): the production Myers
kernel's loop state is [W=1, B] u32 plus [B] carries; if XLA assigns the
size-1 major dim to the 8-sublane axis, every per-step elementwise op runs at
1/8 VPU utilization. Folding the batch into (8, B/8) makes the minor two dims
fill an (8, 128) tile exactly (B/8 = 32768 is lane-aligned, so the reshapes
are layout bitcasts).

Usage: timeout 1800 python tools/ab_myers_sublane.py [widths...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.models.pipeline import _ensure_compile_cache
from strsim_tpu.ops.levenshtein_myers import (
    _STATIC_UNROLL_MAX,
    _WORD,
    _ALL_ONES,
    levenshtein_distance_myers,
    small_width_loop,
)
from strsim_tpu.utils.encode import PAD_A
from strsim_tpu.utils.devicetime import marginal_block_time

BLOCK = 262144
SUB = 8


def levenshtein_myers_sublane(a, b, len_a, len_b):
    """Same integer distances as levenshtein_distance_myers; state reshaped
    so the batch occupies the (sublane, lane) minor dims as (8, B/8)."""
    B, L = a.shape
    assert B % SUB == 0, B
    B2 = B // SUB
    W = -(-L // _WORD)
    Lp = W * _WORD
    u32, i32 = jnp.uint32, jnp.int32

    aT, bT = a.T, b.T
    if Lp > L:
        aT = jnp.concatenate(
            [aT, jnp.full((Lp - L, B), PAD_A, dtype=aT.dtype)], axis=0
        )

    bits = np.uint32(1) << jnp.arange(_WORD, dtype=u32)
    eq4 = aT.reshape(W, _WORD, B)[None, :, :, :] == bT[:, None, None, :]
    Eq = jnp.sum(
        jnp.where(eq4, bits[None, None, :, None], np.uint32(0)),
        axis=2,
        dtype=u32,
    ).reshape(L, W, SUB, B2)

    la = len_a.reshape(SUB, B2)
    lb = len_b.reshape(SUB, B2)
    m1 = jnp.maximum(la - 1, 0)
    hword = m1 // _WORD
    hbit = (m1 % _WORD).astype(u32)

    pv0 = jnp.full((W, SUB, B2), _ALL_ONES, dtype=u32)
    mv0 = jnp.zeros((W, SUB, B2), dtype=u32)
    score0 = la.astype(i32)

    def body(j, state):
        pv, mv, score = state
        eq = lax.dynamic_slice_in_dim(Eq, j, 1, axis=0)[0]  # [W, 8, B2]
        active = j < lb  # [8, B2]

        carry = jnp.zeros((SUB, B2), u32)
        ph_in = jnp.ones((SUB, B2), u32)
        mh_in = jnp.zeros((SUB, B2), u32)
        ph_bit = jnp.zeros((SUB, B2), u32)
        mh_bit = jnp.zeros((SUB, B2), u32)
        new_pv = []
        new_mv = []
        for w in range(W):
            eq_w, pv_w, mv_w = eq[w], pv[w], mv[w]
            x = eq_w & pv_w
            s1 = x + pv_w
            c1 = (s1 < x).astype(u32)
            s2 = s1 + carry
            c2 = (s2 < s1).astype(u32)
            carry = c1 | c2
            xh = (s2 ^ pv_w) | eq_w
            xv = eq_w | mv_w
            ph = mv_w | ~(xh | pv_w)
            mh = pv_w & xh
            if W == 1:
                ph_bit = (ph >> hbit) & 1
                mh_bit = (mh >> hbit) & 1
            else:
                sel = hword == w
                ph_bit = jnp.where(sel, (ph >> hbit) & 1, ph_bit)
                mh_bit = jnp.where(sel, (mh >> hbit) & 1, mh_bit)
            ph_out = ph >> (_WORD - 1)
            mh_out = mh >> (_WORD - 1)
            ph_s = (ph << 1) | ph_in
            mh_s = (mh << 1) | mh_in
            ph_in, mh_in = ph_out, mh_out
            new_pv.append(mh_s | ~(xv | ph_s))
            new_mv.append(ph_s & xv)

        delta = ph_bit.astype(i32) - mh_bit.astype(i32)
        score = score + jnp.where(active, delta, 0)
        pv_n = jnp.stack(new_pv)
        mv_n = jnp.stack(new_mv)
        act = active[None]
        return (
            jnp.where(act, pv_n, pv),
            jnp.where(act, mv_n, mv),
            score,
        )

    if L <= _STATIC_UNROLL_MAX:
        _, _, score = small_width_loop(L, body, (pv0, mv0, score0))
    else:
        n_max = jnp.clip(jnp.max(lb), 0, L)
        _, _, score = lax.fori_loop(0, n_max, body, (pv0, mv0, score0))
    return score.astype(i32).reshape(B)


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
        out = fn(codes[:, :width], codes[:, width:], lens[:, 0], lens[:, 1])
        return out[None, :]

    return kernel


def main():
    _ensure_compile_cache()
    widths = [int(w) for w in sys.argv[1:]] or [7, 15, 31]
    for width in widths:
        packed, lens = make_inputs(width)
        codes3 = jnp.asarray(packed[None])
        lens3 = jnp.asarray(lens[None])
        base = wrap(levenshtein_distance_myers, width)
        pack = wrap(levenshtein_myers_sublane, width)
        r0 = np.asarray(jax.jit(base)(codes3[0], lens3[0]))
        r1 = np.asarray(jax.jit(pack)(codes3[0], lens3[0]))
        tag = "" if np.array_equal(r0, r1) else "  MISMATCH!"
        for name, k in (("myers", base), ("myers8", pack)):
            t = marginal_block_time(k, codes3, lens3)
            print(
                f"w{width:3d} {name:8s}: {t*1000:8.4f} ms/block "
                f"= {BLOCK/t/1e6:8.1f} M pairs/s{tag}",
                flush=True,
            )
    print("DONE")


if __name__ == "__main__":
    main()
