"""Bit-parallel longest-common-subsequence length — EXTENSION kernel.

Not a reference measure (polars-strsim has no LCS); this powers the
`lcs_seq` extension similarity lcs / max(la, lb). Same batch-in-lanes /
bit-parallel design language as the production Myers levenshtein kernel
(ops/levenshtein_myers.py): the DP row is encoded as bit vectors and one
text char advances the whole row with a handful of word ops
[Allison & Dix 1986; Crochemore et al. 2001 bit-parallel LCS].

Recurrence per text char (M = pattern-match bitmask for that char):

    U = V & M
    V = (V + U) | (V ^ U)

with V initialized to len_a ones. Because U is a bitwise subset of V, the
classical (V - U) term never borrows and equals V ^ U (pure bitwise) — and
stray carry bits that the addition pushes past bit len_a-1 can never flow
back down (adds propagate up, XOR/OR are per-bit), so V is masked back to
the first len_a bits only ONCE at the end. Both identities are
fuzz-verified against the classic DP in tests/test_extensions.py.
LCS length = len_a − popcount(V & mask(len_a)).

Multiword (L > 32): the add carries word-to-word exactly like the Myers
kernel's carry chain; the XOR stays per-word.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from strsim_tpu.ops.levenshtein_myers import (
    _SCAN_UNROLL_MAX,
    _STATIC_UNROLL_MAX,
    small_width_loop,
)

Array = jax.Array

_WORD = 32
_ALL_ONES = np.uint32(0xFFFFFFFF)


def _satmask(k: Array) -> Array:
    """Per-lane uint32 mask of the k lowest bits, saturating: k<=0 -> 0,
    k>=32 -> all ones."""
    kc = jnp.clip(k, 0, _WORD - 1).astype(jnp.uint32)
    base = (np.uint32(1) << kc) - np.uint32(1)
    return jnp.where(k >= _WORD, _ALL_ONES, jnp.where(k <= 0, np.uint32(0), base))


def lcs_length(a: Array, b: Array, len_a: Array, len_b: Array) -> Array:
    """LCS length per row pair; [B, L] padded tiles in, [B] int32 out.
    Rows with an empty side return 0."""
    B, L = a.shape
    W = -(-L // _WORD)
    u32, i32 = jnp.uint32, jnp.int32

    S = 8 if (L > _STATIC_UNROLL_MAX and B % 8 == 0) else 1
    bshape = (B,) if S == 1 else (S, B // S)

    aT = a.T  # [L, B] batch-in-lanes
    bT = b.T

    # Eq precompute per word from only the L real pattern rows (identical
    # trick to levenshtein_myers: PAD_A never equals any b char, bits past
    # len_a are 0 with no masking).
    bits = np.uint32(1) << jnp.arange(_WORD, dtype=u32)
    words = []
    for w in range(W):
        i0, i1 = w * _WORD, min((w + 1) * _WORD, L)
        eq4 = aT[None, i0:i1, :] == bT[:, None, :]
        words.append(
            jnp.sum(
                jnp.where(eq4, bits[None, : i1 - i0, None], np.uint32(0)),
                axis=1,
                dtype=u32,
            )
        )
    Eq = jnp.stack(words, axis=1).reshape(L, W, *bshape)  # [L_j, W, *bshape]

    la = len_a.reshape(bshape).astype(i32)
    lb = len_b.reshape(bshape).astype(i32)
    ww = jnp.arange(W, dtype=i32).reshape((W,) + (1,) * len(bshape))
    la_mask = _satmask(la[None] - ww * _WORD)  # [W, *bshape] first-la-bits

    v0 = la_mask  # V starts as len_a ones

    def body(j, V):
        m = lax.dynamic_slice_in_dim(Eq, j, 1, axis=0)[0]  # [W, *bshape]
        active = j < lb

        u = V & m
        carry = jnp.zeros(bshape, u32)
        new_v = []
        for w in range(W):  # add carries flow low word -> high
            t1 = V[w] + u[w]
            c1 = (t1 < u[w]).astype(u32)
            t2 = t1 + carry
            c2 = (t2 < t1).astype(u32)
            carry = c1 | c2
            new_v.append(t2 | (V[w] ^ u[w]))
        v_n = jnp.stack(new_v)
        return jnp.where(active[None], v_n, V)

    if L <= _SCAN_UNROLL_MAX:
        V = small_width_loop(L, body, v0)
    else:
        n_max = jnp.clip(jnp.max(lb), 0, L)
        V = lax.fori_loop(0, n_max, body, v0)

    ones = jnp.sum(lax.population_count(V & la_mask), axis=0).astype(i32)
    return (la - ones).reshape(B)
