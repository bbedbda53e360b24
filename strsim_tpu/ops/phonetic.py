"""Phonetic encoders on device: vectorized American Soundex.

EXTENSION — the reference (foxcroftjn/polars-strsim) ships no phonetic
measures; record-linkage pipelines almost always pair string-similarity
scoring with phonetic keying (blocking) and phonetic-equality features, so the
engine provides Soundex as (a) a device measure (`soundex`: codes equal → 1.0)
and (b) a key generator for the blocking subsystem (models/blocking.py).

Spec (classic American Soundex, the US-census variant with the H/W rule —
the same algorithm as e.g. the National Archives definition):

  1. Only ASCII letters [A-Za-z] participate; every other character
     (digits, punctuation, non-ASCII) is skipped with NO effect on state.
  2. The first letter is kept (uppercased).
  3. Remaining letters map to digit classes
       BFPV→1  CGJKQSXZ→2  DT→3  L→4  MN→5  R→6  AEIOUYHW→0 (not coded)
  4. A letter whose digit equals the digit of the PREVIOUS letter is not
     coded, where H and W are transparent (they do not update "previous")
     and vowels A,E,I,O,U,Y reset "previous" to 0. The first letter's digit
     seeds "previous" (so "Pfister" → P236, not P123).
  5. The code is the first letter plus the first 3 digits, zero-padded
     ("Lee" → L000). A string with no letters has the empty code.

Packed representation: `first_letter_ordinal * 1000 + d1*100 + d2*10 + d3`
(e.g. "Robert" → R163 → 82163); the empty code packs to 0. Packing is
injective, so code equality ≡ packed equality, and codes stay printable
(utils: unpack_soundex).

All four implementations (this XLA kernel, the Python oracle
ops/oracle.py:soundex_code, the C++ scalar native/strsim_host.cpp:soundex_code,
and the numpy host path in models/blocking.py) implement this spec and are
differentially tested against each other.

Kernel shape: one fori_loop over string positions with [B] int32 state
(first, prev, count, code) and batch-in-lanes tiles — the same layout as the
jaro scan (ops/stats.py:jaro_match_stats). Cost is O(L) cheap VPU ops per
pair: negligible next to any O(L·w) similarity kernel it fuses with.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

# digit class per letter A..Z (index 0 = 'A')
_SOUNDEX_DIGITS = np.array(
    [0, 1, 2, 3, 0, 1, 2, 0, 0, 2, 2, 4, 5, 5, 0, 1, 2, 6, 2, 3, 0, 1, 0, 2, 0, 2],
    dtype=np.int32,
)
# A B  C  D  E  F  G  H  I  J  K  L  M  N  O  P  Q  R  S  T  U  V  W  X  Y  Z


def soundex_code(a: Array, len_a: Array) -> Array:
    """Packed soundex codes per row: [B, L] codepoint tile → [B] int32.

    Pads (negative) and non-letters are skipped by rule 1, so no length
    masking is needed; `len_a` only bounds the trip count.
    """
    B, L = a.shape
    aT = a.T.astype(jnp.int32)  # [L, B] batch-in-lanes
    table = jnp.asarray(_SOUNDEX_DIGITS)
    pow10 = jnp.asarray(np.array([100, 10, 1, 0], dtype=np.int32))

    def body(i, state):
        first, prev, count, code = state
        c = lax.dynamic_slice_in_dim(aT, i, 1, axis=0)[0]  # [B]
        is_up = (c >= 65) & (c <= 90)
        is_lo = (c >= 97) & (c <= 122)
        u = jnp.where(is_lo, c - 32, c)
        is_letter = is_up | is_lo
        d = jnp.where(
            is_letter, jnp.take(table, jnp.clip(u - 65, 0, 25), axis=0), 0
        )
        is_hw = (u == 72) | (u == 87)
        no_first = first == 0
        emit = is_letter & ~no_first & (d != 0) & (d != prev) & (count < 3)
        code = jnp.where(
            emit, code + d * jnp.take(pow10, jnp.clip(count, 0, 3)), code
        )
        count = jnp.where(emit, count + 1, count)
        first = jnp.where(is_letter & no_first, u, first)
        prev = jnp.where(
            is_letter,
            jnp.where(no_first, d, jnp.where(is_hw, prev, d)),
            prev,
        )
        return first, prev, count, code

    zero = jnp.zeros((B,), jnp.int32)
    i_max = jnp.clip(jnp.max(len_a), 0, L) if B else 0
    first, _, _, code = lax.fori_loop(0, i_max, body, (zero, zero, zero, zero))
    return jnp.where(first == 0, 0, first * 1000 + code).astype(jnp.int32)


def soundex_equal(a: Array, b: Array, len_a: Array, len_b: Array) -> Array:
    """1 where the two rows' soundex codes are identical (the `sdx_eq` stat).

    Two strings with no letters (both codes empty) compare equal; the
    pipeline's empty-side fast path keeps the reference-wide one-side-empty →
    0.0 convention before this stat is ever consulted.
    """
    return (soundex_code(a, len_a) == soundex_code(b, len_b)).astype(jnp.int32)
