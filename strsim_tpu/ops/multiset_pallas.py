"""Pallas (Mosaic) multiset-intersection kernel — W = 1 production kernel.

Reference semantics: character-multiset intersection Σ_c min(cnt_a(c),
cnt_b(c)) per row pair (src/expressions/strsim.rs:297-306, :333-343),
identical integer contract to ops.multiset_loop.multiset_intersection_chunked
via the same occurrence-rank identity: position i of a contributes 1 iff
its occurrence rank among equal chars in a is below a_i's count in b.

TPU-kernel formulation for bucket widths <= 32 (every standard bucket up to
31), same recipe as ops.levenshtein_pallas_scan: i32 char tiles in VMEM,
fully-unrolled static loops, the cnt_b/occ accumulators never leaving vector
registers — no [G, L, B] compare tensor is ever materialized and there is no
loop machinery at all.

Measured on v5e (tools/ab_multiset_pallas.py, 262144-row blocks, bit-exact
vs the XLA chunked kernel at every point): w7 4070 vs 1769 M pairs/s
(+130%), w15 1596 vs 1226 (+30%), w31 580 vs 432 (+34%), w47 237 vs 175
(+35%), w63 141 vs 101 (+39%). Grid block 8192 rows wins everywhere (and
is required at w63 — the 32768-row block trips the terminal-side Mosaic
compiler).

Off-TPU backends run the identical kernel via the Pallas interpreter
(exactness tests use this); the pipeline only selects this kernel on TPU.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.utils.encode import PAD_A, PAD_B

Array = jax.Array

_SUB = 8
_MAX_WIDTH = 64  # unrolled body; measured wins through w63, the ladder's top
DEFAULT_BLOCK_ROWS = 8192


def supports_width(L: int) -> bool:
    """True iff the unrolled kernel covers padded width L."""
    return L <= _MAX_WIDTH


def _kernel(a_ref, b_ref, la_ref, out_ref, *, L: int):
    """a_ref/b_ref: [1, L, 8, BR8] i32 chars; la: [1, 8, BR8] i32;
    out: [1, 8, BR8] i32 intersection sizes. Pads differ per side, so
    cross-side compares past either length are automatically false; within
    a, PAD_A == PAD_A hits only at positions i >= len_a, masked by i < la."""
    i32 = jnp.int32
    la = la_ref[0]
    shape = la.shape
    one = np.int32(1)
    zero = np.int32(0)

    a_rows = [a_ref[0, i] for i in range(L)]
    b_rows = [b_ref[0, j] for j in range(L)]

    inter = jnp.zeros(shape, i32)
    for i in range(L):  # static unroll: L is the bucket width
        a_i = a_rows[i]
        cnt_b = jnp.zeros(shape, i32)
        for j in range(L):
            cnt_b = cnt_b + jnp.where(b_rows[j] == a_i, one, zero)
        occ = jnp.zeros(shape, i32)
        for k in range(i):
            occ = occ + jnp.where(a_rows[k] == a_i, one, zero)
        hit = (occ < cnt_b) & (i < la)
        inter = inter + jnp.where(hit, one, zero)
    out_ref[0] = inter


def _kernel_hist(cr_ref, a_ref, b_ref, out_ref, *, L: int):
    """Wide-bucket histogram variant: Σ_c min(cnt_a(c), cnt_b(c)) looped
    over the block's ACTUAL char range [cmin, cmax] (scalar prefetch,
    computed in XLA from the tiles) — O(range · L) lane ops instead of the
    occurrence-rank kernel's O(L²). For int8/ASCII tiles range <= 128, and
    for typical name data (lowercase letters) ~26, so this wins for every
    bucket past ~w127 and dominates at 255/383/511. Pads are negative and c
    ranges over real chars (>= 0) only, so pads self-exclude — no length
    masks needed (rows with an empty side yield 0, resolved upstream)."""
    i32 = jnp.int32
    shape = a_ref.shape[2:]
    g = pl.program_id(0)
    c0 = cr_ref[g, 0]
    c1 = cr_ref[g, 1]

    def body(c, inter):
        cnt_a = jnp.zeros(shape, i32)
        cnt_b = jnp.zeros(shape, i32)
        for i in range(L):
            cnt_a = cnt_a + (a_ref[0, i] == c).astype(i32)
            cnt_b = cnt_b + (b_ref[0, i] == c).astype(i32)
        return inter + jnp.minimum(cnt_a, cnt_b)

    out_ref[0] = lax.fori_loop(c0, c1 + 1, body, jnp.zeros(shape, i32))


def multiset_intersection_hist(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
) -> Array:
    """Σ_c min(cnt_a(c), cnt_b(c)) per row via the per-block dynamic-range
    histogram kernel — the wide-bucket (L > 63) production path for
    int8/ASCII tiles. Contract identical to multiset_intersection_pallas."""
    del len_a, len_b  # pads encode validity on both sides here
    B, L = a.shape
    if a.dtype.itemsize != 1 or b.dtype.itemsize != 1:
        raise ValueError(
            "hist multiset kernel requires 8-bit tiles (bounded char range); "
            f"got {a.dtype}/{b.dtype}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32

    from strsim_tpu.ops.levenshtein_pallas_scan import _wide_block_rows

    pad_rows = 0
    if B % _SUB:
        pad_rows = _SUB - B % _SUB
        a = jnp.concatenate([a, jnp.full((pad_rows, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((pad_rows, L), PAD_B, b.dtype)], axis=0)
        B = B + pad_rows

    BR = _block_rows_for(B, _wide_block_rows(L, block_rows))
    BR8 = BR // _SUB
    G = B // BR

    a4 = a.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = b.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)

    # per-block real-char range (pads are negative): empty blocks get
    # cmin > cmax -> zero loop trips
    big = jnp.int32(1 << 30)
    real_a = jnp.where(a4 >= 0, a4, big)
    real_b = jnp.where(b4 >= 0, b4, big)
    cmin = jnp.minimum(
        jnp.min(real_a, axis=(1, 2, 3)), jnp.min(real_b, axis=(1, 2, 3))
    )
    cmax = jnp.maximum(jnp.max(a4, axis=(1, 2, 3)), jnp.max(b4, axis=(1, 2, 3)))
    cr = jnp.stack([cmin, cmax], axis=1).astype(i32)  # [G, 2]

    tile = pl.BlockSpec(
        (1, L, _SUB, BR8), lambda g, cr: (g, 0, 0, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec(
        (1, _SUB, BR8), lambda g, cr: (g, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G,),
        in_specs=[tile, tile],
        out_specs=row,
    )
    out = pl.pallas_call(
        functools.partial(_kernel_hist, L=L),
        out_shape=jax.ShapeDtypeStruct((G, _SUB, BR8), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cr, a4, b4)
    out = out.reshape(B)
    if pad_rows:
        out = out[: B - pad_rows]
    return out


def _block_rows_for(B: int, block_rows: int) -> int:
    br = min(block_rows, B)
    while B % br:
        br //= 2
    return br


def multiset_intersection_pallas(
    a: Array,
    b: Array,
    len_a: Array,
    len_b: Array,
    *,
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool | None = None,
) -> Array:
    """Σ_c min(cnt_a(c), cnt_b(c)) per row; Pallas unrolled kernel.

    a, b: [B, L] padded codepoint tiles (PAD_A / PAD_B past each length),
    any integer dtype; L must satisfy supports_width. len_a, len_b: [B]
    int32 (len_b unused — pads encode b's validity, as in the XLA kernels).
    interpret=None auto-selects the Pallas interpreter off-TPU.
    """
    del len_b
    B, L = a.shape
    if not supports_width(L):
        raise ValueError(
            f"pallas multiset kernel requires width <= {_MAX_WIDTH}, got {L}"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    i32 = jnp.int32

    pad_rows = 0
    if B % _SUB:
        pad_rows = _SUB - B % _SUB
        a = jnp.concatenate([a, jnp.full((pad_rows, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((pad_rows, L), PAD_B, b.dtype)], axis=0)
        len_a = jnp.concatenate([len_a, jnp.zeros((pad_rows,), len_a.dtype)])
        B = B + pad_rows

    BR = _block_rows_for(B, block_rows)
    BR8 = BR // _SUB
    G = B // BR

    a4 = a.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    b4 = b.T.astype(i32).reshape(L, G, _SUB, BR8).transpose(1, 0, 2, 3)
    la3 = len_a.astype(i32).reshape(G, _SUB, BR8)

    tile = pl.BlockSpec(
        (1, L, _SUB, BR8), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec((1, _SUB, BR8), lambda g: (g, 0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, L=L),
        out_shape=jax.ShapeDtypeStruct((G, _SUB, BR8), i32),
        grid=(G,),
        in_specs=[tile, tile, row],
        out_specs=row,
        interpret=interpret,
    )(a4, b4, la3)
    out = out.reshape(B)
    if pad_rows:
        out = out[: B - pad_rows]
    return out
