"""Pallas TPU kernel: anti-diagonal wavefront Levenshtein distance.

STATUS: experimental — interpret-mode verified (exact); this environment's
terminal-side Mosaic compiler faults on the kernel (SIGABRT), so it cannot
run compiled here. The XLA wavefront (config.levenshtein_impl="xla") is the
production path; this formulation is the VMEM-resident design to promote when
the compiler allows (modeled >=3x from removing loop-carry HBM traffic).

Same recurrence as the XLA version (ops/stats.py levenshtein_distance) but with
the working set pinned in VMEM and a batch-in-lanes layout:

  * state diagonals are [L+1, BR] — DP index i on the sublane axis, row pairs
    on the 128-wide lane axis, so every vector op covers BR pairs at once and
    the sublane shift (diag[i-1]) is a cheap roll;
  * the per-diagonal b-character vector is a dynamic sublane slice of a
    precomputed [3L, BR] reversed+padded tile, one slice per step;
  * 2L-1 sequential steps per block, zero HBM traffic inside the loop.

The kernel computes the same integer distances as the reference's rolling
two-column DP (src/expressions/strsim.rs:146-159); rows with an empty side are
finalized on host (distance = max(len)).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.utils.encode import PAD_A, PAD_B


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _kernel(a_sh_ref, b_ext_ref, len_a_ref, len_b_ref, out_ref, *, L: int):
    # Lp = sublane-padded state height (L+1 rounded to a multiple of 8); extra
    # rows hold pad chars, never capture, and garbage flows only downward —
    # same self-correcting argument as the XLA wavefront.
    BIG = jnp.int32(2 * L + 5)
    Lp = a_sh_ref.shape[0]
    BR = a_sh_ref.shape[1]

    a_sh = a_sh_ref[:]                       # [Lp, BR]
    ii = jax.lax.broadcasted_iota(jnp.int32, (Lp, BR), 0)
    len_a = len_a_ref[:]                     # [1, BR]
    target_d = len_a + len_b_ref[:]          # [1, BR]
    lane_a = ii == len_a                     # broadcast [Lp, BR]

    diag0 = jnp.where(ii == 0, 0, BIG)
    diag1 = jnp.where(ii <= 1, 1, BIG)

    big_row = jnp.full((1, BR), BIG, jnp.int32)

    def shift_down(x):
        # x[i] ← x[i-1]; row 0 ← BIG (concat-shift: pltpu.roll hits a Mosaic
        # compiler fault on this environment's terminal-side compiler)
        return jnp.concatenate([big_row, x[:-1, :]], axis=0)

    pad_dtype = a_sh_ref.dtype

    def body(d, state):
        prev, prev2, acc, bs = state
        # shift-register for the b anti-diagonal: row i holds b[d-1-i];
        # one ascending single-row dynamic read per step
        b_row = b_ext_ref[pl.ds(d - 1, 1), :]
        bs = jnp.concatenate([b_row, bs[:-1, :]], axis=0)
        cost = (a_sh != bs).astype(jnp.int32)
        new = jnp.minimum(
            jnp.minimum(shift_down(prev) + 1, prev + 1),
            shift_down(prev2) + cost,
        )
        hit = (target_d == d) & lane_a
        acc = acc + jnp.sum(jnp.where(hit, new, 0), axis=0, keepdims=True)
        return new, prev, acc, bs

    bs0 = jnp.concatenate(
        [
            b_ext_ref[pl.ds(0, 1), :],
            jnp.full((Lp - 1, BR), -2, pad_dtype),  # PAD_B rows
        ],
        axis=0,
    )
    _, _, acc, _ = lax.fori_loop(
        2, 2 * L + 1, body, (diag1, diag0, jnp.zeros((1, BR), jnp.int32), bs0)
    )
    out_ref[:] = acc


def levenshtein_distance_pallas(
    a: jax.Array,
    b: jax.Array,
    len_a: jax.Array,
    len_b: jax.Array,
    *,
    block_rows: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Drop-in for stats.levenshtein_distance. a,b: [R, L] int32 padded tiles;
    returns [R] int32 distances (valid where both lengths >= 1)."""
    if interpret is None:  # Mosaic only exists on TPU; interpret elsewhere
        interpret = jax.default_backend() != "tpu"
    R, L = a.shape
    BR = min(block_rows, max(128, R))
    if R % BR:
        padr = BR - R % BR
        a = jnp.concatenate([a, jnp.full((padr, L), PAD_A, a.dtype)], axis=0)
        b = jnp.concatenate([b, jnp.full((padr, L), PAD_B, b.dtype)], axis=0)
        len_a = jnp.concatenate([len_a, jnp.zeros(padr, len_a.dtype)])
        len_b = jnp.concatenate([len_b, jnp.zeros(padr, len_b.dtype)])
    Rp = a.shape[0]

    # batch-in-lanes preprocessing (plain XLA, fused into the surrounding jit)
    # with sublane dimensions padded to multiples of 8 (Mosaic block shapes)
    Lp = _round8(L + 1)
    ext_rows = _round8(2 * L)
    a_sh = jnp.concatenate(
        [
            jnp.full((Rp, 1), PAD_A, a.dtype),
            a,
            jnp.full((Rp, Lp - (L + 1)), PAD_A, a.dtype),
        ],
        axis=1,
    ).T  # [Lp, Rp]
    # plain b rows + PAD tail: the kernel shift-registers one row per diagonal
    b_ext = jnp.concatenate(
        [b, jnp.full((Rp, ext_rows - L), PAD_B, b.dtype)], axis=1
    ).T  # [ext_rows, Rp]
    la2 = len_a.astype(jnp.int32)[None, :]
    lb2 = len_b.astype(jnp.int32)[None, :]

    grid = (Rp // BR,)
    out = pl.pallas_call(
        functools.partial(_kernel, L=L),
        out_shape=jax.ShapeDtypeStruct((1, Rp), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lp, BR), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((ext_rows, BR), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BR), lambda g: (0, g), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BR), lambda g: (0, g), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=10 * Rp * (2 * L - 1) * (L + 1), bytes_accessed=Rp * L * 16, transcendentals=0
        ),
        interpret=interpret,
    )(a_sh, b_ext, la2, lb2)
    return out[0, :R]
