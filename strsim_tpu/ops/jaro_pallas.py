"""Pallas TPU kernel: Jaro greedy windowed matching.

STATUS: experimental. Compiles and matches the XLA kernel exactly on TPU,
but at the current 512-lane grid granularity it measured well below the XLA
formulation (which is the production default, config.jaro_impl="xla").
Revisit with larger blocks once the environment's Mosaic compiler updates.

The greedy flag-setting scan (reference src/expressions/strsim.rs:208-219) is
the loop-carried part of Jaro: the b-side flag vector must update before the
next a-char is processed. This kernel runs that scan with all state resident
in VMEM, batch-in-lanes ([L, BR]: b-position on sublanes, row pairs on lanes):

  per step i (L sequential steps):
    candidate mask = (b == a_i) & unflagged & window(i) & active
    first match    = candidate & (inclusive-cumsum == 1)     (priority select)
    flags, match-count update                                 (elementwise)

The transposition count (strsim.rs:220-237) is order-dependent but not
loop-carried — it's a compaction + compare, computed outside in XLA from the
flag tensors this kernel emits (argsort-based, one pass).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from strsim_tpu.utils.encode import PAD_A, PAD_B


def _kernel(a_sh_ref, b_sh_ref, len_a_ref, len_b_ref, m_ref, ma_ref, fb_ref, *, L: int):
    BR = a_sh_ref.shape[1]
    len_a = len_a_ref[:]                      # [1, BR]
    len_b = len_b_ref[:]
    bound = jnp.maximum(len_a, len_b) // 2 - 1
    b_sh = b_sh_ref[:]                        # [L, BR]
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, BR), 0)
    win_static = jj < len_b                   # j inside b

    def body(i, state):
        flagged_b, matched_a, m = state
        a_i = a_sh_ref[pl.ds(i, 1), :]        # [1, BR]
        active = (i < len_a) & (i < len_b + bound)
        win = (jj >= i - bound) & (jj <= i + bound) & win_static
        cand = (b_sh == a_i) & (flagged_b == 0) & win & active
        # first candidate = min masked index (Mosaic has no cumsum primitive)
        first_idx = jnp.min(jnp.where(cand, jj, L), axis=0, keepdims=True)
        found = (first_idx < L).astype(jnp.int32)     # [1, BR]
        flagged_b = flagged_b | ((jj == first_idx) & (found > 0)).astype(jnp.int32)
        matched_a = jnp.where(jj == i, found, matched_a)
        m = m + found
        return flagged_b, matched_a, m

    zero = jnp.zeros((L, BR), jnp.int32)
    flagged_b, matched_a, m = lax.fori_loop(
        0, L, body, (zero, zero, jnp.zeros((1, BR), jnp.int32))
    )
    m_ref[:] = m
    ma_ref[:] = matched_a
    fb_ref[:] = flagged_b


def jaro_match_stats_pallas(
    a: jax.Array,
    b: jax.Array,
    len_a: jax.Array,
    len_b: jax.Array,
    *,
    block_rows: int = 512,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in for stats.jaro_match_stats: returns (m, t) int32 [R]."""
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

    a_sh = a.T                                  # [L, Rp]
    b_sh = b.T
    la2 = len_a.astype(jnp.int32)[None, :]
    lb2 = len_b.astype(jnp.int32)[None, :]

    grid = (Rp // BR,)
    vec_spec = pl.BlockSpec((1, BR), lambda g: (0, g), memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((L, BR), lambda g: (0, g), memory_space=pltpu.VMEM)
    m2, ma, fb = pl.pallas_call(
        functools.partial(_kernel, L=L),
        out_shape=(
            jax.ShapeDtypeStruct((1, Rp), jnp.int32),
            jax.ShapeDtypeStruct((L, Rp), jnp.int32),
            jax.ShapeDtypeStruct((L, Rp), jnp.int32),
        ),
        grid=grid,
        in_specs=[tile_spec, tile_spec, vec_spec, vec_spec],
        out_specs=(vec_spec, tile_spec, tile_spec),
        cost_estimate=pl.CostEstimate(
            flops=12 * Rp * L * L, bytes_accessed=Rp * L * 24, transcendentals=0
        ),
        interpret=interpret,
    )(a_sh, b_sh, la2, lb2)

    from strsim_tpu.ops.stats import transposition_count

    m = m2[0, :R]
    # transposition pass (XLA rank-match scan) on the [L, BR] flag tensors
    t = transposition_count(
        a_sh[:, :R], b_sh[:, :R], ma[:, :R].astype(bool), fb[:, :R].astype(bool)
    )
    # len-1 vs len-1: direct char compare (strsim.rs:197-199); window is empty
    la_r = len_a[:R].astype(jnp.int32)
    lb_r = len_b[:R].astype(jnp.int32)
    one_one = (la_r == 1) & (lb_r == 1)
    m = jnp.where(one_one, (a_sh[0, :R] == b_sh[0, :R]).astype(jnp.int32), m)
    t = jnp.where(one_one, 0, t)
    return m, t
