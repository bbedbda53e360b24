"""Polars expression layer (optional).

Recreates the reference's expression-plugin surface
(polars_strsim/__init__.py:8-60 + utils.py:6-43) without a Rust cdylib: each
measure builds a `pl.Expr` from a struct of the two coerced inputs and
evaluates batches through the TPU engine via map_batches with
is_elementwise=True — the same row-local/streamable contract the reference
declares through register_plugin_function(is_elementwise=True).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import polars as pl

from strsim_tpu.config import StrsimConfig


def parse_into_expr(
    expr,
    *,
    str_as_lit: bool = False,
    list_as_lit: bool = True,
    dtype=None,
) -> "pl.Expr":
    """Coerce an input into an expression (semantics of polars_strsim
    utils.py:34-43: Expr passes through, str → pl.col, list → lit/Series,
    other scalars → typed lit)."""
    if isinstance(expr, pl.Expr):
        return expr
    if isinstance(expr, str) and not str_as_lit:
        return pl.col(expr)
    if isinstance(expr, list) and not list_as_lit:
        return pl.lit(pl.Series(expr), dtype=dtype)
    return pl.lit(expr, dtype=dtype)


def build_expr(
    measure: str, expr, other, config: Optional[StrsimConfig] = None
) -> "pl.Expr":
    a = parse_into_expr(expr, dtype=pl.Utf8)
    b = parse_into_expr(other, dtype=pl.Utf8)

    def _batch(s: pl.Series) -> pl.Series:
        from strsim_tpu.models.pipeline import compute_scores

        col_a = s.struct.field("__strsim_a").to_list()
        col_b = s.struct.field("__strsim_b").to_list()
        values, validity = compute_scores(col_a, col_b, (measure,), config=config)[measure]
        out = values.copy()
        return pl.Series(measure, [v if ok else None for v, ok in zip(out, validity)], dtype=pl.Float64)

    return (
        pl.struct(a.alias("__strsim_a"), b.alias("__strsim_b"))
        .map_batches(_batch, return_dtype=pl.Float64, is_elementwise=True)
        .alias(measure)
    )
