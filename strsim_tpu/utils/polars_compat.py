"""Polars expression layer.

Recreates the reference's expression-plugin surface
(polars_strsim/__init__.py:8-60 + utils.py:6-43) without a Rust cdylib: each
measure builds a `pl.Expr` from a struct of the two coerced inputs and
evaluates batches through the TPU engine via map_batches with
is_elementwise=True — the same row-local/streamable contract the reference
declares through register_plugin_function(is_elementwise=True).

Backend selection: real polars when importable; otherwise (or when the inputs
are minipl expressions) strsim_tpu.minipl — an in-repo engine implementing
exactly this API subset, so the expression layer executes and is tested even
in environments where polars cannot be installed.
"""
from __future__ import annotations

from typing import Optional

from strsim_tpu import minipl as _minipl
from strsim_tpu.config import StrsimConfig

try:  # optional dependency; minipl is the executable fallback
    import polars as _polars
except Exception:  # pragma: no cover
    _polars = None


def backend_for(*maybe_exprs):
    """The expression backend module for these inputs: minipl if any input is
    a minipl.Expr, else real polars when importable, else minipl."""
    if any(isinstance(e, _minipl.Expr) for e in maybe_exprs):
        return _minipl
    return _polars if _polars is not None else _minipl


def parse_into_expr(
    expr,
    *,
    str_as_lit: bool = False,
    list_as_lit: bool = True,
    dtype=None,
    pl=None,
):
    """Coerce an input into an expression (semantics of polars_strsim
    utils.py:34-43: Expr passes through, str → pl.col, list → lit/Series,
    other scalars → typed lit)."""
    pl = pl or backend_for(expr)
    if isinstance(expr, pl.Expr):
        return expr
    if isinstance(expr, str) and not str_as_lit:
        return pl.col(expr)
    if isinstance(expr, list) and not list_as_lit:
        return pl.lit(pl.Series(expr), dtype=dtype)
    return pl.lit(expr, dtype=dtype)


def build_expr(
    measure: str, expr, other, config: Optional[StrsimConfig] = None,
    preprocess=None,
):
    pl = backend_for(expr, other)
    a = parse_into_expr(expr, dtype=pl.Utf8, pl=pl)
    b = parse_into_expr(other, dtype=pl.Utf8, pl=pl)

    def _batch(s):
        from strsim_tpu.models.pipeline import compute_scores

        col_a = s.struct.field("__strsim_a").to_list()
        col_b = s.struct.field("__strsim_b").to_list()
        if preprocess is not None:  # normalization is per-row → streamable
            from strsim_tpu.utils.preprocess import preprocess_column

            col_a = preprocess_column(col_a, preprocess)
            col_b = preprocess_column(col_b, preprocess)
        values, validity = compute_scores(col_a, col_b, (measure,), config=config)[measure]
        return pl.Series(
            measure,
            [v if ok else None for v, ok in zip(values, validity)],
            dtype=pl.Float64,
        )

    return (
        pl.struct(a.alias("__strsim_a"), b.alias("__strsim_b"))
        .map_batches(_batch, return_dtype=pl.Float64, is_elementwise=True)
        .alias(measure)
    )
