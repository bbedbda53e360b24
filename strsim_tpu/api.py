"""Public API: the five measure functions plus batch entry points.

Mirrors the reference's Python surface (polars_strsim/__init__.py:8-69):
`levenshtein(expr, other)` etc. When polars is installed and the inputs look
like expressions (pl.Expr or str column names), each function returns a lazy
`pl.Expr` that evaluates through this engine — the reference's plugin-expr
contract, including `is_elementwise=True` streamability
(polars_strsim/__init__.py:15). Otherwise the functions operate eagerly on
array-like columns (lists / numpy arrays / polars or arrow series) and return
a float64 numpy array with NaN at null rows.

Input coercion follows parse_into_expr (polars_strsim/utils.py:34-43):
pl.Expr passes through, str → pl.col(name); non-expression scalars become
Utf8 literals. In array mode (no polars), a plain Python str argument is
treated as a broadcast literal via `lit()` since there is no column namespace.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from strsim_tpu.config import StrsimConfig
from strsim_tpu.models.measures import MEASURE_NAMES, resolve_measures
from strsim_tpu.models.pipeline import compute_scores

from strsim_tpu import minipl

try:  # optional dependency; the engine is fully functional without it
    import polars as pl
except Exception:  # pragma: no cover
    pl = None


class Literal:
    """A string literal to broadcast against a column (array mode)."""

    def __init__(self, value: Optional[str]):
        self.value = value


def lit(value: Optional[str]) -> Literal:
    return Literal(value)


def _is_expr_input(x) -> bool:
    # minipl expressions always route to the expression layer; bare strings
    # only count as column references when real polars provides the column
    # namespace (otherwise array mode treats them as broadcast literals).
    if isinstance(x, minipl.Expr):
        return True
    if pl is None:
        return False
    return isinstance(x, (pl.Expr,)) or isinstance(x, str)


def _as_column(x):
    if isinstance(x, Literal):
        return [x.value]
    if isinstance(x, str):
        # array mode: a bare str is a broadcast literal (no column namespace)
        return [x]
    if x is None:
        raise ValueError("cannot broadcast a null literal")
    return x


def _maybe_preprocess(col, steps):
    if steps is None:
        return col
    from strsim_tpu.utils.preprocess import preprocess_column

    return preprocess_column(col, steps)


def compute_with_validity(
    measure: str, a, b, config: Optional[StrsimConfig] = None, preprocess=None
) -> Tuple[np.ndarray, np.ndarray]:
    """(values f64, validity bool) for one measure over two columns.

    `preprocess`: optional normalization steps applied to BOTH columns before
    encoding (utils/preprocess.py) — e.g. ("casefold", "strip_accents",
    "token_sort") for order-insensitive accent-folded matching."""
    (m,) = resolve_measures(measure)
    res = compute_scores(
        _maybe_preprocess(_as_column(a), preprocess),
        _maybe_preprocess(_as_column(b), preprocess),
        (m,),
        config=config,
    )
    return res[m]


def compute(
    measure: str, a, b, config: Optional[StrsimConfig] = None, preprocess=None
) -> np.ndarray:
    """Scores for one measure; NaN marks null rows. See compute_with_validity
    for `preprocess`."""
    values, _ = compute_with_validity(measure, a, b, config, preprocess)
    return values


def compute_many(
    measures: Sequence[str], a, b, config: Optional[StrsimConfig] = None,
    preprocess=None,
) -> Dict[str, np.ndarray]:
    """Scores for several measures in one fused device pass (shared stats,
    shared encode) — the fused-measure mode of BASELINE.json config 4."""
    measures = resolve_measures(measures)
    res = compute_scores(
        _maybe_preprocess(_as_column(a), preprocess),
        _maybe_preprocess(_as_column(b), preprocess),
        measures,
        config=config,
    )
    return {m: v for m, (v, _) in res.items()}


def _measure_fn(measure: str):
    def fn(expr, other, *, config: Optional[StrsimConfig] = None, preprocess=None):
        if _is_expr_input(expr) or _is_expr_input(other):
            from strsim_tpu.utils.polars_compat import build_expr

            return build_expr(measure, expr, other, config=config,
                              preprocess=preprocess)
        return compute(measure, expr, other, config=config, preprocess=preprocess)

    fn.__name__ = measure
    fn.__qualname__ = measure
    fn.__doc__ = (
        f"{measure} similarity in [0.0, 1.0] over two string columns.\n\n"
        "With polars installed and expression-like inputs (pl.Expr or str\n"
        "column names), returns a lazy pl.Expr evaluated by the TPU engine\n"
        "(reference contract: polars_strsim/__init__.py). With array-like\n"
        "inputs, returns a float64 numpy array with NaN at null rows."
    )
    return fn


levenshtein = _measure_fn("levenshtein")
jaro = _measure_fn("jaro")
jaro_winkler = _measure_fn("jaro_winkler")
jaccard = _measure_fn("jaccard")
sorensen_dice = _measure_fn("sorensen_dice")

# extension measures (not in the reference — see docs/API.md)
jaccard_bigram = _measure_fn("jaccard_bigram")
sorensen_dice_bigram = _measure_fn("sorensen_dice_bigram")
cosine = _measure_fn("cosine")
overlap = _measure_fn("overlap")
hamming = _measure_fn("hamming")
lcs_seq = _measure_fn("lcs_seq")
indel = _measure_fn("indel")
osa = _measure_fn("osa")
soundex = _measure_fn("soundex")
