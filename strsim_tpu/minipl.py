"""minipl — a minimal polars-compatible expression engine (test double + fallback).

The reference IS a Polars expression plugin (polars_strsim/__init__.py:8-60,
src/expressions/mod.rs:8-31): its identity is `df.with_columns(levenshtein(
"a", "b"))`. This environment cannot install polars (no package installs, no
network, no Rust toolchain to build it), so this module implements the exact
API subset the binding layer (utils/polars_compat.py) uses — faithfully
enough that the L3/L4 expression code executes for real:

    col, lit, struct, Series, DataFrame.with_columns, Expr.alias,
    Expr.map_batches(is_elementwise=...), Series.struct.field, Utf8, Float64

Semantics follow polars' documented behavior for this subset:
  * `col` looks a column up by name (ColumnNotFoundError if missing);
  * `lit` is a length-1 (or embedded-Series) literal; length-1 series
    broadcast against longer ones inside `struct` and `with_columns`;
  * mismatched non-unit lengths raise ShapeError;
  * `map_batches(..., is_elementwise=True)` declares the op row-local, so the
    engine MAY split a column into chunks and stream them through the
    function — set `set_streaming_chunk_size(n)` to force that behavior and
    exercise the contract the way polars' streaming engine would;
  * None values are nulls; a null literal broadcasts to null rows (note: the
    reference PANICS on a null literal, strsim.rs:62,65 — see
    tests/test_engine.py for the documented divergence).

When real polars is importable it always takes priority (strsim_tpu.api and
utils/polars_compat bind to it); minipl is the fallback and the CI-executable
contract test for the expression layer.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence


class ColumnNotFoundError(KeyError):
    pass


class ShapeError(ValueError):
    pass


class _DType:
    def __init__(self, name: str):
        self.name = name

    def __repr__(self):
        return self.name


Utf8 = _DType("Utf8")
Float64 = _DType("Float64")
Struct = _DType("Struct")

_streaming_chunk_size: Optional[int] = None


def set_streaming_chunk_size(n: Optional[int]) -> None:
    """Force elementwise map_batches calls to receive chunks of <= n rows —
    emulates the polars streaming engine exercising is_elementwise=True."""
    global _streaming_chunk_size
    _streaming_chunk_size = n


class Series:
    """A named column of Python values (None = null). Struct series hold
    their field series in `_fields` and expose `.struct.field(name)`."""

    def __init__(self, name: Any = "", values: Any = None, dtype=None, _fields=None):
        if not isinstance(name, str):  # Series(values) form
            name, values = "", name
        if values is None:
            values = []
        if hasattr(values, "tolist"):  # numpy
            values = values.tolist()
        self.name = name
        self._values = list(values)
        self.dtype = dtype if dtype is not None else (Struct if _fields else None)
        self._fields: Optional[Dict[str, "Series"]] = _fields

    def __len__(self) -> int:
        if self._fields:
            return len(next(iter(self._fields.values())))
        return len(self._values)

    def to_list(self) -> List[Any]:
        if self._fields:
            names = list(self._fields)
            n = len(self)
            return [
                {k: self._fields[k]._values[i] for k in names} for i in range(n)
            ]
        return list(self._values)

    def alias(self, name: str) -> "Series":
        return Series(name, self._values, dtype=self.dtype, _fields=self._fields)

    @property
    def struct(self) -> "_StructNamespace":
        if not self._fields:
            raise ShapeError(f"series {self.name!r} is not a struct")
        return _StructNamespace(self)

    def _slice(self, start: int, stop: int) -> "Series":
        if self._fields:
            return Series(
                self.name,
                dtype=self.dtype,
                _fields={k: v._slice(start, stop) for k, v in self._fields.items()},
            )
        return Series(self.name, self._values[start:stop], dtype=self.dtype)

    def __repr__(self):
        return f"Series({self.name!r}, {self._values!r})"


class _StructNamespace:
    def __init__(self, series: Series):
        self._series = series

    def field(self, name: str) -> Series:
        try:
            return self._series._fields[name]  # type: ignore[index]
        except KeyError:
            raise ColumnNotFoundError(name) from None


def _broadcast(series: Series, n: int) -> Series:
    ln = len(series)
    if ln == n:
        return series
    if ln == 1:
        if series._fields:
            return Series(
                series.name,
                dtype=series.dtype,
                _fields={k: _broadcast(v, n) for k, v in series._fields.items()},
            )
        return Series(series.name, series._values * n, dtype=series.dtype)
    raise ShapeError(
        f"cannot broadcast series {series.name!r} of length {ln} to {n}"
    )


class Expr:
    """Lazy expression node. Subclasses implement _evaluate(df) -> Series."""

    def alias(self, name: str) -> "Expr":
        return _Alias(self, name)

    def map_batches(
        self,
        function: Callable[[Series], Any],
        return_dtype=None,
        *,
        is_elementwise: bool = False,
    ) -> "Expr":
        return _MapBatches(self, function, return_dtype, is_elementwise)

    def _evaluate(self, df: "DataFrame") -> Series:  # pragma: no cover
        raise NotImplementedError


class _Col(Expr):
    def __init__(self, name: str):
        self.name = name

    def _evaluate(self, df: "DataFrame") -> Series:
        if self.name not in df._columns:
            raise ColumnNotFoundError(self.name)
        return df._columns[self.name]


class _Lit(Expr):
    def __init__(self, value: Any, dtype=None):
        self.value = value
        self.dtype = dtype

    def _evaluate(self, df: "DataFrame") -> Series:
        if isinstance(self.value, Series):  # lit(Series) embeds the column
            return Series("literal", self.value._values, dtype=self.dtype)
        return Series("literal", [self.value], dtype=self.dtype)


class _Struct(Expr):
    def __init__(self, fields: Sequence[Expr]):
        self.fields = list(fields)

    def _evaluate(self, df: "DataFrame") -> Series:
        evaluated = [f._evaluate(df) for f in self.fields]
        n = max((len(s) for s in evaluated), default=0)
        out: Dict[str, Series] = {}
        for s in evaluated:
            if s.name in out:
                raise ShapeError(f"duplicate struct field {s.name!r}")
            out[s.name] = _broadcast(s, n)
        return Series("struct", dtype=Struct, _fields=out)


class _Alias(Expr):
    def __init__(self, inner: Expr, name: str):
        self.inner = inner
        self.name = name

    def _evaluate(self, df: "DataFrame") -> Series:
        return self.inner._evaluate(df).alias(self.name)


class _MapBatches(Expr):
    def __init__(self, inner: Expr, function, return_dtype, is_elementwise: bool):
        self.inner = inner
        self.function = function
        self.return_dtype = return_dtype
        self.is_elementwise = is_elementwise

    def _evaluate(self, df: "DataFrame") -> Series:
        src = self.inner._evaluate(df)
        chunk = _streaming_chunk_size
        if self.is_elementwise and chunk and len(src) > chunk:
            parts: List[Any] = []
            name = None
            for start in range(0, len(src), chunk):
                res = _as_series(self.function(src._slice(start, start + chunk)))
                name = res.name
                parts.extend(res._values)
            return Series(name or src.name, parts, dtype=self.return_dtype)
        res = _as_series(self.function(src))
        return Series(res.name or src.name, res._values, dtype=self.return_dtype)


def _as_series(x: Any) -> Series:
    if isinstance(x, Series):
        return x
    return Series("", x)


def col(name: str) -> Expr:
    return _Col(name)


def lit(value: Any, dtype=None) -> Expr:
    return _Lit(value, dtype)


def struct(*exprs: Expr) -> Expr:
    flat: List[Expr] = []
    for e in exprs:
        if isinstance(e, (list, tuple)):
            flat.extend(e)
        else:
            flat.append(e)
    return _Struct(flat)


class DataFrame:
    """Eager frame: dict of equal-length columns. Supports the subset the
    README demo and the binding tests use: with_columns, [], height,
    columns, to_dict."""

    def __init__(self, data: Optional[Dict[str, Sequence[Any]]] = None):
        self._columns: Dict[str, Series] = {}
        height: Optional[int] = None
        for name, vals in (data or {}).items():
            s = vals if isinstance(vals, Series) else Series(name, vals)
            s = s.alias(name)
            if height is None:
                height = len(s)
            elif len(s) != height:
                raise ShapeError(
                    f"column {name!r} has length {len(s)}, expected {height}"
                )
            self._columns[name] = s
        self._height = height or 0

    @property
    def height(self) -> int:
        return self._height

    @property
    def columns(self) -> List[str]:
        return list(self._columns)

    def __getitem__(self, name: str) -> Series:
        if name not in self._columns:
            raise ColumnNotFoundError(name)
        return self._columns[name]

    def with_columns(self, *exprs: Expr, **named: Expr) -> "DataFrame":
        out = DataFrame()
        out._columns = dict(self._columns)
        out._height = self._height
        items: List[tuple] = [(None, e) for e in exprs] + list(named.items())
        for name, e in items:
            if isinstance(e, str):
                e = col(e)
            s = e._evaluate(self)
            s = _broadcast(s, self._height)
            s = s.alias(name if name is not None else (s.name or "literal"))
            out._columns[s.name] = s
        return out

    def to_dict(self, as_series: bool = True):
        if as_series:
            return dict(self._columns)
        return {k: v.to_list() for k, v in self._columns.items()}

    def __repr__(self):
        return f"DataFrame({{{', '.join(self._columns)}}}, height={self._height})"
