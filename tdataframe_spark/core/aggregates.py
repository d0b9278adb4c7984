"""Whole-frame aggregate planning, including array-flatten ("explode")
semantics.

Reference parity (SURVEY.md §1.3, §2.1 A1-A4):
- function-less aggregates over a collection-typed column operate on the
  FLATTENED elements, not per-row values: ``Min/Max/MeanOperation::Exec``
  container overloads /root/reference/TDataFrame.hxx:611-615, :636-640,
  :665-672; golden value mean(dv)=5.1379310344827588963 over 290 flattened
  elements (/root/reference/tests/test_misc.cxx:184).
- empty-input semantics: the reference returns sentinels (min→+DBL_MAX,
  max→DBL_MIN — the latter a seed bug we deliberately do NOT copy — mean→0;
  /root/reference/tests/regression_zeroentries.cxx:35-37). This engine
  returns SQL NULL (None) for min/max/mean/sum on empty input: documented
  divergence, saner at scale, and what the DuckDB oracle produces.

Spark re-expression: instead of a physical ``explode`` (which multiplies row
count before the aggregate), flattening is pushed INTO per-row higher-order
functions (``array_min``, ``aggregate``, ``size``) so every whole-frame
aggregate — flat or flattened — remains a single fusable ``agg()`` expression
evaluated inside whole-stage codegen. At 100 TB this avoids materializing the
exploded relation entirely.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType

from tdataframe_spark.core.errors import UnknownColumnError

ScalarPlan = tuple[dict[str, Column], Callable[[dict[str, Any]], Any]]


def column_type(df: DataFrame, name: str) -> DataType:
    for f_ in df.schema.fields:
        if f_.name == name:
            return f_.dataType
    raise UnknownColumnError(
        f"unknown column {name!r}; available: {df.columns}"
    )


def _array_sum(c: Column) -> Column:
    # left-fold in element order: deterministic summation per row
    return F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


# reference empty-input sentinels (regression_zeroentries.cxx:35-37): the
# reference's Max seeds from +DBL_MAX — a seed bug yielding +DBL_MAX on empty
# input in some builds and DBL_MIN in others — which we deliberately do NOT
# copy; "sentinel" mode returns the mathematically sensible identity values
# (min of nothing = +inf-like DBL_MAX, max of nothing = -DBL_MAX, mean/sum 0).
DBL_MAX = 1.7976931348623157e308
_EMPTY_SENTINELS = {"min": DBL_MAX, "max": -DBL_MAX, "mean": 0.0, "sum": 0.0}


def scalar_agg_plan(
    df: DataFrame, col: str | None, kind: str, empty: str = "null"
) -> ScalarPlan:
    """Build (named agg expressions, finisher) for one lazy scalar action.

    ``kind`` in {count, min, max, mean, sum}. Array-typed columns aggregate
    over their flattened elements (SURVEY.md §1.3).

    ``empty`` selects empty-input semantics: ``"null"`` (default — SQL NULL,
    what any SQL oracle computes) or ``"sentinel"`` (compatibility mode for
    code ported from the reference, which returns sentinel values instead,
    /root/reference/tests/regression_zeroentries.cxx:35-37).
    """
    if empty not in ("null", "sentinel"):
        raise ValueError(f"empty must be 'null' or 'sentinel', got {empty!r}")

    def on_empty(v: Any) -> Any:
        if v is None and empty == "sentinel":
            return _EMPTY_SENTINELS[kind]
        return v

    if kind == "count":
        return {"v": F.count(F.lit(1))}, lambda r: int(r["v"])

    assert col is not None
    dtype = column_type(df, col)
    c = F.col(col)
    is_array = isinstance(dtype, ArrayType)

    if kind == "min":
        e = F.min(F.array_min(c)) if is_array else F.min(c)
        return {"v": e}, lambda r: on_empty(r["v"])
    if kind == "max":
        e = F.max(F.array_max(c)) if is_array else F.max(c)
        return {"v": e}, lambda r: on_empty(r["v"])
    if kind == "sum":
        if is_array:
            # per-row fold yields 0.0 for an empty array, so an all-empty
            # column must be detected by element count or sum would report
            # 0.0 where min/max/mean report NULL (documented semantics)
            exprs = {"s": F.sum(_array_sum(c)), "n": F.sum(F.size(c))}

            def finish_sum(r: dict[str, Any]) -> Any:
                return on_empty(None if not r["n"] else r["s"])

            return exprs, finish_sum
        return {"v": F.sum(c.cast("double"))}, lambda r: on_empty(r["v"])
    if kind == "mean":
        if is_array:
            exprs = {"s": F.sum(_array_sum(c)), "n": F.sum(F.size(c))}

            def finish(r: dict[str, Any]) -> Any:
                n = r["n"]
                return on_empty(None if not n else r["s"] / n)

            return exprs, finish
        return {"v": F.avg(c.cast("double"))}, lambda r: on_empty(r["v"])

    raise ValueError(f"unknown aggregate kind {kind!r}")


def profile_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """Deterministic numeric profile (the ``describe()`` replacement whose
    values are reproducible cross-engine): one hash-aggregation pass over
    all columns, unpivoted JVM-side to long format
    ``(column, n, n_null, vmin, vmax, mean, std)``.

    The linear sum accumulates in decimal (exact, associative). The sum of
    squares CANNOT portably use a wide decimal — converting a decimal whose
    unscaled value exceeds 2^53 back to double is not correctly rounded in
    every engine (DuckDB's hugeint→double path drifts ~1e-8 on a 5e19
    unscaled sum) — so x² is split into integer part + 1e-9-quantized
    fraction, each summed as int64 (exact), and recombined with two
    correctly-rounded casts. std uses the textbook
    ``sqrt((ss - s^2/n)/(n-1))`` with a 0-clamp; every step is an identical
    IEEE op in both engines, so values are bit-stable cross-engine (the ss
    quantization of ≤1e-9 per row is part of the operator's definition).

    Domain: the int64 split of x² is exact only while x² < 2^63, i.e.
    |x| ≲ 3.03e9. Past that the session's ANSI mode raises
    ARITHMETIC_OVERFLOW during aggregation (loud, not silent) — rescale
    such columns before profiling.
    """
    aggs = []
    for c in cols:
        col = F.col(c)
        d = col.cast("double")
        x2 = d * d
        aggs += [
            F.count(col).alias(f"__n_{c}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).cast("long").alias(f"__nn_{c}"),
            F.min(d).alias(f"__min_{c}"),
            F.max(d).alias(f"__max_{c}"),
            F.sum(d.cast("decimal(25,6)")).cast("double").alias(f"__s_{c}"),
            F.sum(F.floor(x2).cast("long")).alias(f"__sshi_{c}"),
            F.sum(
                F.floor((x2 - F.floor(x2)) * F.lit(1.0e9)).cast("long")
            ).alias(f"__ssfr_{c}"),
        ]
    a = df.agg(*aggs)

    def entry(c: str):
        n = F.col(f"__n_{c}")
        s = F.col(f"__s_{c}")
        ss = (
            F.col(f"__sshi_{c}").cast("double")
            + F.col(f"__ssfr_{c}").cast("double") / F.lit(1.0e9)
        )
        mean = s / n
        var = (ss - s * s / n) / (n - F.lit(1))
        std = F.sqrt(F.greatest(var, F.lit(0.0)))
        return F.struct(
            F.lit(c).alias("column"),
            n.cast("long").alias("n"),
            F.col(f"__nn_{c}").alias("n_null"),
            F.col(f"__min_{c}").alias("vmin"),
            F.col(f"__max_{c}").alias("vmax"),
            mean.alias("mean"),
            F.when(n > 1, std).alias("std"),
        )

    return a.select(F.inline(F.array(*[entry(c) for c in cols])))
