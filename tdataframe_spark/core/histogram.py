"""Histogram action: fixed-range and auto-range 1-D histograms as bin tables.

Reference parity (SURVEY.md §2.1 A5):
- ``.Histo(col, nBins, min, max)`` /root/reference/TDataFrame.hxx:923-934;
  fixed-range per-slot fill + merge ``FillTOOperation`` :483-517; auto-range
  (min==max) buffered fill with global min/max tracking ``FillOperation``
  :410-480. Collection columns are flattened before filling (§1.3).

Spark re-expression: a histogram is a bucketize + hash aggregate —
``floor((x-lo)/width)`` then ``groupBy(bin).count()`` — which Spark executes
as partial+final aggregation over at most ``nbins`` distinct keys (tiny
shuffle regardless of input size; survives 100 TB trivially). Auto-range mode
needs the true min/max, so it is planned as a cheap min/max pre-pass followed
by the same bucketize — no 16 MB driver-side buffering like the reference
(:412), because at scale buffering rows is not an option.

Result shape: a zero-filled, bin-ordered table (bin, bin_lo, bin_hi, cnt) —
deterministic and order-insensitively hashable for oracle comparison.

Semantics notes (documented divergences / choices):
- fixed-range mode DROPS out-of-range values (the reference routes them to
  TH1F under/overflow bins which are not part of the visible bin table).
- auto-range mode includes every value; x == max lands in the last bin
  (TH1F-compatible clamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from tdataframe_spark.core.aggregates import column_type


def _values(df: DataFrame, col: str) -> DataFrame:
    dtype = column_type(df, col)
    c = F.col(col)
    if isinstance(dtype, ArrayType):
        return df.select(F.explode(c).alias("__v")).select(
            F.col("__v").cast("double").alias("__v")
        )
    return df.select(c.cast("double").alias("__v"))


def _bin_table(
    vals: DataFrame, nbins: int, lo: float, hi: float, clamp_max: bool
) -> DataFrame:
    width = (hi - lo) / nbins
    v = F.col("__v")
    b = F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    if clamp_max:
        binned = vals.filter(v.isNotNull()).select(
            F.least(b, F.lit(nbins - 1)).alias("bin")
        )
    else:
        binned = vals.filter(v.isNotNull() & (v >= lo) & (v < hi)).select(
            b.alias("bin")
        )
    counts = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    bins = vals.sparkSession.range(nbins).select(F.col("id").cast("int").alias("bin"))
    return (
        bins.join(F.broadcast(counts), "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1).cast("double") * F.lit(width)).alias(
                "bin_hi"
            ),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
        )
        .orderBy("bin")
    )


def histo_frame(
    df: DataFrame,
    col: str,
    nbins: int = 128,
    lo: float = 0.0,
    hi: float = 0.0,
) -> DataFrame:
    """Histogram as a DataFrame bin table. ``hi <= lo`` selects auto-range
    (reference convention: min==max==0 means "derive the range from data",
    /root/reference/TDataFrame.hxx:930-932)."""
    vals = _values(df, col)
    auto = not (hi > lo)
    if auto:
        row = vals.agg(F.min("__v").alias("lo"), F.max("__v").alias("hi")).first()
        if row["lo"] is None:  # empty input: empty (all-zero) unit-range table
            lo, hi = 0.0, 1.0
        else:
            lo, hi = float(row["lo"]), float(row["hi"])
            if lo == hi:
                hi = lo + 1.0
    return _bin_table(vals, nbins, lo, hi, clamp_max=auto)


def histo_rows(
    df: DataFrame, col: str, nbins: int = 128, lo: float = 0.0, hi: float = 0.0
) -> list[tuple[int, float, float, int]]:
    """Materialized histogram (driver-local list of bin tuples)."""
    return [
        (r["bin"], r["bin_lo"], r["bin_hi"], r["cnt"])
        for r in histo_frame(df, col, nbins, lo, hi).collect()
    ]
