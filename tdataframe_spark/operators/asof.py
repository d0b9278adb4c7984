"""As-of (point-in-time) join — a time-series operator the reference lacks
(SURVEY.md §2.2 "joins … as-of"), built scale-first.

Instead of the naive O(|L|·|R|) theta-join (``r.ts <= l.ts`` then argmax),
the implementation UNIONs the two sides, window-sorts once per key, and
carries the most recent right-side timestamp forward with
``last(..., ignorenulls=True)``. Cost: ONE shuffle on the join key and a
per-partition sort — the same plan a dedicated as-of join operator (e.g.
in kdb/QuestDB or Flink temporal join) would produce, and it survives
arbitrarily large sides at 100 TB where the theta-join would explode.

Tie policy: a right row at exactly ``l.ts`` matches (<= semantics, same as
DuckDB's ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    matched_col: str = "asof_ts",
) -> DataFrame:
    """For every left row, attach the greatest ``right_ts`` <= ``left_ts``
    within the same ``on`` key (NULL when no prior right row exists).

    Returns the left rows + ``matched_col``.
    """
    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts AFTER right at equal ts
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(left.schema[left_ts].dataType.simpleString()).alias("__rt"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType.simpleString()).alias("__l"),
        F.col(right_ts).alias("__rt"),
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("__asof", F.last("__rt", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(*[F.col(f"__l.{c}").alias(c) for c in lcols], F.col("__asof").alias(matched_col))
    )
