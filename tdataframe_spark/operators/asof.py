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
    direction: str = "backward",
    tolerance: "int | float | None" = None,
) -> DataFrame:
    """For every left row, attach the nearest ``right_ts`` within the same
    ``on`` key (NULL when none exists):

    - ``direction="backward"`` (default): greatest right_ts <= left_ts
    - ``direction="forward"``: smallest right_ts >= left_ts
    - ``tolerance``: additionally require |right_ts - left_ts| <= tolerance
      (same units as the ts columns; works for numeric timestamps)

    Matches pandas ``merge_asof`` semantics. Returns left rows +
    ``matched_col``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # forward as-of is backward as-of on the negated axis; negate numeric ts
    neg = direction == "forward"
    ts_type = left.schema[left_ts].dataType.simpleString()
    if neg and ts_type not in ("int", "bigint", "smallint", "float", "double"):
        raise ValueError(
            "direction='forward' requires a numeric ts column (epoch micros); "
            f"got {ts_type}"
        )

    def axis(c: Column) -> Column:
        return -c if neg else c

    l = left.select(
        F.col(on).alias("__k"),
        axis(F.col(left_ts)).alias("__t"),
        F.lit(1).alias("__side"),  # left sorts AFTER right at equal ts
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(ts_type).alias("__rt"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        axis(F.col(right_ts)).alias("__t"),
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
    out = (
        u.withColumn("__asof", F.last("__rt", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in lcols],
            F.col("__asof").alias(matched_col),
        )
    )
    if tolerance is not None:
        lc, mc = F.col(left_ts), F.col(matched_col)
        within = (mc >= lc - tolerance) & (mc <= lc + tolerance)
        out = out.withColumn(
            matched_col, F.when(mc.isNotNull() & within, mc)
        )
    return out
