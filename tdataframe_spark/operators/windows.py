"""Window-function operators (absent in the reference, SURVEY.md §2.2).

All single-shuffle designs: one ``partitionBy(key)`` shuffle, per-partition
sort, no driver materialization — the shapes that hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Deterministic per-group top-k via row_number over a total order.

    ``order_by`` must be a total order (include a unique tiebreaker) for
    deterministic output.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def _ranged_numbered(df: DataFrame, order_cols: list, n: int) -> DataFrame:
    """The pre-checkpoint stage of ``global_row_number``: range-partition
    + sort-within-partitions on the order key, stamp the partition id and
    the in-partition ordinal. Split out so plan pins can assert the range
    exchange directly (the checkpoint truncates it from downstream
    plans)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    return (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.spark_partition_id())
    )


def global_row_number(
    df: DataFrame,
    order_cols: list,
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row numbers over a TOTAL order — without the
    single-task trap. `row_number() OVER (ORDER BY …)` funnels the whole
    dataset through one partition; this plans the scalable shape instead:

    1. range-partition + sort within partitions on the order key (the same
       machinery as a distributed ORDER BY — every partition holds a
       contiguous key range);
    2. number rows inside each partition via
       ``monotonically_increasing_id`` (partition ordinal in the high bits,
       in-order record index in the low 33) — a pure projection, no window,
       no extra exchange;
    3. count rows per partition (ONE bounded job: ≤ num_partitions rows to
       the driver) and add each partition's prefix offset back as a
       broadcast map literal.

    ``order_cols`` must be a total order (include a unique tiebreaker) —
    result is then bit-identical on any cluster/partitioning.

    The partitioned/numbered intermediate is localCheckpoint-ed, not
    persisted: the range exchange SAMPLES its boundaries, so a recompute
    (cache eviction, lost executor) could place rows differently and
    silently invalidate the collected prefix offsets. Checkpointing
    truncates the lineage — the placement can never be recomputed; loss
    is a loud error instead of a silently wrong numbering (and there is
    no cache entry leaked across calls).
    """
    spark = df.sparkSession
    n = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # the counts job below materializes the lazy checkpoint
    part = _ranged_numbered(df, order_cols, n).localCheckpoint(eager=False)
    counts = {
        r["__pid"]: r["c"]
        for r in part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in range(n):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    omap = F.create_map(
        *[x for pid in range(n) for x in (F.lit(pid), F.lit(offsets[pid]))]
    )
    idx_in_part = F.col("__mid") - (F.col("__pid").cast("long") * F.lit(1 << 33))
    return part.withColumn(
        out_col,
        (F.element_at(omap, F.col("__pid")) + idx_in_part + 1).cast("long"),
    ).drop("__mid", "__pid")


def rolling_time_agg(
    df: DataFrame,
    key_col: str,
    ts_us_col: str,
    value_col: str,
    trailing_seconds: int,
    sum_col: str = "roll_sum",
    count_col: str = "roll_n",
) -> DataFrame:
    """Trailing-time-window aggregates per key: for every row, the sum and
    count of ``value_col`` over the preceding ``trailing_seconds`` (RANGE
    frame on an integer epoch-µs axis, inclusive of the current row).

    One shuffle on ``key_col``; the RANGE frame is evaluated with a sliding
    cursor inside each sorted partition — no self-join, no explode of the
    window into rows, which is what makes it hold at 100 TB (the naive
    range self-join is O(rows × window width)).

    Sums accumulate in DECIMAL so the result is identical on any partition
    order and in the DuckDB oracle (see ``functions.numeric.dsum``).
    """
    lo = -trailing_seconds * 1_000_000
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_us_col)
        .rangeBetween(lo, Window.currentRow)
    )
    return df.withColumn(
        sum_col,
        F.sum(F.col(value_col).cast("decimal(25,6)")).over(w).cast("double"),
    ).withColumn(count_col, F.count(F.lit(1)).over(w).cast("long"))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session indexes per user (1-based): a new session
    starts when the time since the previous event exceeds ``gap_seconds``.

    ``ts_col`` may be a timestamp (gap measured via ``timestampdiff`` in
    microseconds — wall-clock, TZ/DST-free on NTZ) or an integer epoch in
    MICROSECONDS (plain subtraction). Both paths are integer-exact and
    engine-portable.
    """
    from pyspark.sql.types import IntegerType, LongType

    gap_us = gap_seconds * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col)
    d = df.withColumn("__prev_ts", F.lag(F.col(ts_col)).over(w))
    if isinstance(df.schema[ts_col].dataType, (LongType, IntegerType)):
        diff = F.col(ts_col) - F.col("__prev_ts")
    else:
        diff = F.expr(f"timestampdiff(MICROSECOND, __prev_ts, {ts_col})")
    is_new = F.when(
        F.col("__prev_ts").isNull() | (diff > gap_us), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return d.withColumn(session_col, F.sum(is_new).over(run)).drop("__prev_ts")


def resample_time_series(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    value_cols: list[str],
    fill: str = "zero",
) -> DataFrame:
    """Regularize a sparse per-key time series: emit one row for EVERY
    integer bucket between each key's min and max, filling gaps with
    ``fill`` = "zero" (missing → 0 / null-as-0 semantics), "ffill"
    (forward-fill the last observed value), "interp" (linear
    interpolation between the surrounding observations on the integer
    bucket axis — boundaries are observed by construction since the
    spine spans min..max of the OBSERVED buckets), or "null".

    Shape: the dense bucket axis is generated per key with
    ``sequence`` + ``explode`` (work ∝ output rows, no cross join against
    a global calendar), left-joined to the observations on (key, bucket);
    forward-fill / interpolation are ignorenulls last/first over per-key
    windows — the same single-shuffle discipline as every other window op
    here. Interpolation arithmetic is pure IEEE on already-deterministic
    inputs, so it is oracle-reproducible with the mirrored expression.
    """
    bounds = df.groupBy(key_col).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    axis = bounds.select(
        key_col,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(bucket_col),
    )
    out = axis.join(df, [key_col, bucket_col], "left")
    if fill == "zero":
        for c in value_cols:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0).cast(dict(df.dtypes)[c])))
    elif fill == "ffill":
        w = (
            Window.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in value_cols:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    elif fill == "interp":
        wp = (
            Window.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wn = (
            Window.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        t = F.col(bucket_col).cast("double")
        for c in value_cols:
            v = F.col(c)
            obs_t = F.when(v.isNotNull(), F.col(bucket_col))
            pv = F.last(v, ignorenulls=True).over(wp)
            pt = F.last(obs_t, ignorenulls=True).over(wp).cast("double")
            nv = F.first(v, ignorenulls=True).over(wn)
            nt = F.first(obs_t, ignorenulls=True).over(wn).cast("double")
            interp = pv + (nv - pv) * ((t - pt) / (nt - pt))
            out = out.withColumn(
                c, F.when(v.isNotNull(), v).otherwise(interp)
            )
    elif fill != "null":
        raise ValueError(f"unknown fill mode {fill!r}")
    return out
