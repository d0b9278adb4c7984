"""Mergeable approximate sketches: HLL distinct-count and approximate
quantiles.

The property that matters at 100 TB is MERGEABILITY: a sketch computed per
partition/day/shard can be unioned later without touching the raw rows
again — the pre-aggregate + merge shape that exact distinct cannot do
without a full reshuffle. Spark 3.5+ ships Apache DataSketches HLL
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) which
this module fronts; estimates are deterministic for identical input sets.

These are deliberately NOT oracle-checked: no two engines' approximate
sketches match bit-for-bit (DuckDB's approx_count_distinct is a different
HLL implementation). Correctness is property-tested instead: the merge law
(sketch of parts, unioned == sketch of whole) and relative-error bounds
against the exact answer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch(col: Column | str, lgk: int = 12) -> Column:
    """Aggregate expression: build a DataSketches HLL sketch (binary) of the
    column's distinct values. ~0.8% relative error at lgk=12; each +1 on
    lgk halves the error and doubles the (kilobyte-scale) sketch size."""
    c = F.col(col) if isinstance(col, str) else col
    return F.hll_sketch_agg(c, F.lit(lgk))


def hll_merge(sketch_col: Column | str) -> Column:
    """Aggregate expression: union partial HLL sketches into one."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.hll_union_agg(c)


def hll_estimate(sketch_col: Column | str) -> Column:
    """Scalar expression: distinct-count estimate (bigint) from a sketch."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.hll_sketch_estimate(c)


def grouped_distinct_sketches(
    df: DataFrame, keys: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketches: (keys..., sketch binary). Persist this as the
    pre-aggregate; roll it up later with ``merge_distinct_sketches`` at any
    coarser grouping without rereading the data."""
    return df.groupBy(*keys).agg(hll_sketch(value_col, lgk).alias("sketch"))


def merge_distinct_sketches(
    sketches: DataFrame, keys: list[str]
) -> DataFrame:
    """Roll partial sketches up to coarser keys: (keys..., approx_distinct
    bigint)."""
    return (
        sketches.groupBy(*keys)
        .agg(hll_merge("sketch").alias("__m"))
        .select(*keys, hll_estimate("__m").alias("approx_distinct"))
    )


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: list[float],
    accuracy: int = 10000,
    keys: list[str] | None = None,
) -> DataFrame:
    """Grouped approximate quantiles via Spark's mergeable
    ``percentile_approx`` (Greenwald-Khanna): one partial+final aggregate,
    no full sort. ``accuracy`` trades memory for error (1/accuracy relative
    rank error)."""
    agg = F.percentile_approx(
        F.col(value_col).cast("double"),
        F.array(*[F.lit(p) for p in probabilities]),
        F.lit(accuracy),
    ).alias("quantiles")
    if keys:
        return df.groupBy(*keys).agg(agg)
    return df.agg(agg)


def _cms_counter(col: str, r: int, width) -> "Column":
    """THE counter-index expression: row ``r``'s counter for item ``col``
    is ``pmod(xxhash64(col, r), width)``. Build, probe, and the
    heavy-hitters map-side filter must all agree bit-for-bit — any drift
    silently breaks the never-undercount guarantee — so every site calls
    this one helper.
    """
    return (
        F.pmod(F.xxhash64(F.col(col), F.lit(r)), F.lit(width)).cast("int")
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 5, width: int = 2048
) -> DataFrame:
    """Count-min sketch as a (r, c, n) counter table: item x increments
    counter (r, xxhash64(x, r) mod width) for each of ``depth`` rows.
    One explode(×depth) + hash-aggregate; the result is ≤ depth×width rows
    REGARDLESS of input size — the pre-aggregate a 100 TB frequency
    pipeline persists per shard/day.

    Guarantees (standard CMS): point estimates never undercount; overcount
    ≤ e·N/width with probability 1-(1/2)^depth per query.

    The (width, depth) parameters ride every sketch row, so
    ``cms_query``/``cms_merge`` derive them from the sketch itself — a
    build/query parameter mismatch (which would silently break the
    never-undercount guarantee) is structurally impossible."""
    pairs = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    _cms_counter(col, r, width).alias("c"),
                )
                for r in range(depth)
            ])
        ).alias("__rc")
    )
    return (
        pairs.groupBy(F.col("__rc.r").alias("r"), F.col("__rc.c").alias("c"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "r", "c", "n",
            F.lit(width).alias("width"), F.lit(depth).alias("depth"),
        )
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union counter tables by element-wise sum — sketches built on data
    slices merge into exactly the sketch of the union (tested law).
    Sketches with differing (width, depth) cannot merge meaningfully and
    are rejected."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    params = out.select("width", "depth").distinct().collect()
    if len(params) > 1:
        raise ValueError(
            f"cannot merge CMS sketches with different parameters: "
            f"{sorted((r['width'], r['depth']) for r in params)}"
        )
    return (
        out.groupBy("r", "c")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.first("width").alias("width"),
            F.first("depth").alias("depth"),
        )
    )


def cms_query(sketch: DataFrame, items: DataFrame, col: str) -> DataFrame:
    """Frequency estimates for ``items``: min over rows of the item's
    counter. The probe side replicates each item ``depth`` ways and joins
    the (bounded) sketch — broadcast-sized by construction. Probe width
    and depth come FROM the sketch (never a caller parameter — see
    ``cms_build``). A sketch built over zero rows estimates 0 for every
    item (correct by definition)."""
    row = sketch.select("width", "depth").first()
    if row is None:
        return items.select(col, F.lit(0).cast("long").alias("est"))
    width, depth = row["width"], row["depth"]
    probes = items.select(
        F.col(col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("r"),
                    _cms_counter(col, r, width).alias("c"),
                )
                for r in range(depth)
            ])
        ).alias("__rc"),
    ).select(col, F.col("__rc.r").alias("r"), F.col("__rc.c").alias("c"))
    return (
        probes.join(F.broadcast(sketch), ["r", "c"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_count: int,
    depth: int = 5,
    width: int = 8192,
) -> DataFrame:
    """EXACT heavy hitters — every value of ``col`` occurring at least
    ``min_count`` times, with its exact count — without ever shuffling the
    light tail.

    Two passes: (1) ``cms_build`` folds the corpus into a bounded
    depth×width counter table; the densified counters ride back over the
    corpus as a broadcast 1-row DATA attach (the bloom-bitset lesson:
    large constants never go in the expression tree) and each row is
    filtered MAP-SIDE by its count-min estimate. (2) Only surviving
    candidate rows — the true heavy values plus the bounded CMS
    false-positive overcount (≤ e·N/width each, so size width against the
    expected tail) — enter the exact hash-aggregate and HAVING filter.

    Exactness: CMS never undercounts, so a value with true count ≥
    min_count always survives pass 1 (no false negatives); pass 2's exact
    count discards the false positives. Output is therefore identical to
    ``GROUP BY col HAVING COUNT(*) >= min_count`` — the sketch only prunes
    shuffle volume. NULL is a countable value like any other (both passes
    hash/group it consistently).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    spark = df.sparkSession
    sk = cms_build(df, col, depth=depth, width=width).collect()  # bounded
    out_fields = df.select(col).schema
    if not sk:
        return spark.createDataFrame(
            [], out_fields.add("count", "long")
        )
    w, d = sk[0]["width"], sk[0]["depth"]
    dense = [[0] * w for _ in range(d)]
    for r in sk:
        dense[r["r"]][r["c"]] = r["n"]
    srow = spark.createDataFrame([(dense,)], "__cms array<array<long>>")
    probes = [
        F.element_at(
            F.element_at(F.col("__cms"), r + 1),
            _cms_counter(col, r, w) + 1,
        )
        for r in range(d)
    ]
    est = probes[0] if d == 1 else F.least(*probes)
    return (
        df.crossJoin(F.broadcast(srow))
        .filter(est >= min_count)
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .filter(F.col("count") >= min_count)
    )
