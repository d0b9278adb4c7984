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


def _dds_gamma(alpha: float) -> tuple[float, float]:
    """(gamma, ln(gamma)) for a DDSketch relative accuracy ``alpha``.
    Computed ONCE driver-side and inlined as literals into both the
    Spark plan and any SQL oracle, so every engine buckets against the
    IDENTICAL double constants — the only engine-computed transcendental
    left is ln(value), and bucket expressions 9-dp-round before ceil so
    a 1-ulp ln() divergence cannot flip a bucket unless the value sits
    within 5e-10 of a boundary."""
    import math

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    gamma = (1 + alpha) / (1 - alpha)
    return gamma, math.log(gamma)


def _dds_zone_bucket(col: str, ln_gamma: float) -> tuple[Column, Column]:
    """(zone, bucket) for a value: zone -1/0/+1 by sign, bucket the
    DDSketch log index of |value| (0 in the zero zone). NULLs are the
    caller's concern (dds_build drops them — a sketch counts values)."""
    v = F.col(col).cast("double")
    zone = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    b = F.ceil(
        F.round(F.log(F.abs(v)) / F.lit(ln_gamma), 9)
    ).cast("int")
    return zone, F.when(zone == 0, F.lit(0)).otherwise(b)


def dds_build(
    df: DataFrame, col: str, alpha: float = 0.01, by: tuple = ()
) -> DataFrame:
    """DDSketch-style mergeable QUANTILE sketch (the relative-error
    log-bucket histogram of the DDSketch paper, deterministic variant):
    value x lands in bucket ceil(ln(|x|)/ln(gamma)) of its sign zone,
    gamma = (1+alpha)/(1-alpha), so every bucket's representative value
    is within ``alpha`` relative error of anything it holds. The result
    is one (zone, bucket, n) count table — at most ~2·log_gamma(range)
    rows per group REGARDLESS of input size — the pre-aggregate a
    100 TB percentile pipeline persists per shard/day and merges later
    (the GK/t-digest sketches behind approx_percentile are mergeable
    only inside one engine run; this table is mergeable forever, and —
    unlike them — deterministic, so it IS oracle-checkable).

    ``by``: optional grouping columns that ride the sketch (per-domain /
    per-day percentiles). NULL values are dropped (a sketch counts
    values); exact zeros get their own zone (no log). ``alpha`` rides
    every row so merge/query derive it from the sketch itself, same as
    CMS width/depth."""
    _, ln_gamma = _dds_gamma(alpha)
    zone, bucket = _dds_zone_bucket(col, ln_gamma)
    return (
        df.filter(F.col(col).isNotNull())
        .select(*by, zone.alias("zone"), bucket.alias("bucket"))
        .groupBy(*by, "zone", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("alpha", F.lit(float(alpha)))
    )


def dds_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketch tables by element-wise sum — sketches built on data
    slices merge into exactly the sketch of the union (tested law).
    Sketches with different ``alpha`` bucket incompatibly and are
    rejected."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    alphas = out.select("alpha").distinct().collect()
    if len(alphas) > 1:
        raise ValueError(
            f"cannot merge DDSketches with different alpha: "
            f"{sorted(r['alpha'] for r in alphas)}"
        )
    keys = [c for c in out.columns if c not in ("n", "alpha")]
    return out.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"), F.first("alpha").alias("alpha")
    )


def dds_quantiles(
    sketch: DataFrame,
    qs: list[float],
    round_dp: int = 4,
    alpha: float | None = None,
) -> DataFrame:
    """Quantile estimates from a DDSketch table: per group, the value of
    the first bucket whose cumulative count reaches rank ceil(q·N) —
    back-transformed to the bucket midpoint 2·gamma^b/(gamma+1) (zone-
    signed, 0 for the zero zone), which is within alpha relative error
    of the true quantile. ``qs`` must lie in (0, 1].

    Returns the sketch's group columns + (q, est); ``est`` is rounded to
    ``round_dp`` decimals at this query boundary (pow() can differ by
    ulps across engines; raw buckets stay exact in the sketch). The
    cumulative window partitions by the group columns and orders by the
    bucket's numeric value — per-partition state is the group's bucket
    count, bounded by ~2·log_gamma(range), never the row count."""
    import math

    from pyspark.sql import Window

    if not qs or not all(0 < q <= 1 for q in qs):
        raise ValueError(f"qs must be non-empty, each in (0, 1]: {qs}")
    by = [c for c in sketch.columns if c not in ("zone", "bucket", "n", "alpha")]
    if alpha is None:
        # derived from the sketch (the CMS parameters-ride-the-sketch
        # rule) — but .first() EXECUTES the sketch plan once just to
        # read the constant, and the result plan recomputes it; pass
        # ``alpha`` explicitly on hot paths where it is driver-known
        row = sketch.select("alpha").first()
        if row is None:
            # empty sketch: keep the GROUP columns in the schema (a
            # zero-value day must not change downstream shape)
            return (
                sketch.limit(0)
                .select(*by)
                .withColumn("q", F.lit(0.0))
                .withColumn("est", F.lit(0.0))
            )
        alpha = row["alpha"]
    gamma, _ = _dds_gamma(alpha)
    val = F.when(F.col("zone") == 0, F.lit(0.0)).otherwise(
        F.col("zone")
        * (
            F.lit(2.0)
            * F.pow(F.lit(float(gamma)), F.col("bucket"))
            / F.lit(float(gamma) + 1.0)
        )
    )
    w = Window.partitionBy(*by).orderBy("__val")
    cum = (
        sketch.withColumn("__val", val)
        .withColumn("__cum", F.sum("n").over(w))
        .withColumn(
            "__total", F.sum("n").over(Window.partitionBy(*by))
        )
    )
    qdf = sketch.sparkSession.createDataFrame(
        [(float(q),) for q in sorted(qs)], "q double"
    )
    hits = cum.crossJoin(F.broadcast(qdf)).filter(
        F.col("__cum") >= F.ceil(F.col("q") * F.col("__total"))
    )
    # first qualifying bucket per (group, q): min over (cum, val)
    win = hits.groupBy(*by, "q").agg(
        F.min(F.struct("__cum", "__val")).alias("__w")
    )
    return win.select(
        *by, "q", F.round(F.col("__w.__val"), round_dp).alias("est")
    )


def dds_oracle_sql(
    source_sql: str,
    col: str,
    alpha: float,
    qs: list[float],
    by: tuple = (),
    round_dp: int = 4,
) -> str:
    """The ANSI-SQL twin of dds_build→dds_quantiles over ``source_sql``
    (a relation producing ``col`` + ``by``), GENERATED from the same
    gamma constants so any engine reproduces the sketch bit-for-bit —
    the same constants-inlined-oracle pattern as the minhash family."""
    gamma, ln_gamma = _dds_gamma(alpha)
    g1 = gamma + 1.0
    bycols = ", ".join(by)
    by_pre = f"{bycols}, " if by else ""
    part = f"PARTITION BY {bycols} " if by else ""
    # CAST: bare literals type as DECIMAL in some engines, and the q
    # column must compare as DOUBLE against the Spark side
    qvals = ", ".join(f"(CAST({float(q)!r} AS DOUBLE))" for q in sorted(qs))
    return f"""
WITH src AS ({source_sql}),
buckets AS (
  SELECT {by_pre}
         CASE WHEN {col} > 0 THEN 1 WHEN {col} < 0 THEN -1 ELSE 0 END AS zone,
         CASE WHEN {col} = 0 THEN 0
              ELSE CAST(CEIL(ROUND(LN(ABS({col})) / {ln_gamma!r}, 9)) AS INT)
         END AS bucket,
         COUNT(*) AS n
  FROM src WHERE {col} IS NOT NULL
  GROUP BY ALL
),
vals AS (
  SELECT *,
         CASE WHEN zone = 0 THEN 0.0
              ELSE zone * (2.0 * POWER({gamma!r}, bucket) / {g1!r})
         END AS val
  FROM buckets
),
cums AS (
  SELECT *,
         SUM(n) OVER ({part}ORDER BY val) AS cum,
         SUM(n) OVER ({part}) AS total
  FROM vals
),
qv(q) AS (VALUES {qvals})
SELECT {by_pre}q, ROUND(MIN(val ORDER BY cum, val), {round_dp}) AS est
FROM cums CROSS JOIN qv
WHERE cum >= CEIL(q * total)
GROUP BY ALL
"""
