"""Data-quality expectations and snapshot diffing — the validation layer a
100 TB ingestion pipeline runs before admitting a batch.

Every check is a tiny aggregate over one declarative plan (filters and
joins Catalyst can push down), so a full expectation suite costs one scan
per table plus key-shuffles only where uniqueness/referential checks need
them. Nothing row-sized ever reaches the driver — each expectation reduces
to a single (rule, violations) row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, rule: str, cond: Column) -> DataFrame:
    """Violations of a row-level predicate: rows where ``cond`` is NOT
    satisfied (NULL counts as a violation, like SQL CHECK semantics
    inverted for auditing)."""
    return (
        df.where(~F.coalesce(cond, F.lit(False)))
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(F.lit(rule).alias("rule"), "violations")
    )


def expect_not_null(df: DataFrame, rule: str, col: str) -> DataFrame:
    return expect(df, rule, F.col(col).isNotNull())


def expect_unique(df: DataFrame, rule: str, cols: list[str]) -> DataFrame:
    """Rows participating in a duplicated key (total rows minus distinct
    keys would hide WHICH side; this counts every row beyond the first per
    key — 0 iff the key is unique)."""
    dups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).cast("long").alias("violations"))
    )
    return dups.select(F.lit(rule).alias("rule"), "violations")


def expect_fk(
    df: DataFrame, rule: str, col: str, dim: DataFrame, key: str
) -> DataFrame:
    """Referential integrity: fact rows whose ``col`` has no match in the
    (broadcast) dimension ``key`` — an anti join, so the fact side never
    shuffles when the dimension broadcasts. NULL keys vacuously satisfy
    the constraint (SQL FK semantics); pair with ``expect_not_null`` when
    the column is also mandatory."""
    missing = df.where(F.col(col).isNotNull()).join(
        F.broadcast(dim.select(F.col(key).alias(col)).distinct()),
        col,
        "left_anti",
    )
    return missing.agg(
        F.count(F.lit(1)).cast("long").alias("violations")
    ).select(F.lit(rule).alias("rule"), "violations")


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the expectation rows into one (rule, violations) report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str]
) -> DataFrame:
    """CDC between two keyed snapshots: (keys…, op) with op ∈
    added | removed | changed. One full-outer key shuffle; row equality is
    an md5 over the canonically-ordered non-key columns, so wide rows
    compare as one hash instead of N column equalities."""
    non_key = sorted(c for c in new.columns if c not in keys)
    assert non_key == sorted(c for c in old.columns if c not in keys)

    def hashed(df: DataFrame, out: str) -> DataFrame:
        # concat_ws SKIPS nulls, which would make (a, NULL) and (NULL, a)
        # hash identically — encode NULL as an explicit sentinel so every
        # column occupies its slot
        h = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in non_key
                ],
            )
        )
        return df.select(*keys, h.alias(out))

    j = hashed(old, "__h_old").join(hashed(new, "__h_new"), keys, "full_outer")
    op = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return j.select(*keys, op.alias("op")).where(F.col("op").isNotNull())


def winsorize(
    df,
    cols: list[str],
    lower: float = 0.01,
    upper: float = 0.99,
    method: str = "exact",
    accuracy: int = 10_000,
):
    """Percentile clipping (winsorization) of numeric columns — the
    standard heavy-tail tamer before training on or aggregating noisy
    numeric features. Each listed column gains ``<col>_w`` clipped to its
    [lower, upper] percentiles.

    Shape: ONE aggregate computes every bound (2×len(cols) percentiles),
    broadcast back as a 1-row cross join; clipping is pure map-side
    least/greatest.

    ``method="exact"`` (default, oracle-parity) uses Spark's exact
    ``percentile`` — its aggregation buffer holds per-distinct-value
    state, fine up to ~10⁸ distinct values per column but NOT the 100 TB
    path. ``method="approx"`` swaps in ``percentile_approx`` (mergeable
    Greenwald–Khanna sketch, bounded memory: rank error ≤ 1/``accuracy``
    of the rows regardless of data size) — identical query shape, the
    same exact↔sketch trade as ``histo_equidepth(method="approx")``.
    """
    from pyspark.sql import functions as F

    if method not in ("exact", "approx"):
        raise ValueError(f"method must be 'exact' or 'approx', got {method!r}")

    def pct(c: str, q: float):
        col = F.col(c).cast("double")
        if method == "approx":
            return F.percentile_approx(col, F.lit(q), F.lit(accuracy))
        return F.percentile(col, F.lit(q))

    # typed API, not f-string SQL: interpolated identifiers misparse for
    # column names needing backticks (the string-injection class this repo
    # bans — see mix_domains)
    bounds = df.agg(
        *[
            pct(c, q).alias(f"__{c}_{tag}")
            for c in cols
            for q, tag in ((lower, "lo"), (upper, "hi"))
        ]
    )
    out = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        # guard NULL explicitly: greatest/least SKIP nulls, which would
        # fabricate the lower bound for missing measurements
        out = out.withColumn(
            f"{c}_w",
            F.when(
                F.col(c).isNotNull(),
                F.least(
                    F.greatest(F.col(c).cast("double"), F.col(f"__{c}_lo")),
                    F.col(f"__{c}_hi"),
                ),
            ),
        )
    return out.drop(*[f"__{c}_{t}" for c in cols for t in ("lo", "hi")])


def robust_outliers(
    df,
    value_col: str,
    keys: list[str] | None = None,
    threshold: float = 3.5,
) -> DataFrame:
    """Median/MAD robust outlier detection: flag rows whose modified
    z-score |x − median| / (1.4826 · MAD) exceeds ``threshold`` — unlike
    the mean/σ z-score (`outliers`), a few extreme values cannot drag the
    center and mask themselves (breakdown point 50% vs 0%).

    Shape: two grouped exact-percentile aggregates (median of x, then
    median of |x − median|) joined back on the keys — two shuffles of the
    GROUP STATS, the data itself shuffles once per join by key. With no
    keys the two 1-row aggregates attach as broadcasts. Exact percentile
    is sort-based per group; at 100 TB swap `percentile_approx` in for
    both medians (same shape). A zero-MAD group (>50% identical values)
    flags only values different from the median, never divides by zero.

    Returns the input plus (center, mad, robust_z, is_outlier).
    """
    x = F.col(value_col).cast("double")
    med_agg = F.percentile(x, F.lit(0.5)).alias("__center")
    if keys:
        med = df.groupBy(*keys).agg(med_agg)
        j = df.join(med, keys)
    else:
        j = df.crossJoin(F.broadcast(df.agg(med_agg)))
    dev = F.abs(x - F.col("__center"))
    mad_agg = F.percentile(dev, F.lit(0.5)).alias("__mad")
    if keys:
        mad = j.groupBy(*keys).agg(mad_agg)
        j = j.join(mad, keys)
    else:
        j = j.crossJoin(F.broadcast(j.agg(mad_agg)))
    scale = F.lit(1.4826) * F.col("__mad")
    z = F.when(
        F.col("__mad") > 0, F.abs(x - F.col("__center")) / scale
    ).otherwise(
        # degenerate spread: anything off-center is infinitely surprising
        F.when(F.abs(x - F.col("__center")) > 0, F.lit(float("inf"))).otherwise(
            F.lit(0.0)
        )
    )
    return (
        j.withColumn("center", F.col("__center"))
        .withColumn("mad", F.col("__mad"))
        .withColumn("robust_z", z)
        .withColumn(
            "is_outlier",
            F.when(x.isNotNull(), F.col("robust_z") > threshold).otherwise(False),
        )
        .drop("__center", "__mad")
    )


# Poisson(1) CDF cut points for hash-derived bootstrap weights: a uniform
# u in (0,1) maps to the count k whose cumulative probability first
# exceeds it. 10 terms cover 1 - 1e-8 of the mass; the tail clamps to 10.
_POIS1_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.9999988747974047,
    0.9999998826412736,
)


def bootstrap_mean_ci(
    df,
    value_col: str,
    id_col: str,
    n_replicates: int = 64,
    alpha: float = 0.05,
    seed: str = "boot",
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the mean — the
    distributed bootstrap (each row joins replicate r with weight ~
    Poisson(1), so no resampling pass over the data is ever
    coordinated): the CI is the (α/2, 1−α/2) exact-percentile band of
    the replicate means.

    The weights are DERIVED, not drawn: u = (h+1)/(2^60+1) with
    h = portable_hash64(id ‖ '|' ‖ r ‖ seed), mapped through the
    Poisson(1) CDF — every replicate is a pure function of (corpus,
    seed), bit-reproducible in any engine, stable across retries/
    partitionings. One pass: rows explode to ``n_replicates`` weighted
    copies, map-side combine collapses each partition to ≤ B partial
    rows, the shuffle is B groups. Replicate sums are decimal-exact.

    Returns 1 row: (mean, ci_lo, ci_hi, n, n_replicates).
    """
    from tdataframe_spark.functions.numeric import dmean, dsum, portable_hash64

    if n_replicates < 2:
        raise ValueError("n_replicates must be >= 2")
    if not 0 < alpha < 1:
        raise ValueError("alpha must be in (0, 1)")
    x = F.col(value_col).cast("double")
    d = df.filter(x.isNotNull()).select(
        F.col(id_col).alias("__id"), x.alias("__x")
    )
    r = d.select(
        "__id",
        "__x",
        F.explode(F.sequence(F.lit(0), F.lit(n_replicates - 1))).alias("__r"),
    )
    u = (
        portable_hash64(
            F.concat_ws("|", F.col("__id").cast("string"), F.col("__r"), F.lit(seed))
        )
        + 1
    ) / F.lit(float(2**60 + 1))
    w = F.lit(len(_POIS1_CDF))
    for k in range(len(_POIS1_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(w)
    means = (
        r.withColumn("__w", w.cast("long"))
        .groupBy("__r")
        .agg(
            F.try_divide(
                dsum(F.col("__w") * F.col("__x")),
                F.sum("__w").cast("double"),
            ).alias("__m")
        )
        .filter(F.col("__m").isNotNull())  # an all-zero-weight replicate
    )
    band = means.agg(
        F.percentile(F.col("__m"), F.lit(alpha / 2)).alias("ci_lo"),
        F.percentile(F.col("__m"), F.lit(1 - alpha / 2)).alias("ci_hi"),
        F.count(F.lit(1)).cast("long").alias("n_replicates"),
    )
    stats = d.agg(dmean("__x").alias("mean"), F.count(F.lit(1)).cast("long").alias("n"))
    return stats.crossJoin(F.broadcast(band)).select(
        "mean", "ci_lo", "ci_hi", "n", "n_replicates"
    )
