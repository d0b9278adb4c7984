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
):
    """Percentile clipping (winsorization) of numeric columns — the
    standard heavy-tail tamer before training on or aggregating noisy
    numeric features. Each listed column gains ``<col>_w`` clipped to its
    [lower, upper] exact percentiles.

    Shape: ONE aggregate computes every bound (2×len(cols) exact
    percentiles), broadcast back as a 1-row cross join; clipping is pure
    map-side least/greatest. Exact percentile is sort-based — at 100 TB
    swap in `percentile_approx` for sketch bounds (same query shape, the
    equi-depth-histogram trade).
    """
    from pyspark.sql import functions as F

    # typed API, not f-string SQL: interpolated identifiers misparse for
    # column names needing backticks (the string-injection class this repo
    # bans — see mix_domains)
    bounds = df.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(q)).alias(f"__{c}_{tag}")
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
