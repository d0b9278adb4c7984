"""Range (interval) join — points-in-interval matching at scale.

The naive plan for ``point BETWEEN lo AND hi`` is a broadcast/nested-loop
theta-join: O(|points| x |intervals|) comparisons. This operator buckets
both sides on a fixed grid: each point lands in one bucket, each interval
is expanded to every bucket it overlaps, and the join becomes an EQUI-join
on bucket id + a residual range predicate — shuffle-partitionable, skew-
manageable, linear-ish in overlap. The same trick underlies Databricks'
range-join optimization and interval libraries (bioinformatics' tabix).

Bucket width should be on the order of the typical interval length:
too small → interval expansion blows up; too large → residual filter does
all the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    a: DataFrame,
    b: DataFrame,
    a_lo: str,
    a_hi: str,
    b_lo: str,
    b_hi: str,
    bucket_width: float,
    on: list[str] | None = None,
) -> DataFrame:
    """Join every pair of OVERLAPPING closed intervals —
    ``a_lo <= b_hi AND b_lo <= a_hi`` — optionally restricted to rows that
    also match on the ``on`` equi-keys (e.g. per-user concurrency
    analysis). The interval×interval sibling of ``range_join``.

    Both sides expand to every grid bucket they touch and meet in an
    EQUI-join on (keys…, bucket). A pair sharing several buckets would
    duplicate, so the join condition additionally pins each pair to its
    FIRST shared bucket (the max of the two start buckets — by
    construction a bucket both intervals touch): exactly-once emission
    with no post-hoc distinct. Inner join only: both sides are replicated,
    so outer variants would null-extend once per replica.

    Scale: shuffle is keyed by (keys…, bucket) — partitionable and
    AQE-skew-splittable; per-task work is the true overlap density, never
    |a|×|b|. Pick ``bucket_width`` on the order of the typical interval
    length (same guidance as ``range_join``).
    """
    if not bucket_width > 0:
        raise ValueError(
            f"interval_join: bucket_width must be > 0, got {bucket_width!r} "
            "(a negative width inverts the bucket order and silently drops "
            "pairs; zero divides)"
        )
    dup = {a_lo, a_hi} & {b_lo, b_hi}
    if dup:
        raise ValueError(
            f"interval_join: bound columns {sorted(dup)} appear on both "
            "sides — rename one side first (the residual predicate needs "
            "unambiguous references)"
        )
    w = F.lit(bucket_width)

    def buckets(lo: str, hi: str):
        # inverted intervals (hi < lo — e.g. a negative duration computed
        # upstream) RAISE instead of silently expanding a descending
        # bucket sequence; NULL-bounded rows keep dropping silently
        # (sequence(NULL, x) semantics). The assert rides the otherwise
        # branch so the NULL case can't short-circuit past it.
        ok = F.col(hi) >= F.col(lo)
        guard = F.assert_true(
            ok,
            F.lit(
                f"interval_join: inverted interval ({hi} < {lo}) — "
                "fix the bounds upstream (negative durations?)"
            ),
        )
        seq = F.sequence(
            F.floor(F.col(lo) / w).cast("long"),
            F.floor(F.col(hi) / w).cast("long"),
        )
        return F.explode(
            F.when(F.col(lo).isNull() | F.col(hi).isNull(),
                   F.lit(None).cast("array<long>"))
            .when(ok, seq)
            .otherwise(guard.cast("array<long>"))
        )

    A = a.withColumn("__bucket", buckets(a_lo, a_hi))
    B = b.withColumn("__bucket", buckets(b_lo, b_hi))
    cond = (
        (A["__bucket"] == B["__bucket"])
        & (A[a_lo] <= B[b_hi])
        & (B[b_lo] <= A[a_hi])
        # first-shared-bucket pin: emit each overlapping pair exactly once
        & (
            A["__bucket"]
            == F.greatest(
                F.floor(A[a_lo] / w).cast("long"),
                F.floor(B[b_lo] / w).cast("long"),
            )
        )
    )
    for k in on or []:
        cond = cond & (A[k] == B[k])
    joined = A.join(B, cond, "inner").drop(A["__bucket"]).drop(B["__bucket"])
    for k in on or []:
        joined = joined.drop(B[k])
    return joined


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (closed interval), via grid bucketing.

    Returns points columns + intervals columns (like an equi-join).

    The range predicate lives IN the join condition (not a post-filter):
    a post-filter would silently drop the null-extended rows of a left
    join, degrading outer semantics to inner. Only ``inner`` and ``left``
    are supported — each point has exactly one bucket so those are exact;
    ``right``/``full`` would emit one null-extended duplicate per bucket
    replica of an unmatched interval.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"range_join supports how='inner'|'left', got {how!r}: "
            "unmatched intervals are bucket-replicated and would duplicate "
            "under right/full outer"
        )
    p_bucket = F.floor(F.col(point_col) / F.lit(bucket_width)).cast("long")
    p = points.withColumn("__bucket", p_bucket)

    lo_b = F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("long")
    hi_b = F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("long")
    iv = intervals.withColumn(
        "__bucket", F.explode(F.sequence(lo_b, hi_b))
    )

    cond = (
        (p["__bucket"] == iv["__bucket"])
        & (p[point_col] >= iv[lo_col])
        & (p[point_col] <= iv[hi_col])
    )
    joined = p.join(iv, cond, how)
    return joined.drop(p["__bucket"]).drop(iv["__bucket"])
