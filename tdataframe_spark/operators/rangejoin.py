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
