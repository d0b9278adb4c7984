"""Skew-mitigation operators.

AQE's skew-join handling (on by default in session.py) covers sort-merge
joins at runtime; these helpers cover the cases AQE can't re-plan:
hot-key aggregations and broadcast-infeasible skewed joins, via explicit
salting — the standard two-stage shape that holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-stage count for heavily skewed keys: stage 1 aggregates
    (key, salt) — spreading each hot key over ``salt_buckets`` reducers —
    stage 2 merges per key. Identical result to a plain groupBy().count(),
    with the hot key's work parallelized.

    The salt is random-per-row but only routes rows; counts are
    salt-invariant, so results stay deterministic.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__c")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__c").cast("long").alias("cnt")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the (large, skewed) left
    side randomly; replicate every right row into all ``salt_buckets``
    salts; join on (key, salt). Each hot left key now spreads across
    ``salt_buckets`` tasks instead of one straggler.

    Right-side replication costs |right| × salt_buckets — use when the right
    side is modest but still too big (or too skewed) to broadcast.

    Only ``inner`` and ``left`` joins are supported: each left row carries
    exactly one salt, so those produce exact results. ``right``/``full``
    would emit ``salt_buckets`` null-extended duplicates for every unmatched
    right row (one per replica) and are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full outer would duplicate unmatched right rows "
            "salt_buckets times"
        )
    l = left.withColumn("__salt", (F.rand(seed=0) * salt_buckets).cast("int"))
    r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = l.join(r, [key, "__salt"], how)
    return out.drop("__salt")
