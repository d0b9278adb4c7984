"""Partitioning helpers.

``ensure_min_partitions`` guards compute-heavy per-row pipelines (hashing,
shingling, regex) against under-parallelized inputs: a small single-file
parquet table arrives as ONE partition, serializing the whole op on one
core. At cluster scale inputs are already split across many files/row-groups
and the guard is a no-op — it only repartitions when the input has fewer
partitions than the session's parallelism, so it never adds a shuffle to a
properly partitioned 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
