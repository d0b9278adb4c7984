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
    """Repartition only leaf file-scans that arrive with fewer files than
    the session's parallelism. Uses ``inputFiles()`` (plan analysis only)
    instead of ``df.rdd`` — the RDD conversion forced physical planning on
    every dedup/similarity call. Derived frames are left alone: their
    parallelism is governed by ``spark.sql.shuffle.partitions``."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if files and len(files) < target:
        return df.repartition(target)
    return df
