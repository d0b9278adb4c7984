"""Write-layout helpers: sorted and z-ordered parquet output.

Why layout matters at 100 TB: parquet readers skip whole row groups whose
column min/max statistics can't satisfy the pushed filter. A table written
in random order has every file spanning the full value range — nothing
skips. Range-partitioned + sorted output gives near-disjoint per-file
ranges (perfect skipping on the sort column); z-ordering interleaves the
bucket bits of several columns so EVERY z-ordered column gets bounded
per-file ranges — the same trick behind Delta Lake's OPTIMIZE ZORDER.

All layout math is JVM-side expressions; the only driver-side state is the
per-column quantile boundary list (2^bits values per column).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-order (Morton) key over ``cols``: each column is rank-bucketed into
    2^bits quantile buckets (equi-depth, so skew can't crowd one bucket),
    then the bucket bits are interleaved. Returns a bigint Column.

    ``approxQuantile`` fetches 2^bits boundary values per column to the
    driver — constant-size state, same class as IVF centroids.
    """
    if not cols:
        raise ValueError("zorder_by requires at least one column")
    if bits * len(cols) > 62:
        raise ValueError(f"bits*len(cols) must fit a bigint: {bits}*{len(cols)}")
    n_b = 1 << bits
    probs = [i / n_b for i in range(1, n_b)]
    buckets: list[Column] = []
    for c in cols:
        qs = df.stat.approxQuantile(c, probs, 0.01)
        arr = F.array(*[F.lit(float(q)) for q in qs])
        v = F.col(c).cast("double")
        buckets.append(F.size(F.filter(arr, lambda e: e <= v)).cast("long"))
    z = F.lit(0).cast("long")
    k = len(cols)
    for bit in range(bits):
        for j, b in enumerate(buckets):
            z = z + F.shiftleft(
                F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * k + j
            ).cast("long")
    return z


def write_sorted(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Range-partition on the sort columns, sort within each partition, and
    write one file per partition: per-file min/max are near-disjoint, so a
    filter on the sort column skips all but the matching files' row
    groups."""
    (
        df.repartitionByRange(n_files, *sort_by)
        .sortWithinPartitions(*sort_by)
        .write.mode(mode)
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-ordered write: every column in ``zorder_by`` gets bounded per-file
    ranges (a subrectangle of the value space per file), enabling row-group
    skipping for filters on ANY of them — where a plain sort only helps its
    leading column."""
    z = zorder_key(df, zorder_by, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def read_pruned(
    spark,
    path: str,
    column: str,
    lo,
    hi,
) -> DataFrame:
    """Manifest-style file pruning: read only the parquet files whose footer
    min/max for ``column`` overlaps [lo, hi], then apply the same predicate
    row-wise. Equivalent result to a full scan + filter, but Spark never
    opens the skipped files at all (file-level skipping — one level above
    the row-group skipping the scan already does).

    This is the read-side half of ``write_sorted``/``write_zordered``: on a
    layout with near-disjoint per-file ranges, a narrow range keeps O(1)
    files out of N. At 100 TB the per-file stats live in a table-format
    manifest (Delta/Iceberg) instead of being re-read from footers; this
    driver-side footer pass is the sandbox stand-in (metadata-only, no data
    pages are read) and is itself O(files) — fine for the file counts a
    sorted write produces, and replaceable by a manifest table without
    touching callers.
    """
    import glob
    import os

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    keep = []
    for f, rng in zip(files, _file_ranges(files, column)):
        if rng is None:  # no stats → cannot prune, must read
            keep.append(f)
        elif not (rng[1] < lo or rng[0] > hi):
            keep.append(f)
    pred = (F.col(column) >= F.lit(lo)) & (F.col(column) <= F.lit(hi))
    if not keep:
        return spark.read.parquet(path).filter(pred).limit(0)
    return spark.read.parquet(*keep).filter(pred)


def _file_ranges(files: list[str], column: str) -> list:
    """Per-file (min, max) for ``column`` from footer stats; None when any
    row group lacks statistics for it."""
    import pyarrow.parquet as pq

    out = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        ok = True
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column:
                    if col.statistics is None:
                        ok = False
                    else:
                        mins.append(col.statistics.min)
                        maxs.append(col.statistics.max)
        out.append((min(mins), max(maxs)) if ok and mins else None)
    return out


def compact(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) right-sized files (optionally re-sorted),
    replacing the old layout atomically via a staging dir + rename.

    The small-files problem is operational reality at scale — streaming
    sinks and fine-grained partitions produce thousands of KB-sized files
    whose per-file open/footer overhead dominates scans. File count is
    computed from on-disk bytes (driver-side listing, metadata only).
    Returns the new file count.
    """
    import glob
    import math
    import os
    import shutil

    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    total = sum(os.path.getsize(f) for f in files)
    n_files = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(path)
    staging = f"{path}.__compacting__"
    if sort_by:
        write_sorted(df, staging, sort_by, n_files)
    else:
        df.repartition(n_files).write.mode("overwrite").parquet(staging)
    shutil.rmtree(path)
    os.rename(staging, path)
    return n_files


def parquet_column_ranges(
    path: str, column: str
) -> list[tuple[float, float]]:
    """Per-file (min, max) of ``column`` from parquet footer statistics —
    the exact metadata a reader's row-group skipping consults. Test/audit
    helper (driver-side, reads footers only)."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == column and col.statistics is not None:
                    mins.append(col.statistics.min)
                    maxs.append(col.statistics.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out
