"""Parquet scan: the engine's primary source.

Reference parity (SURVEY.md §2.1 S1/S2): ``TDataFrame(treeName, dir)``
/root/reference/TDataFrame.hxx:716 binds one on-disk columnar dataset;
a TChain (/root/reference/h1analysisDataFrame.C:117-123) concatenates many
identical-schema files. Spark's multi-path parquet read covers both, and
Catalyst gives projection/predicate pushdown into the scan for free —
the analogue of the reference reading only booked branches
(/root/reference/TDataFrame.hxx:260-281).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdataframe_spark.core.frame import Frame

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(
    spark: SparkSession,
    *paths: str,
    default_columns: Sequence[str] = (),
) -> Frame:
    """Read one or more parquet paths (multi-path = the reference's TChain)
    into a Frame."""
    return Frame(spark.read.parquet(*paths), default_columns=default_columns)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


# (applicationId, path) → analyzed reader DataFrame. A DataFrame here is an
# UNEXECUTED plan — every action still scans the parquet from disk, so this
# caches METADATA work only: `spark.read.parquet` pays ~80 ms of driver-side
# footer read + schema inference per call (measured r11, guide §5 "the
# driver should do almost no data work"), and the registry's queries each
# re-read 1-7 tables per timed run. Keyed by applicationId so a new session
# (e.g. the driver's lower-core bench run) never sees another session's
# plan. The testdata is immutable per round, which makes the reuse safe;
# tables written DURING a run (txn/layout paths) do not flow through here.
_TABLE_CACHE: dict[tuple[str, str], DataFrame] = {}


class SchemaDriftError(TypeError):
    """A testdata table arrived with a column type no adapter understands."""


def normalize_events(df: DataFrame) -> DataFrame:
    """Adapt whatever encoding ``events.ts`` arrived in to one canonical
    column ``ts_us``: BIGINT epoch-microseconds (UTC wall clock).

    Known encodings of the same logical instant column:
    - ``timestamp`` / ``timestamp_ntz`` (parquet TIMESTAMP micros) — the
      current testdata encoding; session TZ is UTC so the NTZ→TZ cast is a
      pure relabel and ``unix_micros`` yields the wall-clock micros DuckDB's
      ``epoch_us(ts)`` computes on the same file.
    - ``bigint`` — parquet TIMESTAMP(NANOS) surfaced via Spark's
      ``nanosAsLong`` legacy read: nanoseconds, truncated to micros.

    This mirrors the reference's per-type-code branch dispatch
    (/root/reference/TDataFrame.hxx:1132-1154): the scan adapts to the
    declared on-disk type instead of assuming one encoding.
    """
    dtypes = dict(df.dtypes)
    t = dtypes.get("ts")
    if t is None:
        if "ts_us" in dtypes:  # already normalized
            return df
        raise SchemaDriftError("events has neither 'ts' nor 'ts_us'")
    if t.startswith("timestamp"):
        ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    elif t == "bigint":
        ts_us = F.expr("ts div 1000")
    else:
        raise SchemaDriftError(f"events.ts: unsupported dtype {t!r}")
    return df.withColumn("ts_us", ts_us).drop("ts")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-drift-tolerant testdata read: one place that validates/adapts
    per-table column encodings so a parquet re-encode can't break call sites.

    ``events`` is normalized to ``ts_us`` (bigint epoch micros); a legacy
    TIMESTAMP(NANOS) file (which Spark's reader rejects outright) is retried
    with the ``nanosAsLong`` legacy conf and then truncated to micros.
    """
    key = (spark.sparkContext.applicationId, table_path(sf_dir, name))
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        df = load_table(spark, sf_dir, name)
    except Exception as exc:  # legacy nanos encoding: reader refuses the type
        if name == "events" and "nanos" in str(exc).lower():
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = load_table(spark, sf_dir, name)
        else:
            raise
    if name == "events":
        df = normalize_events(df)
    _TABLE_CACHE[key] = df
    return df


def read_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present under ``sf_dir`` — through
    ``read_table`` so the events dtype adaptation (and any future
    re-encode handling) applies on EVERY entry point, not just `_t`."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            out[name] = read_table(spark, sf_dir, name)
    return out


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every testdata table under ``sf_dir`` as a temp view
    (``events`` dtype-adapted via :func:`read_table`), enabling the full
    ``spark.sql(...)`` interface over the corpus in one call. Returns the
    registered view names."""
    names = []
    for name in TESTDATA_TABLES:
        if os.path.exists(table_path(sf_dir, name)):
            read_table(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
            names.append(prefix + name)
    return names
