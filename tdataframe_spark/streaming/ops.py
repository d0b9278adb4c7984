"""Structured Streaming operators.

The reference is batch-only (one event loop over a TTree, SURVEY.md §2.2
"Streaming: absent"); this module provides the streaming surface a pipeline
engine needs, built on Spark Structured Streaming so batch operators stay
reusable: the same DataFrame expressions run in either mode.

Scale notes: watermarks bound state for late data; windowed aggregations are
partial+final like any hash agg; file sources scale by listing — at real
scale swap for Kafka/queue sources, which is a one-line change at the
``readStream`` boundary (the transformations are mode-agnostic).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_from_files(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source (each new file = new micro-batch data).

    Streaming sources require an explicit schema — pass the batch table's
    ``df.schema`` for parity between modes.
    """
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def windowed_agg(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: dict[str, F.Column] | None = None,
    watermark: str = "10 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation: the canonical late-data-safe
    streaming aggregate. ``aggs`` maps output name → aggregate expression;
    defaults to a row count."""
    aggs = aggs or {"n": F.count(F.lit(1))}
    keys = [F.window(F.col(ts_col), window_duration)] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(*[e.alias(n) for n, e in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(group_cols or []),
            *aggs.keys(),
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication by key.

    With ``ts_col``, uses ``dropDuplicatesWithinWatermark`` so per-key state
    is EVICTED once the watermark passes — bounded state, the only shape
    that survives an unbounded 100 TB stream. Without a ts column, plain
    ``dropDuplicates`` keeps state forever (test/finite streams only).
    """
    if ts_col is not None:
        return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return stream.dropDuplicates(key_cols)


def run_to_memory_sink(
    result: DataFrame, query_name: str | None = None, mode: str = "append"
) -> tuple[str, object]:
    """Start the stream into an in-memory table (test/debug sink), process
    everything currently available, and return (table_name, query handle).
    Caller stops the query."""
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )
    q.processAllAvailable()
    return name, q
