from tdataframe_spark.streaming.ops import (
    dedup_stream,
    kafka_reader,
    parse_kafka_json,
    run_to_memory_sink,
    session_agg,
    stream_from_files,
    stream_from_kafka,
    stream_rollup_refresh,
    stream_to_parquet,
    stream_stream_join,
    stream_upsert_to_parquet,
    windowed_agg,
)

__all__ = [
    "stream_from_files",
    "windowed_agg",
    "run_to_memory_sink",
    "dedup_stream",
    "session_agg",
    "stream_stream_join",
    "kafka_reader",
    "stream_from_kafka",
    "stream_to_parquet",
    "stream_upsert_to_parquet",
    "stream_rollup_refresh",
    "parse_kafka_json",
]
