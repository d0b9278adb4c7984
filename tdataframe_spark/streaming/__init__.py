from tdataframe_spark.streaming.ops import (
    dedup_stream,
    run_to_memory_sink,
    stream_from_files,
    windowed_agg,
)

__all__ = ["stream_from_files", "windowed_agg", "run_to_memory_sink", "dedup_stream"]
