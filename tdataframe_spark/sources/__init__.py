from tdataframe_spark.sources.parquet import (
    SchemaDriftError,
    normalize_events,
    read_parquet,
    read_table,
    read_testdata,
)

__all__ = [
    "SchemaDriftError",
    "normalize_events",
    "read_parquet",
    "read_table",
    "read_testdata",
]
