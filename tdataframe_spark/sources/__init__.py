from tdataframe_spark.sources.parquet import read_parquet, read_testdata

__all__ = ["read_parquet", "read_testdata"]
