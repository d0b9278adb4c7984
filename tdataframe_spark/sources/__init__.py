from tdataframe_spark.sources.parquet import (
    SchemaDriftError,
    normalize_events,
    read_parquet,
    read_table,
    read_testdata,
)
from tdataframe_spark.sources.txn import (
    ConcurrentWriteError,
    is_txn_table,
    txn_changes,
    txn_changes_since,
    txn_latest,
    txn_latest_meta,
    txn_read,
    txn_snapshots,
    txn_upsert,
    txn_vacuum,
    txn_write,
)

__all__ = [
    "SchemaDriftError",
    "normalize_events",
    "read_parquet",
    "read_table",
    "read_testdata",
    "ConcurrentWriteError",
    "is_txn_table",
    "txn_changes",
    "txn_changes_since",
    "txn_latest",
    "txn_latest_meta",
    "txn_read",
    "txn_snapshots",
    "txn_upsert",
    "txn_vacuum",
    "txn_write",
]
