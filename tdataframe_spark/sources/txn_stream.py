"""Structured-Streaming SOURCE over the transactional table (Spark 4
Python DataSource streaming API): each commit's ADDED files become one
micro-batch, offsets are manifest versions — the Delta-streaming shape
(``spark.readStream.format("delta")``) re-expressed over this repo's
manifest log.

    from tdataframe_spark.sources.txn_stream import txn_readstream
    stream = txn_readstream(spark, path)           # from version 0
    stream = txn_readstream(spark, path, start_version=7)

Semantics (Delta parity):

* **Append feed, not CDC** — the stream emits rows ADDED by each
  commit. A commit that REMOVES files or adds deletion vectors
  (overwrite, replace_where, MERGE, DELETE) is not expressible as an
  append and raises mid-stream, unless ``ignore_changes=true`` — then
  its added files are emitted and its removals are skipped (Delta's
  ``ignoreChanges``; downstream must tolerate re-emits). For a
  row-exact change feed use ``txn_changes_since`` in a foreachBatch
  poll loop instead.
* **Offsets are versions** — exactly-once across restarts comes from
  Spark's offset log: a replayed batch re-plans the same [start, end)
  version window and reads the same immutable files.
* **Schema is pinned at stream start** (the latest manifest's logical
  schema): files written before an additive evolution NULL-backfill;
  files written under column mapping resolve physical→logical, so a
  table renamed mid-history streams under its current names.
* A VACUUUMED manifest inside the requested window always raises —
  its data bytes are gone; restart from a retained version.

Scale shape: planning is driver-side manifest JSON only (O(files
touched), the same cost txn_read pays); row reads happen on EXECUTORS,
one input partition per added file, yielding Arrow record batches —
the driver never materializes data. Shallow-cloned entries resolve
through their recorded base like every other reader.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from tdataframe_spark.sources.txn import (
    _abs_file,
    _load,
    _mapping,
    _plain_schema,
    _versions,
    txn_latest,
)


class _FileSlice(InputPartition):
    """One added data file: absolute path + the pinned logical schema
    (JSON) + logical→physical mapping, self-contained for the executor."""

    def __init__(self, abs_path: str, schema_json: str, mapping: dict):
        self.abs_path = abs_path
        self.schema_json = schema_json
        self.mapping = mapping


def _added_files(path: str, version: int) -> tuple[list[dict], bool]:
    """(files added by ``version``, whether it also removed/hid rows).
    Removal = files dropped vs the parent OR deletion-vector entries
    grown (a DV hides rows — not an append)."""
    m = _load(path, version)
    if m.get("vacuumed"):
        raise ValueError(
            f"version {version} of {path} was vacuumed — its data is "
            "reclaimed; restart the stream from a retained version"
        )
    parent = m.get("parent", version - 1)
    try:
        pm = _load(path, parent) if parent else None
    except FileNotFoundError:
        pm = None  # parent manifest aged out: treat as unknown baseline
    before = {f["path"] for f in (pm or {}).get("files", [])}
    added = [f for f in m["files"] if f["path"] not in before]
    removed = bool(before - {f["path"] for f in m["files"]})
    dv_grew = len(m.get("dv", [])) > len((pm or {}).get("dv", []))
    return added, removed or dv_grew


class TxnStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("txn_table stream needs .option('path', ...)")
        self.start_version = int(options.get("start_version", 0))
        self.ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        self.schema = schema
        # mapping pinned at stream start alongside the schema: the
        # manifest's field metadata carries each column's physical name
        _, manifest = txn_latest(self.path)
        if manifest is None:
            raise FileNotFoundError(
                f"no transactional table at {self.path}"
            )
        self.mapping = _mapping(
            StructType.fromJson(json.loads(manifest["schema"]))
        )

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        vs = _versions(self.path)
        return {"version": vs[-1] if vs else self.start_version}

    def partitions(self, start: dict, end: dict):
        out = []
        sj = self.schema.json()
        have = set(_versions(self.path))
        gaps = [
            v for v in range(start["version"] + 1, end["version"] + 1)
            if v not in have
        ]
        if gaps:
            # vacuum unlinked those manifests — their data may be
            # reclaimed; skipping silently would be silent data loss
            raise ValueError(
                f"commits {gaps[0]}..{gaps[-1]} of {self.path} were "
                "vacuumed away — restart the stream with "
                f"start_version >= {max(gaps)}"
            )
        for v in range(start["version"] + 1, end["version"] + 1):
            added, changed = _added_files(self.path, v)
            if changed and not self.ignore_changes:
                raise ValueError(
                    f"commit {v} of {self.path} removed or hid rows "
                    "(overwrite/replace_where/MERGE/DELETE) — not an "
                    "append; pass ignore_changes=true to stream its "
                    "added files anyway (downstream must tolerate "
                    "re-emits), or consume txn_changes_since for CDC"
                )
            for f in added:
                out.append(
                    _FileSlice(_abs_file(self.path, f), sj, self.mapping)
                )
        return out

    def read(self, partition: _FileSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        target = StructType.fromJson(json.loads(partition.schema_json))
        arrow_target = to_arrow_schema(_plain_schema(target))
        table = pq.read_table(partition.abs_path)
        n = table.num_rows
        cols = []
        for field, spark_field in zip(arrow_target, target.fields):
            phys = partition.mapping.get(spark_field.name, spark_field.name)
            if phys in table.column_names:
                col = table.column(phys).cast(field.type)
            else:
                # file predates an additive evolution: NULL backfill
                col = pa.nulls(n, type=field.type)
            cols.append(col)
        yield from pa.table(cols, schema=arrow_target).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; manifests are immutable


class TxnTableSource(DataSource):
    @classmethod
    def name(cls):
        return "txn_table"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("txn_table needs .option('path', ...)")
        _, manifest = txn_latest(path)
        if manifest is None:
            raise FileNotFoundError(f"no transactional table at {path}")
        return _plain_schema(
            StructType.fromJson(json.loads(manifest["schema"]))
        )

    def streamReader(self, schema: StructType):
        return TxnStreamReader(schema, self.options)


def register_txn_stream(spark) -> None:
    """Register the source for this session; afterwards
    ``spark.readStream.format("txn_table").option("path", ...)`` works
    anywhere. Same session-global Arrow side effect note as
    ``register_synthetic``."""
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.dataSource.register(TxnTableSource)


def txn_readstream(
    spark,
    path: str,
    start_version: int = 0,
    ignore_changes: bool = False,
):
    """``readStream`` over a transactional table: registers the source
    and returns the streaming DataFrame. ``start_version`` is
    EXCLUSIVE — the first emitted commit is ``start_version + 1``
    (0 = replay the whole history)."""
    register_txn_stream(spark)
    return (
        spark.readStream.format("txn_table")
        .option("path", path)
        .option("start_version", start_version)
        .option("ignore_changes", str(bool(ignore_changes)).lower())
        .load()
    )
