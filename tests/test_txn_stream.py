"""Structured-Streaming source over the transactional table
(sources/txn_stream.py): version offsets, append-feed semantics,
non-append guards, column-mapping + schema-evolution resolution, and
clone (foreign-base) reads."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tdataframe_spark.sources.txn import (
    txn_clone,
    txn_delete,
    txn_read,
    txn_rename_column,
    txn_upsert,
    txn_vacuum,
    txn_write,
)
from tdataframe_spark.sources.txn_stream import txn_readstream


def _run(spark, path, out, ck, **opts):
    q = (
        txn_readstream(spark, path, **opts)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_txn_stream_replays_history_and_picks_up_commits(spark, tmp_path):
    """History replay equals the table read (through a rename and an
    evolving append — old files NULL-backfill under the pinned
    schema); a restart from the same checkpoint emits ONLY the commits
    that landed since."""
    path, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    txn_write(
        spark.range(5).select("id", (F.col("id") * 2).alias("v")),
        path, mode="append",
    )
    txn_write(
        spark.range(5, 8).select("id", (F.col("id") * 2).alias("v")),
        path, mode="append",
    )
    txn_rename_column(path, "v", "val")
    txn_write(
        spark.range(8, 9).select(
            "id", (F.col("id") * 2).alias("val"), F.lit("x").alias("tag")
        ),
        path, mode="append",
    )
    _run(spark, path, out, ck)
    got = _rows(spark.read.parquet(out))
    assert got == _rows(txn_read(spark, path))
    assert (8, 16, "x") in got and (0, 0, None) in got
    # incremental: one more commit, same checkpoint -> only the delta
    txn_write(
        spark.range(9, 10).select(
            "id", (F.col("id") * 2).alias("val"), F.lit("y").alias("tag")
        ),
        path, mode="append",
    )
    _run(spark, path, out, ck)
    got2 = _rows(spark.read.parquet(out))
    assert len(got2) == len(got) + 1 and (9, 18, "y") in got2


def test_txn_stream_guards_non_append_and_vacuum(spark, tmp_path):
    """A commit that removes or hides rows raises mid-stream;
    ignore_changes=true streams its ADDED files instead; a vacuumed
    manifest inside the window always raises."""
    path, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    txn_write(
        spark.range(4).select("id", (F.col("id") * 2).alias("v")),
        path, mode="append",
    )
    _run(spark, path, out, ck)
    txn_delete(spark, path, "id = 1")
    with pytest.raises(Exception, match="not an"):
        _run(spark, path, out, ck)
    # ignore_changes: the delete commit adds no files -> nothing new;
    # an upsert (overwrite) re-emits its rewritten file set
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    _run(spark, path, out2, ck2, ignore_changes=True)
    base = spark.read.parquet(out2).count()
    txn_upsert(
        spark.createDataFrame([(0, 99)], "id long, v long"), path, ["id"]
    )
    _run(spark, path, out2, ck2, ignore_changes=True)
    after = spark.read.parquet(out2)
    assert after.count() > base  # rewritten snapshot re-emitted
    assert after.filter("id = 0 and v = 99").count() == 1
    # vacuum inside the window: a fresh stream from 0 must refuse
    txn_vacuum(path, keep_versions=1, min_age_s=0.0)
    with pytest.raises(Exception, match="vacuumed"):
        _run(spark, path, str(tmp_path / "out3"), str(tmp_path / "ck3"))


def test_txn_stream_reads_clones_and_start_version(spark, tmp_path):
    """A shallow clone streams its (foreign-base) history; start_version
    skips it: only commits after the clone point emit."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    a = spark.range(6).select("id", (F.col("id") * 3).alias("v"))
    txn_write(a, src, mode="append")
    txn_clone(src, dst)
    txn_write(
        spark.createDataFrame([(100, 1)], "id long, v long"), dst,
        mode="append",
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, dst, out, ck)
    assert _rows(spark.read.parquet(out)) == _rows(txn_read(spark, dst))
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    _run(spark, dst, out2, ck2, start_version=1)  # skip the clone commit
    assert _rows(spark.read.parquet(out2)) == [(100, 1)]
