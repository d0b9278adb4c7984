#!/usr/bin/env python
"""Transactional-table tour: the lakehouse workflow end to end on the
synthetic orders table — the operational layer a 100 TB deployment runs
under every pipeline in this repo.

Stages: seed (atomic commit) → CDC MERGE (txn_upsert, CAS-pinned) →
snapshot time travel (read the pre-merge table AS OF its commit ts) →
row-level change feed (txn_changes: updates as delete+insert pairs) →
incremental consumer (txn_changes_since cursor loop) → schema evolution
(append a new column; old rows NULL-backfill) → CHECK constraint
(violating batches bounce pre-staging) → SHALLOW CLONE (zero-copy dev
branch) → native streaming source (readStream over commit history) →
OPTIMIZE (compact_txn: one atomic manifest commit, snapshot-pinned
readers unaffected) → VACUUM (reclaim unreferenced files under a
retention window; note the clone is a snapshot — vacuuming the source
inside a clone's lifetime is the documented Delta-parity caveat).

Run: python examples/lakehouse_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tdataframe_spark import get_spark
from tdataframe_spark.sources.layout import compact_txn
from tdataframe_spark.sources.parquet import read_table
from tdataframe_spark.sources.txn import (
    txn_changes,
    txn_changes_since,
    txn_latest,
    txn_read,
    txn_snapshots,
    txn_upsert,
    txn_vacuum,
    txn_write,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse-tour", cpus=4, shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    path = os.path.join(tempfile.mkdtemp(), "orders_txn")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )

    # 1. seed — one atomic commit
    txn_write(orders, path, mode="overwrite")
    v1, m1 = txn_latest(path)
    print(f"v{v1}: seeded {txn_read(spark, path).count()} rows")

    # 2. CDC MERGE — re-price 10% of orders, one CAS-pinned commit
    upd = orders.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    v2 = txn_upsert(upd, path, keys=["o_orderkey"])
    print(f"v{v2}: merged {upd.count()} re-priced orders")

    # 3. time travel — the pre-merge snapshot, byte-identical
    asof = txn_read(spark, path, as_of=m1["ts"])
    print(f"as-of v1: {asof.count()} rows (pre-merge snapshot intact)")

    # 4. row-level change feed — updates as delete+insert pairs
    ch = txn_changes(spark, path, v1, v2)
    ch.groupBy("_change_type").count().orderBy("_change_type").show()

    # 5. incremental consumer — cursor loop over new commits
    df, cursor = txn_changes_since(spark, path, v1)
    print(f"consumer advanced v{v1} -> v{cursor}: {df.count()} change rows")

    # 6. schema evolution — append a column; old rows NULL-backfill
    txn_write(
        upd.limit(5).withColumn("priority", F.lit("rush")), path
    )
    head = txn_read(spark, path)
    n_null = head.filter(F.col("priority").isNull()).count()
    print(f"schema evolved: +priority, {n_null} pre-existing rows NULL-backfilled")

    # 6b. CHECK constraint — contract validated per batch, pre-staging
    from tdataframe_spark.sources.txn import (
        ConstraintViolationError,
        txn_add_constraint,
        txn_clone,
        txn_drop_constraint,
    )

    txn_add_constraint(spark, path, "price_pos", "o_totalprice > 0")
    try:
        bad = txn_read(spark, path).limit(3).withColumn(
            "o_totalprice", F.lit(-1.0)
        )
        txn_write(bad, path)
    except ConstraintViolationError as e:
        print(f"CHECK bounced a bad batch pre-staging: {str(e)[:70]}...")

    # 6b'. GENERATED column — declared once, computed/validated on
    # every write (Delta GENERATED ALWAYS AS); batches that omit it
    # get it computed, batches that provide a wrong copy bounce
    from tdataframe_spark.sources.txn import txn_add_generated_column

    gen_path = path + "_gen"
    shutil.rmtree(gen_path, ignore_errors=True)
    txn_write(orders.limit(0), gen_path)
    txn_add_generated_column(
        spark, gen_path, "price_band",
        "cast(floor(o_totalprice / 100000) as string)", dtype="string",
    )
    txn_write(orders.limit(100), gen_path)  # omits price_band -> computed
    bands = txn_read(spark, gen_path).groupBy("price_band").count().count()
    print(f"GENERATED price_band computed on append: {bands} bands")

    # 6c. SHALLOW CLONE — a zero-copy dev branch of the table
    dev = path + "_dev"
    shutil.rmtree(dev, ignore_errors=True)
    txn_clone(path, dev)
    txn_write(
        txn_read(spark, path).limit(5).withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
        ),
        dev,
    )
    print(f"CLONE: dev table reads {txn_read(spark, dev).count()} rows "
          f"(source untouched at {txn_read(spark, path).count()}); "
          "clone cost = one manifest commit, zero data bytes")

    # 6d. native streaming SOURCE — replay the dev clone's commits
    from tdataframe_spark.sources.txn_stream import txn_readstream

    # replay bounds: start_version skips already-consumed history (the
    # first batch of any (re)start replays everything after it in ONE
    # batch), and max_commits_per_batch caps steady-state batches under
    # a periodic trigger — together they bound both the cold-start and
    # the catch-up cost of a long-running stream
    sink_dir = os.path.join(os.path.dirname(path), "feed")
    q = (
        txn_readstream(spark, dev, start_version=0, max_commits_per_batch=10)
        .writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", sink_dir + "_ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    print(f"readStream('txn_table') replayed "
          f"{spark.read.parquet(sink_dir).count()} rows from the clone's "
          "commit history (version offsets)")
    txn_drop_constraint(path, "price_pos")

    # 6e. SQL FRONT DOOR — plain spark.sql over a snapshot by name
    # (VERSION AS OF included); pruning happened before the catalog
    from tdataframe_spark.sources.txn import txn_view

    txn_view(spark, path, "orders_txn")
    n_sql = spark.sql(
        "SELECT count(*) AS c FROM orders_txn WHERE o_totalprice > 0"
    ).first()["c"]
    print(f"txn_view: spark.sql over the snapshot reads {n_sql} rows")
    spark.catalog.dropTempView("orders_txn")

    # 6f. RECORDED CHANGE FILES (Change Data Feed) — with cdf.enabled,
    # MERGE/DELETE commit their exact row changes; the per-commit feed
    # never diffs snapshots (contrast txn_changes, which collapses
    # intermediate states between two snapshots)
    from tdataframe_spark.sources.txn import (
        txn_change_feed,
        txn_delete,
        txn_set_properties,
    )

    cdf_path = path + "_cdf"
    shutil.rmtree(cdf_path, ignore_errors=True)
    txn_write(orders.limit(200), cdf_path)
    txn_set_properties(cdf_path, {"cdf.enabled": "true"})
    txn_upsert(
        txn_read(spark, cdf_path).limit(10).withColumn(
            "o_totalprice", F.col("o_totalprice") * 1.1
        ),
        cdf_path, keys=["o_orderkey"],
    )
    txn_delete(spark, cdf_path, "o_orderkey % 50 = 0")
    feed = txn_change_feed(spark, cdf_path, 2)
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(
            F.count("*").alias("n")
        ).collect()
    }
    print(f"CDF feed (recorded, per-commit): {by_type}")

    # 6g. BLOOM FILE SKIPPING — per-file Bloom filters prune point
    # lookups min/max stats are blind to (unclustered hash layouts);
    # the row filter always applies, so false positives never change
    # the result
    bloom_path = path + "_bloom"
    shutil.rmtree(bloom_path, ignore_errors=True)
    txn_write(
        orders.repartition(8, "o_orderkey"),
        bloom_path, mode="overwrite",
        stats_cols=["o_orderkey"], bloom_cols=["o_orderkey"],
    )
    probe = [r[0] for r in orders.select("o_orderkey").limit(3).collect()]
    hit = txn_read(spark, bloom_path, value_filter={"o_orderkey": probe})
    print(
        f"bloom lookup: {hit.count()} rows from "
        f"{len(hit.inputFiles())} of 8 hash files scanned"
    )

    # 6h. IDEMPOTENT WRITES — a replayable loader names its commits;
    # replays skip before staging (exactly-once without a checkpoint)
    from tdataframe_spark.sources.txn import txn_app_version

    idem_path = path + "_idem"
    shutil.rmtree(idem_path, ignore_errors=True)
    b1 = orders.limit(100)
    txn_write(b1, idem_path, app_id="loader", app_version=1)
    txn_write(b1, idem_path, app_id="loader", app_version=1)  # replay: no-op
    print(
        f"idempotent writes: {txn_read(spark, idem_path).count()} rows "
        f"after a replayed batch (watermark "
        f"{txn_app_version(idem_path, 'loader')})"
    )
    shutil.rmtree(idem_path, ignore_errors=True)

    # 6i. METADATA TABLES — file inventory and DESCRIBE DETAIL from the
    # manifest alone (rows/bytes ride every commit entry; no data read)
    from tdataframe_spark.sources.txn import txn_detail, txn_files

    det = txn_detail(spark, path).collect()[0]
    print(
        f"DESCRIBE DETAIL: v{det['version']}, {det['n_files']} files, "
        f"{det['rows']} rows, {det['bytes']} bytes; inventory rows: "
        f"{txn_files(spark, path).count()}"
    )

    # 7. OPTIMIZE — compact small files in one atomic commit.
    # on_conflict="rebase" is the production shape: a concurrent append
    # landing mid-compaction rides into the replacement commit instead
    # of failing the OPTIMIZE (file-level replacement, column mapping
    # preserved) — background maintenance never blocks ingestion
    n_files_before = len(txn_latest(path)[1]["files"])
    compact_txn(spark, path, on_conflict="rebase")
    n_files_after = len(txn_latest(path)[1]["files"])
    print(f"OPTIMIZE: {n_files_before} files -> {n_files_after}; "
          f"as-of v1 still reads {txn_read(spark, path, version=1).count()} rows")

    # 8. VACUUM — reclaim unreferenced commits past the retention
    # window; a table can pin its own policy via properties
    # (vacuum.keep_versions / vacuum.min_age_s) and a bare
    # txn_vacuum(path) honors it — explicit arguments override
    removed = txn_vacuum(path, keep_versions=1, min_age_s=0)
    print(f"VACUUM removed {len(removed)} retired commit dirs; "
          f"head still reads {txn_read(spark, path).count()} rows")
    print("snapshots retained:", [v for v, _ in txn_snapshots(path)])

    shutil.rmtree(os.path.dirname(path), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
