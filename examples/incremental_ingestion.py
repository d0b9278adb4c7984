#!/usr/bin/env python
"""Incremental ingestion example: the admit-a-batch loop a 100 TB pipeline
runs when new data arrives — NOTHING here reprocesses the existing corpus;
every step touches only the batch plus fixed-size or partition-pruned
state.

Per batch:
1. gate      — data-quality expectations (reject the batch on violations)
2. exact     — drop docs whose content hash is already in the exact index
3. near-dup  — drop docs the persisted MinHash index flags (stream-safe)
4. semantic  — drop vectors eps-close to a persisted SemDeDup
   representative (broadcast-centroid argmax + one cluster-keyed join;
   k-means trained ONCE, never per batch)
5. decontam  — drop docs sharing n-grams with the eval set (Bloom prefilter)
6. admit     — append survivors to the corpus + grow both indexes
7. rollup    — fold batch events into the continuous aggregate
   (reads/rewrites only touched day partitions)

Run: python examples/incremental_ingestion.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tdataframe_spark import get_spark
from tdataframe_spark.ops.dedup import (
    build_exact_index,
    build_minhash_index,
    decontaminate_bloom,
    match_exact_index,
    match_minhash_index,
)
from tdataframe_spark.ops.quality import dq_report, expect, expect_unique
from tdataframe_spark.ops.rollup import build_rollup, refresh_rollup, serve_rollup
from tdataframe_spark.sources.parquet import read_table


def main(sf_dir: str) -> None:
    spark = get_spark("incremental-ingestion", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_")
    exact_idx = os.path.join(work, "exact_idx")
    nd_idx = os.path.join(work, "minhash_idx")
    rollup = os.path.join(work, "rollup")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    # day 0: the corpus so far; the "arriving batch" is the other half
    corpus = docs.filter((F.col("doc_id") % 50 != 0) & (F.col("doc_id") % 2 == 0))
    batch = docs.filter((F.col("doc_id") % 50 != 0) & (F.col("doc_id") % 2 != 0))

    build_exact_index(corpus, "doc_id", "text", exact_idx)
    build_minhash_index(corpus, "doc_id", "text", nd_idx)

    # 1. gate
    report = dq_report([
        expect(batch, "text_nonempty", F.length("text") > 0),
        expect_unique(batch, "doc_id_unique", ["doc_id"]),
    ])
    report.show(truncate=False)
    assert all(r["violations"] == 0 for r in report.collect()), "batch rejected"

    # 2-5. dedup + decontaminate, all against persisted/broadcast state
    from tdataframe_spark.ops.similarity import semdedup_assign, semdedup_build

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sem_idx = os.path.join(work, "semdedup_idx")
    # one-time semantic clustering of the corpus' embeddings; per-batch
    # work is assign-only (same amortized contract as the text indexes)
    semdedup_build(
        emb.join(corpus.select(F.col("doc_id").alias("vec_id")), "vec_id"),
        sem_idx, "vec_id", "embedding", eps=0.35, n_clusters=8,
    )
    exact_hits = match_exact_index(batch, exact_idx, "doc_id", "text")
    near_hits = match_minhash_index(batch, nd_idx, "doc_id", "text")
    sem_hits = semdedup_assign(
        emb.join(batch.select(F.col("doc_id").alias("vec_id")), "vec_id"),
        sem_idx, "vec_id", "embedding",
    ).where(~F.col("keep"))
    contaminated = decontaminate_bloom(batch, eval_set, "doc_id", "text")
    drop = (
        exact_hits.select(F.col("new_id").alias("doc_id"))
        .unionByName(near_hits.select(F.col("new_id").alias("doc_id")))
        .unionByName(sem_hits.select(F.col("new_id").alias("doc_id")))
        .unionByName(contaminated.select("doc_id"))
        .distinct()
    )
    admitted = batch.join(drop, "doc_id", "left_anti")
    print(
        f"batch={batch.count()} admitted={admitted.count()} "
        f"(exact={exact_hits.count()}, near={near_hits.count()}, "
        f"semantic={sem_hits.count()}, contaminated={contaminated.count()})"
    )

    # 6. admit: grow the indexes with only the admitted docs; place every
    # admitted doc into the existing near-dup clusters (bridges flagged
    # for the next periodic full rebuild)
    from tdataframe_spark.ops.dedup import assign_clusters, build_cluster_index

    cl_idx = os.path.join(work, "cluster_idx")
    build_cluster_index(corpus, "doc_id", "text", cl_idx)
    assignments = assign_clusters(admitted, cl_idx, "doc_id", "text")
    n_bridges = assignments.where(F.col("needs_merge")).count()
    print(f"cluster assignments: {assignments.count()} ({n_bridges} bridge docs flagged)")
    build_exact_index(admitted, "doc_id", "text", exact_idx, mode="append")
    build_minhash_index(admitted, "doc_id", "text", nd_idx, mode="append")

    # 7. continuous aggregate over the event stream, split the same way
    events = read_table(spark, sf_dir, "events")
    build_rollup(events.filter(F.col("event_id") % 2 == 0), rollup,
                 group_cols=["event_type"])
    days = refresh_rollup(events.filter(F.col("event_id") % 2 != 0), rollup,
                          group_cols=["event_type"])
    print(f"rollup refreshed {len(days)} day partition(s)")
    serve_rollup(spark, rollup, ["event_type"]).orderBy("bucket", "event_type").show(5)

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
