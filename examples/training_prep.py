#!/usr/bin/env python
"""Training-batch preparation example: from curated documents to packed,
stratified training sequences — the post-curation half of the pipeline
(corpus_curation.py is the first half).

Stages: chunk long documents into overlapping word windows → token-count
each chunk → pack chunks into fixed-size training sequences (hash-sharded,
no global sort) → stratified sample per source for a held-out split →
write a z-ordered snapshot so downstream scans skip files. Every stage is
a DataFrame plan; the only shuffles are the pack window (per-shard) and
the snapshot range partitioning.

Run: python examples/training_prep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tdataframe_spark import get_spark
from tdataframe_spark.ops.textstats import (
    chunk_documents,
    pack_sequences,
    stratified_sample,
)
from tdataframe_spark.sources.layout import read_pruned, write_sorted


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-prep-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. chunk: long docs -> overlapping word windows (shuffle-free)
    chunks = chunk_documents(docs, "doc_id", "text", chunk_size=64, overlap=16)
    print(f"documents={docs.count()}  chunks={chunks.count()}")

    # 2. pack: lay chunks end-to-end into fixed-budget training sequences
    #    (hash-sharded windows — no global ORDER BY at any scale). Chunk id
    #    = doc_id * 4096 + chunk_id (unique, order-preserving within doc).
    chunk_rows = chunks.select(
        (F.col("doc_id") * 4096 + F.col("chunk_id")).alias("cid"),
        "n_words_chunk",
    )
    packed = pack_sequences(chunk_rows, "cid", "n_words_chunk", budget=256)
    n_seqs = packed.agg(F.countDistinct("shard", "chunk")).first()[0]
    print(f"chunks packed into {n_seqs} sequences of <=256 tokens")

    # 3. held-out split: exact-rate stratified sample per source domain
    with_src = chunks.join(docs.select("doc_id", "source"), "doc_id").withColumn(
        "cid", F.col("doc_id") * 4096 + F.col("chunk_id")
    )
    heldout = stratified_sample(with_src, ["source"], fraction=0.05, id_col="cid")
    print("held-out per source:")
    for r in heldout.groupBy("source").count().collect():
        print(f"  {r['source']}: {r['count']}")

    # 4. layout: sorted snapshot -> file-level skipping on later scans
    out = os.path.join(tempfile.mkdtemp(prefix="training_prep_"), "chunks")
    write_sorted(
        chunks.withColumn("n", F.col("n_words_chunk").cast("double")),
        out,
        sort_by=["n"],
        n_files=8,
    )
    narrow = read_pruned(spark, out, "n", 60.0, 64.0)
    print(
        f"pruned scan reads {len(narrow.inputFiles())}/8 files, "
        f"{narrow.count()} rows"
    )

    spark.stop()


if __name__ == "__main__":
    main()
