#!/usr/bin/env python
"""End-to-end training-data curation example: the pipeline shape a 100 TB
corpus job runs, on the synthetic `documents` + `embeddings` tables.

Stages: profile (tokens / quality / language) → exact dedup → near-dup
removal (MinHash-LSH pair graph → connected components, keep cluster
minimum) → quality floor → per-language stats; plus an embedding ANN index
build + query. Every stage is a DataFrame plan — one driver, no
row-at-a-time Python in the hot path.

Run: python examples/corpus_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tdataframe_spark import get_spark
from tdataframe_spark.ops.dedup import (
    connected_components,
    exact_dedup_groups,
    minhash_lsh_pairs,
)
from tdataframe_spark.ops.similarity import ivf_build, ivf_query
from tdataframe_spark.ops.textstats import doc_stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. profile every document (pure JVM expressions)
    prof = doc_stats(docs, "doc_id", "text")

    # 2. exact dedup: keep the minimum id per identical (normalized) content
    keep_exact = exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )

    # 3. near-dup removal: LSH candidate pairs → exact-verified pair graph →
    #    connected components → drop everything but each cluster's minimum
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    clusters = connected_components(pairs)
    near_dupes = clusters.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )

    kept = (
        prof.join(keep_exact, "doc_id", "left_semi")
        .join(near_dupes, "doc_id", "left_anti")
        .filter(F.col("quality") >= 0.5)
    )

    print(f"documents: {n0} -> kept {kept.count()}")
    kept.groupBy("lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    ).orderBy("lang_guess").show(truncate=False)

    # 4. similarity index over the (kept) embeddings: build once, query often
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with tempfile.TemporaryDirectory() as d:
        idx = os.path.join(d, "ivf")
        ivf_build(emb, idx, n_cells=8)
        queries = emb.filter(F.col("vec_id") % 100 == 7)
        print("ANN neighbours from the prebuilt index:")
        ivf_query(spark, idx, queries, k=3).orderBy("query_id", "rnk").show(
            9, truncate=False
        )

    spark.stop()


if __name__ == "__main__":
    main()
