#!/usr/bin/env python
"""End-to-end training-data curation example: the pipeline shape a 100 TB
corpus job runs, on the synthetic `documents` + `embeddings` tables.

Stages: profile (tokens / quality / language) → line + span (ExactSubstr)
boilerplate stripping → exact dedup → near-dup removal (MinHash-LSH pair
graph → connected components, keep the BEST cluster member by quality) →
quality floor → CCNet perplexity buckets → DSIR importance selection +
drift monitoring → quality-weighted downsampling → leakage-free
train/eval split → per-language stats; plus BPE subword tokenization and
an embedding ANN index (IVF-PQ: cell-partitioned compressed codes) build
+ query. Every stage is a DataFrame plan — one driver, no row-at-a-time
Python in the hot path.

Run: python examples/corpus_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tdataframe_spark import get_spark
from tdataframe_spark.ops.bpe import bpe_segment_table, bpe_tokenize, train_bpe
from tdataframe_spark.ops.dedup import (
    dedup_keep_best,
    exact_dedup_groups,
    minhash_lsh_pairs,
)
from tdataframe_spark.ops.similarity import ivfpq_build, ivfpq_query
from tdataframe_spark.ops.textstats import (
    doc_stats,
    group_split,
    perplexity_buckets,
    weighted_sample,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 1. profile every document (pure JVM expressions)
    prof = doc_stats(docs, "doc_id", "text")

    # 1b. C4-style line-level dedup: strip repeated boilerplate lines
    #     corpus-wide (first occurrence wins) BEFORE document-level dedup,
    #     so shared footers/headers can't glue unrelated docs together
    from tdataframe_spark.ops.dedup import dedup_lines

    line_stats = dedup_lines(docs, "doc_id", "text").agg(
        F.sum("n_lines").alias("lines"),
        F.sum("n_dropped").alias("boilerplate_dropped"),
    )
    line_stats.show(truncate=False)

    # 1c. ExactSubstr span dedup (Lee et al.): strip any 8-word window
    #     occurring more than once corpus-wide (first occurrence kept) —
    #     catches partial overlaps line- and doc-level dedup both miss
    from tdataframe_spark.ops.dedup import strip_duplicate_spans

    span_stats = strip_duplicate_spans(docs, "doc_id", "text").agg(
        F.sum("n_tokens").alias("tokens"),
        F.sum("n_dup_tokens").alias("dup_span_tokens"),
    )
    span_stats.show(truncate=False)

    # 2. exact dedup: keep the minimum id per identical (normalized) content
    keep_exact = exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )

    # 3. near-dup removal: LSH candidate pairs → connected components →
    #    keep each cluster's HIGHEST-QUALITY member (not just the min id)
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5)
    keep_best = dedup_keep_best(docs, pairs, "doc_id").filter(
        F.col("keep") == 1
    ).select("doc_id")

    kept = (
        prof.join(keep_exact, "doc_id", "left_semi")
        .join(keep_best, "doc_id", "left_semi")
        .filter(F.col("quality") >= 0.5)
    )

    print(f"documents: {n0} -> kept {kept.count()}")
    kept.groupBy("lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("quality"), 4).alias("mean_quality"),
    ).orderBy("lang_guess").show(truncate=False)

    # 3b. CCNet quality tiers + weighted downsample + leakage-free split:
    #     keep the head tier whole, downsample the rest by quality, and
    #     split whole SOURCES across train/eval (no near-dup straddling).
    #     The curated corpus is MATERIALIZED first — every stage below
    #     iterates over it, and re-executing the dedup lineage per
    #     iteration is the classic pipeline blow-up (a real deployment
    #     writes the curated snapshot to parquet here).
    kept_docs = (
        docs.join(kept.select("doc_id"), "doc_id", "left_semi")
        .localCheckpoint()
    )
    tiers = perplexity_buckets(kept_docs, "doc_id", "text", group_col="lang")
    print("perplexity tier sizes per language:")
    tiers.groupBy("lang", "bucket").count().orderBy("lang", "bucket").show(
        9, truncate=False
    )
    # quality recomputed directly on the (small, checkpointed) kept set —
    # joining back to `prof` would re-execute the full-corpus profile
    from tdataframe_spark.functions.text import quality_score

    sampled = weighted_sample(
        kept_docs.withColumn("quality", quality_score(F.col("text"))),
        "quality", rate=0.8, id_col="doc_id",
    )
    split = group_split(sampled, "source", eval_fraction=0.1)
    split.groupBy("split").count().show(truncate=False)

    # 3b'. DSIR data selection: importance weights toward the English
    #      subset as target, then a deterministic Gumbel top-k resample —
    #      the "make the web corpus look like the target" selection step
    from tdataframe_spark.ops.textstats import corpus_divergence, dsir_sample, dsir_weights

    wts = dsir_weights(
        kept_docs, kept_docs.filter(F.col("lang") == "en"), "doc_id", "text"
    )
    picked = dsir_sample(wts, "doc_id", n=max(10, n0 // 10))
    print(f"DSIR-selected {picked.count()} docs toward the en target")
    print("per-source drift vs corpus (JS divergence, top 5):")
    corpus_divergence(kept_docs, "source", "text").orderBy(
        F.col("js_div").desc()
    ).show(5, truncate=False)

    # 3c. learned subword tokenization (BPE trained on the kept corpus)
    merges = train_bpe(kept_docs, n_merges=12)
    seg = bpe_segment_table(kept_docs, merges)
    toks = bpe_tokenize(kept_docs, seg)
    toks.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("total_subword_tokens"),
    ).show(truncate=False)

    # 3d. semantic near-dup pass over the EMBEDDING space (SemDeDup):
    #     k-means clusters bound pair generation; the whole-space exact
    #     path stays available as cosine_pairs + components
    from tdataframe_spark.ops.similarity import semdedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sd = semdedup(emb, "vec_id", "embedding", eps=0.35, n_clusters=8)
    sd.groupBy("keep").count().show(truncate=False)

    # 3e. trainable quality gate: logistic regression on the labeled seed
    #     set, then a single map-side scoring pass over the corpus
    from tdataframe_spark.ops.classify import logreg_score, logreg_train

    model = logreg_train(emb, "embedding", "label", positive=0, n_iter=10)
    scored = logreg_score(emb, model, "vec_id", "embedding")
    scored.agg(
        F.round(F.min("prob"), 4).alias("min_prob"),
        F.round(F.max("prob"), 4).alias("max_prob"),
    ).show(truncate=False)

    # 3f. hybrid retrieval for corpus inspection: BM25 + dense cosine
    #     candidate lists fused by reciprocal rank
    from tdataframe_spark.ops.search import hybrid_topk

    print("hybrid (BM25 + dense RRF) top docs:")
    hybrid_topk(
        docs, emb, ["merge", "hash"], query_vec_id=0, k=5, n_candidates=20
    ).show(truncate=False)

    # 4. similarity index: IVF-PQ — coarse cells prune WHICH vectors a
    #    query touches, PQ codes shrink HOW MUCH each touch costs
    with tempfile.TemporaryDirectory() as d:
        idx = os.path.join(d, "ivfpq")
        ivfpq_build(emb, idx, n_cells=8, m=16, n_codes=8)
        queries = emb.filter(F.col("vec_id") % 100 == 7)
        print("ANN neighbours from the prebuilt compressed index:")
        ivfpq_query(
            spark, idx, queries, k=3, n_probe=3, rerank=10
        ).orderBy("query_id", "rnk").show(9, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
