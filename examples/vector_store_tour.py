#!/usr/bin/env python
"""Vector-store tour: the steady-state ANN lifecycle on the synthetic
embeddings table — cluster/train ONCE, ingest forever, probe amortized,
rebuild on drift.

Stages: build (ivf_build: cell-partitioned index on disk) → amortized
probe (ivf_query: centroid probe + partition-pruned scan) → incremental
ingestion (ivf_append: new batch routed through the PERSISTED centroids,
no retrain) → planted-duplicate recall check over the appended index →
filtered ANN (metadata predicate pushed to the scan) → the compressed
path (pq_build / pq_append / pq_query ADC probe + exact rerank) →
occupancy report (the rebuild-on-drift signal).

Run: python examples/vector_store_tour.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tdataframe_spark import get_spark
from tdataframe_spark.ops.similarity import (
    ivf_append,
    ivf_build,
    ivf_query,
    ivf_stats,
    pq_append,
    pq_build,
    pq_query,
)
from tdataframe_spark.sources.parquet import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    root = tempfile.mkdtemp(prefix="vector_store_tour_")
    ivf_path, pq_path = os.path.join(root, "ivf"), os.path.join(root, "pq")
    try:
        # 1. build once — the only training cost in the whole lifecycle
        t = time.time()
        ivf_build(emb, ivf_path, n_cells=8, meta_cols=["label"])
        print(f"ivf_build over {n} vectors: {time.time() - t:.2f}s")

        # 2. amortized probe
        queries = emb.filter(F.col("vec_id") % 100 == 0)
        t = time.time()
        hits = ivf_query(spark, ivf_path, queries, k=3, n_probe=4)
        print(f"probe: {hits.count()} results in {time.time() - t:.2f}s")

        # 3. incremental ingestion: copies of every 10th vector, fresh ids
        batch = emb.filter(F.col("vec_id") % 10 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding",
            F.lit(9).alias("label"),
        )
        t = time.time()
        ivf_append(batch, ivf_path)
        print(f"ivf_append {batch.count()} vectors: {time.time() - t:.2f}s "
              "(routed through persisted centroids — no retrain)")

        # 4. planted-duplicate recall over the appended index: every
        # appended copy must find its source as top-1 (sim-1.0 tie breaks
        # to the lower id)
        got = ivf_query(spark, ivf_path, batch, k=1, n_probe=8)
        ok = got.filter(
            F.col("neighbor_id") == F.col("query_id") - 1_000_000
        ).count()
        print(f"recall over appended index: {ok}/{batch.count()} top-1 hits")

        # 5. filtered ANN: the predicate lands in the parquet scan next to
        # the cell pruning — candidates are generated pre-filtered
        filt = ivf_query(
            spark, ivf_path, queries, k=3, n_probe=6, where="label < 5"
        )
        print(f"filtered probe (label < 5): {filt.count()} results")

        # 6. the compressed path: PQ codes ~16x smaller than raw vectors
        pq_build(emb, pq_path, m=16, n_codes=16)
        pq_append(batch.select("vec_id", "embedding"), pq_path)
        pq_hits = pq_query(spark, pq_path, queries, k=3, rerank=30)
        print(f"pq probe (ADC + rerank): {pq_hits.count()} results")

        # 7. occupancy report (ivf_stats) — the rebuild-on-drift signal:
        # appended mass concentrating in few cells means the trained
        # centroids no longer describe the corpus
        rows = ivf_stats(spark, ivf_path).collect()
        print("cell occupancy:", {r["cell"]: r["n"] for r in rows})
        worst = max(r["frac"] for r in rows)
        print(f"max cell holds {100 * worst:.1f}% of the corpus "
              "(rebuild when this drifts far from 1/n_cells)")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
