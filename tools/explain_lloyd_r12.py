#!/usr/bin/env python
"""Dump the Lloyd-iteration internals' physical plans for the r12
Arrow-scorer change (the shapes behind pq_ann / semdedup / ivf_* whose
query-level explain is an eager localCheckpoint stub): the PQ assignment
pass and the IVF assignment pass, plus each one's per-iteration update
aggregate — before (r11 HOF fold) vs after (Arrow-batched numpy argmax).
Usage:

    python tools/explain_lloyd_r12.py before|after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tdataframe_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("explain-lloyd-r12", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    from tdataframe_spark.ops import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    u = S._normalized(emb, "vec_id", "embedding", "__cid").filter(
        F.col("__vn").isNotNull()
    )

    # --- PQ: one assignment pass over the subvector table (both r11 and
    # r12 take the plain codebook dict, so the same call dumps either
    # tree's plan) ---
    sv = S._subvec_table(u, "__cid", 16)
    seed_rows = (
        sv.groupBy("__sub", F.pmod(F.xxhash64("__cid"), F.lit(16)).alias("__b"))
        .agg(F.min_by("__sv", F.col("__cid")).alias("__s"))
        .collect()
    )
    codebook = {}
    cells: dict = {}
    for r in sorted(seed_rows, key=lambda r: (r["__sub"], r["__b"])):
        c = cells.get(r["__sub"], 0)
        codebook[(r["__sub"], c)] = list(r["__s"])
        cells[r["__sub"]] = c + 1
    assigned = S._pq_assign(sv, "__cid", codebook)
    with open(os.path.join(OUT, f"lloyd_pq_assign_{suffix}.txt"), "w") as f:
        f.write(explain(assigned))

    # the full per-iteration update aggregate exactly as _pq_fit runs it
    assigned_v = S._pq_assign(sv, "__cid", codebook, carry_vec=True)
    sums = (
        assigned_v.select(
            "__sub", "__cell", F.posexplode("__sv").alias("__d", "__x")
        )
        .groupBy("__sub", "__cell", "__d")
        .agg(
            F.sum(F.col("__x").cast("decimal(38,18)")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    with open(os.path.join(OUT, f"lloyd_pq_update_{suffix}.txt"), "w") as f:
        f.write(explain(sums))

    # --- IVF: one assignment-with-vector pass (semdedup / ivf_* trainers) ---
    seed = (
        u.groupBy(F.pmod(F.xxhash64("__cid"), F.lit(8)).alias("__b"))
        .agg(F.min_by(F.struct("__cid", "__vn"), F.col("__cid")).alias("__s"))
        .select(F.col("__s.__vn").alias("__vn"), "__b")
        .orderBy("__b")
        .collect()
    )
    centroids = [(ci, list(r["__vn"])) for ci, r in enumerate(seed)]
    av = S._assign_with_vec(u, "__vn", "__cid", centroids)
    with open(os.path.join(OUT, f"lloyd_ivf_assign_{suffix}.txt"), "w") as f:
        f.write(explain(av))
    sums2 = (
        av.select("__cell", F.posexplode(F.col("__vn")).alias("__d", "__x"))
        .groupBy("__cell", "__d")
        .agg(
            F.sum(F.col("__x").cast("decimal(38,18)")).alias("__s"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    with open(os.path.join(OUT, f"lloyd_ivf_update_{suffix}.txt"), "w") as f:
        f.write(explain(sums2))

    # --- semdedup_assign: query-level plan (batch scored against the
    # persisted centroid index) ---
    import __spark_entry__ as em

    df = em.queries()["semdedup_assign"](spark, SF)
    with open(os.path.join(OUT, f"semdedup_assign_{suffix}.txt"), "w") as f:
        f.write(explain(df))

    print("wrote r12 lloyd plans:", suffix)
    spark.stop()


if __name__ == "__main__":
    main()
