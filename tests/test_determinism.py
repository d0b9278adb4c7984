"""Partitioning-invariance: the determinism conventions (decimal sums,
ordered folds, portable hashes, total-order windows) claim BIT-IDENTICAL
results on any partitioning. Prove it: run double-producing queries under
very different shuffle-partition counts and require exact equality —
a raw SUM(double) would flap here."""

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"

# queries whose outputs carry floating-point aggregates through shuffles
QUERIES = [
    "q1_pricing_summary",
    "quantiles",
    "decayed_engagement",
    "outliers",
    "rolling_window",
    "nearest_centroid",
    "rollup_incremental",
    "bm25_topk",
]


def _run(spark, name):
    df = em.queries()[name](spark, SF)
    pdf = df.toPandas().reindex(sorted(df.columns), axis=1)
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


@pytest.mark.parametrize("name", QUERIES)
def test_result_invariant_under_partitioning(spark, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _run(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        b = _run(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a.equals(b), f"{name}: results differ across partitionings"
