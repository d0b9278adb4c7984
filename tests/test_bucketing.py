"""Bucketed tables: pre-shuffled storage for co-located joins — the
explicit 100 TB strategy for repeated joins on the same key (SURVEY.md §2.2:
"repartition/bucketing for co-located joins")."""

import pytest
from pyspark.sql import functions as F

from tdataframe_spark.plans import explain_str

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # uses the session's default warehouse dir (spark-warehouse/, gitignored);
    # warehouse.dir is a static conf that cannot move after session start
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_eliminates_shuffle(spark, bucketed_tables):
    orders_b, li_b = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey)
        plan = explain_str(joined, "simple")
        # co-located buckets: sort-merge join with NO Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        # restore the PRE-TEST value (the session is shared suite-wide;
        # re-hardcoding the session default here would drift if it changes)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_bucketed_join_correct(spark, bucketed_tables):
    orders_b, li_b = bucketed_tables
    got = li_b.join(orders_b, li_b.l_orderkey == orders_b.o_orderkey).count()
    plain = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == plain
