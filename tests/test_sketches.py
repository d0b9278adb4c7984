"""Mergeable sketches: the merge law (union of part-sketches == sketch of
whole) and error bounds vs exact answers — the properties that let 100 TB
pipelines pre-aggregate distinct counts per shard and roll up later."""

import pytest
from pyspark.sql import functions as F

from tdataframe_spark.functions.sketches import (
    approx_quantiles,
    grouped_distinct_sketches,
    hll_estimate,
    hll_merge,
    merge_distinct_sketches,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_hll_estimate_within_error(spark, orders):
    est = (
        orders.agg(hll_estimate(
            F.hll_sketch_agg(F.col("o_custkey"), F.lit(12))
        ).alias("e"))
        .first()["e"]
    )
    exact = orders.select("o_custkey").distinct().count()
    assert abs(est - exact) / exact < 0.05  # lgk=12 → ~0.8% typical


def test_hll_merge_law(spark, orders):
    """Sketch per order-priority shard, merged == estimate over the whole
    table: pre-aggregation then rollup gives the same answer path."""
    parts = grouped_distinct_sketches(orders, ["o_orderpriority"], "o_custkey")
    merged = (
        parts.agg(hll_estimate(hll_merge("sketch")).alias("e")).first()["e"]
    )
    whole = (
        orders.agg(hll_estimate(
            F.hll_sketch_agg(F.col("o_custkey"), F.lit(12))
        ).alias("e"))
        .first()["e"]
    )
    assert merged == whole  # identical value set → identical sketch estimate


def test_grouped_rollup_estimates(spark, orders):
    per_status = merge_distinct_sketches(
        grouped_distinct_sketches(orders, ["o_orderstatus", "o_orderpriority"], "o_custkey"),
        ["o_orderstatus"],
    )
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for r in per_status.collect():
        assert abs(r["approx_distinct"] - exact[r["o_orderstatus"]]) / exact[
            r["o_orderstatus"]
        ] < 0.05


def test_approx_quantiles_close_to_exact(spark, orders):
    got = approx_quantiles(orders, "o_totalprice", [0.25, 0.5, 0.75]).first()[
        "quantiles"
    ]
    exact = orders.agg(
        F.percentile(F.col("o_totalprice").cast("double"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    ).first()[0]
    for g, e in zip(got, exact):
        assert abs(g - e) / e < 0.01


def test_histo_equidepth_approx_depth_balance(spark):
    """The sketch-path equi-depth histogram (registered rows-only as
    `histo_equidepth_approx`) honors the Greenwald-Khanna bound: with
    relative rank error 1/accuracy, every bin's population stays within
    K * (2N/accuracy + max tie multiplicity) of the ideal N/K depth."""
    from tdataframe_spark.queries import HED_K, q_histo_equidepth_approx

    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    n = li.count()
    max_tie = (
        li.groupBy("l_extendedprice").count().agg(F.max("count")).first()[0]
    )
    bins = q_histo_equidepth_approx(spark, sf).collect()
    assert len(bins) == HED_K
    assert sum(r["n"] for r in bins) == n  # accounting: every row binned
    tol = 2 * n / 10000 + max_tie  # accuracy=10000 in the registered query
    for r in bins:
        assert abs(r["n"] - n / HED_K) <= tol, (r["bin"], r["n"], n / HED_K)
    # bins tile the value range in order
    ordered = sorted(bins, key=lambda r: r["bin"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] <= b["lo"]


def test_cms_merge_law_and_bounds(spark):
    """Sketch of parts, merged == sketch of the whole (EXACT counter
    equality), and point estimates never undercount."""
    from pyspark.sql import functions as F

    from tdataframe_spark.functions.sketches import cms_build, cms_merge, cms_query

    # Zipf-ish: value v appears ~N/v times
    df = spark.range(20_000).select(
        (F.floor(F.pow(F.lit(2.0), F.col("id") % 12)) % 97).cast("string").alias("v")
    )
    left = spark.range(20_000).where(F.col("id") % 2 == 0).select(
        (F.floor(F.pow(F.lit(2.0), F.col("id") % 12)) % 97).cast("string").alias("v"))
    right = spark.range(20_000).where(F.col("id") % 2 != 0).select(
        (F.floor(F.pow(F.lit(2.0), F.col("id") % 12)) % 97).cast("string").alias("v"))

    whole = {(r["r"], r["c"]): r["n"] for r in cms_build(df, "v").collect()}
    merged = {(r["r"], r["c"]): r["n"]
              for r in cms_merge(cms_build(left, "v"), cms_build(right, "v")).collect()}
    assert whole == merged

    exact = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}
    items = df.select("v").distinct()
    est = {r["v"]: r["est"] for r in cms_query(cms_build(df, "v"), items, "v").collect()}
    n_total = sum(exact.values())
    for v, n in exact.items():
        assert est[v] >= n  # CMS never undercounts
        assert est[v] <= n + (2 * n_total) // 2048 + 1  # generous e·N/w bound


def test_cms_parameters_ride_the_sketch(spark):
    """Query/merge derive width+depth FROM the sketch — no undercount via
    parameter mismatch is possible; mixed-parameter merges are refused;
    an empty sketch estimates 0."""
    import pytest

    from tdataframe_spark.functions.sketches import cms_build, cms_merge, cms_query

    df = spark.createDataFrame([("a",)] * 50, "v string")
    items = spark.createDataFrame([("a",), ("zz",)], "v string")
    sk = cms_build(df, "v", width=4096)  # non-default width
    est = {r["v"]: r["est"] for r in cms_query(sk, items, "v").collect()}
    assert est["a"] >= 50  # never undercounts, regardless of build width
    with pytest.raises(ValueError):
        cms_merge(sk, cms_build(df, "v", width=1024))
    empty = cms_build(df.filter("v = 'nope'"), "v")
    est0 = {r["v"]: r["est"] for r in cms_query(empty, items, "v").collect()}
    assert est0 == {"a": 0, "zz": 0}


def test_heavy_hitters_exact_vs_bruteforce(spark):
    """CMS-prefiltered heavy hitters must equal plain GROUP BY/HAVING on
    a skewed corpus with a long light tail, NULLs included — the sketch
    may only prune, never change the answer."""
    import random

    from tdataframe_spark.functions.sketches import heavy_hitters

    rng = random.Random(17)
    rows = (
        [(f"hot{i % 5}",) for i in range(400)]
        + [(f"warm{i % 40}",) for i in range(400)]
        + [(f"cold{i}",) for i in range(500)]
        + [(None,)] * 30
    )
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string")
    for mc in (10, 30, 81):
        got = {
            (r["k"], r["count"])
            for r in heavy_hitters(df, "k", min_count=mc, depth=3, width=128).collect()
        }
        expect = {
            (r["k"], r["count"])
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).cast("long").alias("count"))
            .filter(F.col("count") >= mc)
            .collect()
        }
        assert got == expect and (mc > 80 or len(expect) > 0)


def test_heavy_hitters_empty_and_bad_args(spark):
    import pytest

    from tdataframe_spark.functions.sketches import heavy_hitters

    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", min_count=1).count() == 0
    with pytest.raises(ValueError, match="min_count"):
        heavy_hitters(empty, "k", min_count=0)


def test_group_quantiles_approx_rank_bound(spark):
    """Each sketch-placed grouped quantile must sit within the GK rank
    guarantee of the exact order statistic: |rank(est) - p*n| <= eps*n
    with eps = 1/accuracy (slack 2x for interpolation at group edges)."""
    from tdataframe_spark.functions.sketches import approx_quantiles

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    acc = 1000
    got = {
        r["o_orderpriority"]: list(r["quantiles"])
        for r in approx_quantiles(
            orders, "o_totalprice", [0.25, 0.5, 0.75], accuracy=acc,
            keys=["o_orderpriority"],
        ).collect()
    }
    rows = orders.select("o_orderpriority", "o_totalprice").collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    assert set(got) == set(by_g) and len(got) == 5
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        for p, est in zip([0.25, 0.5, 0.75], got[g]):
            import bisect

            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            target = p * n
            # the estimate's rank interval must cover p*n within eps*n
            eps_n = 2.0 * n / acc + 1
            assert lo - eps_n <= target <= hi + eps_n, (g, p, est, lo, hi, n)


def test_hll_rollup_accuracy_and_merge_consistency(spark):
    """The two-level rollup (fine sketches merged up) must estimate within
    HLL's ±2σ of the exact distinct count AND equal the estimate from
    sketching the coarse level directly (merge law at the rollup level)."""
    from tdataframe_spark.functions.sketches import (
        grouped_distinct_sketches,
        merge_distinct_sketches,
    )

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    fine = grouped_distinct_sketches(li, ["l_returnflag", "l_linestatus"], "l_partkey")
    rolled = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in merge_distinct_sketches(fine, ["l_returnflag"]).collect()
    }
    direct = {
        r["l_returnflag"]: r["approx_distinct"]
        for r in merge_distinct_sketches(
            grouped_distinct_sketches(li, ["l_returnflag"], "l_partkey"),
            ["l_returnflag"],
        ).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(rolled) == set(exact) == set(direct) and len(exact) == 3
    # NOTE: rolled != direct is EXPECTED at this cardinality — unioning
    # fine sketches promotes them to dense HLL mode earlier than the
    # direct coarse sketch, shifting the estimate a percent or two. The
    # contract is the ERROR BOUND, which both paths must honor:
    for k in exact:
        for est in (rolled[k], direct[k]):
            rel = abs(est - exact[k]) / exact[k]
            assert rel < 0.052, (k, est, exact[k])  # 2σ for lgk=12, slack


def test_dds_merge_law_and_alpha_bound(spark, orders):
    """DDSketch: union of part-sketches == sketch of the whole (exact —
    buckets are plain counts), and every quantile estimate is within
    alpha relative error of the exact percentile."""
    from tdataframe_spark.functions.sketches import (
        dds_build,
        dds_merge,
        dds_quantiles,
    )

    alpha = 0.02
    lo = orders.filter("o_totalprice < 150000")
    hi = orders.filter("o_totalprice >= 150000")
    merged = dds_merge(
        dds_build(lo, "o_totalprice", alpha=alpha),
        dds_build(hi, "o_totalprice", alpha=alpha),
    )
    whole = dds_build(orders, "o_totalprice", alpha=alpha)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    est = {r["q"]: r["est"] for r in dds_quantiles(whole, qs).collect()}
    exact = {
        q: orders.selectExpr(f"percentile(o_totalprice, {q}) v").first()["v"]
        for q in qs
    }
    for q in qs:
        assert abs(est[q] - exact[q]) / exact[q] <= alpha + 1e-9, (
            q, est[q], exact[q],
        )
    # mixed-alpha merges bucket incompatibly and must refuse
    with pytest.raises(ValueError, match="different alpha"):
        dds_merge(whole, dds_build(orders, "o_totalprice", alpha=0.05))


def test_dds_zones_grouping_and_determinism(spark):
    """Sign zones: negatives mirror, exact zeros get their own bucket
    (no log); grouped sketches estimate per group; output is identical
    under repartitioning (deterministic bucket arithmetic)."""
    from tdataframe_spark.functions.sketches import dds_build, dds_quantiles

    rows = (
        [("a", float(-v)) for v in range(1, 101)]
        + [("a", 0.0)]
        + [("b", float(v)) for v in range(1, 101)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    sk = dds_build(df, "v", alpha=0.01, by=("g",))
    est = {
        (r["g"], r["q"]): r["est"]
        for r in dds_quantiles(sk, [0.5, 1.0]).collect()
    }
    # group a: 100 negatives + one zero -> median ~-50, max is the zero
    assert abs(est[("a", 0.5)] + 50) <= 0.5 + 1e-9
    assert est[("a", 1.0)] == 0.0
    assert abs(est[("b", 0.5)] - 50) <= 0.5 + 1e-9
    assert abs(est[("b", 1.0)] - 100) <= 1.0 + 1e-9
    again = {
        (r["g"], r["q"]): r["est"]
        for r in dds_quantiles(
            dds_build(df.repartition(7), "v", alpha=0.01, by=("g",)),
            [0.5, 1.0],
        ).collect()
    }
    assert again == est
    with pytest.raises(ValueError, match="alpha"):
        dds_build(df, "v", alpha=1.5)
    with pytest.raises(ValueError, match="qs"):
        dds_quantiles(sk, [0.0, 0.5])


def test_dds_empty_sketch_keeps_group_columns(spark):
    """A grouped sketch over zero non-NULL values yields quantiles with
    the SAME schema as a populated day (group cols + q + est) — both on
    the sketch-derived-alpha path and with alpha passed explicitly."""
    from tdataframe_spark.functions.sketches import dds_build, dds_quantiles

    df = spark.createDataFrame(
        [("a", None)], "g string, v double"
    ).filter("v is not null")
    sk = dds_build(df, "v", alpha=0.01, by=("g",))
    derived = dds_quantiles(sk, [0.5])
    explicit = dds_quantiles(sk, [0.5], alpha=0.01)
    assert derived.columns == ["g", "q", "est"]
    assert explicit.columns == ["g", "q", "est"]
    assert derived.count() == 0 and explicit.count() == 0
