"""Plan-quality assertions: the properties that make queries survive 100 TB.

These tests pin the physical plan, not the results: filter pushdown into the
parquet scan, column pruning, broadcast joins for dimension tables, and
whole-stage codegen on the hot paths.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as em
from tdataframe_spark import Frame
from tdataframe_spark.plans import (
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    scan_read_schema,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    fr = Frame(li).filter("l_quantity > 45").filter("l_discount > 0.01")
    pushed = pushed_filters(fr.df)
    assert any("l_quantity" in p for p in pushed), pushed
    assert any("l_discount" in p for p in pushed), pushed


def test_column_pruning(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = Frame(li).filter("l_quantity > 45").select("l_orderkey").df
    schemas = scan_read_schema(df)
    assert schemas, "no scan found"
    # only the projected + filtered columns are read, not all 11
    assert "l_extendedprice" not in schemas[0]
    assert "l_orderkey" in schemas[0]
    assert "l_quantity" in schemas[0]


def test_q3_broadcasts_dimension(spark):
    df = em.q_q3_topk_revenue(spark, SF)
    assert has_broadcast_join(df)
    assert has_whole_stage_codegen(df)


def test_q5_broadcasts_dims(spark):
    df = em.q_q5_region_revenue(spark, SF)
    assert has_broadcast_join(df)


def test_fused_agg_is_single_aggregate(spark):
    """All scalar actions on one frame must compile to ONE partial+final
    aggregate pair (the reference's one-event-loop contract, X1)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    fr = Frame(li).filter("l_quantity > 10")
    from tdataframe_spark.core.aggregates import scalar_agg_plan

    exprs = {}
    for i, kind in enumerate(["count", "min", "max", "mean"]):
        e, _ = scalar_agg_plan(fr.df, None if kind == "count" else "l_quantity", kind)
        for k, v in e.items():
            exprs[f"a{i}_{k}"] = v
    agg_df = fr.df.agg(*[v.alias(k) for k, v in exprs.items()])
    from tdataframe_spark.plans import explain_str

    text = explain_str(agg_df, "simple")
    assert text.count("HashAggregate") == 2, text  # partial + final only
    assert has_whole_stage_codegen(agg_df)


def test_histo_stays_jvm_side(spark):
    """Histogram = bucketize + hash agg; no Python eval nodes in the plan."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = Frame(li).histo_frame("l_quantity", nbins=50, lo=0.5, hi=50.5)
    from tdataframe_spark.plans import explain_str

    text = explain_str(df)
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_topk_plans_take_ordered(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    df = Frame(orders).top_k(15, "o_totalprice").df
    from tdataframe_spark.plans import explain_str

    assert "TakeOrderedAndProject" in explain_str(df)


def test_exists_rewrites_to_semi_anti_join(spark):
    """Correlated EXISTS / NOT EXISTS must become semi/anti joins, not
    per-row subquery execution."""
    import __spark_entry__ as entrymod
    from tdataframe_spark.plans import explain_str

    df = entrymod.q_exists_subquery(spark, SF)
    text = explain_str(df, "simple")
    assert "LeftSemi" in text and "LeftAnti" in text, text


def test_range_join_predicate_in_join_condition(spark):
    """The range predicate must live in the Join node itself (a post-Filter
    would silently break left-join semantics and delay row elimination)."""
    from pyspark.sql import Row

    from tdataframe_spark.operators.rangejoin import range_join
    from tdataframe_spark.plans import explain_str

    points = spark.createDataFrame([Row(p=1.0)])
    iv = spark.createDataFrame([Row(name="a", lo=0.0, hi=2.0)])
    df = range_join(points, iv, "p", "lo", "hi", bucket_width=1.0)
    text = explain_str(df, "simple")
    join_lines = [ln for ln in text.splitlines() if "Join [__bucket" in ln]
    assert join_lines, text
    # the residual range condition sits ON the join, e.g.
    #   SortMergeJoin [__bucket#4L], [__bucket#6L], Inner, ((p#0 >= lo#2) AND (p#0 <= hi#3))
    assert any(">= lo" in ln and "<= hi" in ln for ln in join_lines), text


def test_runtime_bloom_filter_injection_path_live(spark):
    """The session enables runtime bloom-filter join pruning
    (`spark.sql.optimizer.runtime.bloomFilter.enabled`). At production scale
    Spark only injects the filter when the fact-side scan exceeds
    `applicationSideScanSizeThreshold` (10 GB default) — unreachable in a
    local test — so lower the thresholds and assert the injection machinery
    actually rewrites a selective dim→fact join to probe a bloom filter
    (`might_contain`) on the fact side before the shuffle."""
    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        # force a shuffle join so the bloom filter (not a broadcast) is the
        # mechanism that prunes the fact side
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "l_extendedprice"
        )
        text = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in text or "bloom_filter_agg" in text, text
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_q8_six_way_join_broadcasts_no_cartesian(spark):
    """Q8's 6-way join: every dimension side broadcast, no cartesian — the
    only shuffles left are the fact-fact orderkey join and the tiny final
    group-by-year agg."""
    from tdataframe_spark.plans.inspect import explain_str

    df = em.q_q8_market_share(spark, SF)
    plan = explain_str(df, "simple")
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q15_max_revenue_is_broadcast_not_collect(spark):
    """Q15's global-max scalar joins back via broadcast (1-row side), so the
    plan has no driver-side collect of the revenue table."""
    df = em.q_q15_top_supplier(spark, SF)
    assert has_broadcast_join(df)


def test_cosine_pairs_no_cartesian(spark):
    """Exact threshold-pairs must plan as a block-grid equi-join (shuffled
    hash/sort-merge), never a cartesian/nested-loop — the difference between
    a distributable O(n²/cluster) job and an undistributable one."""
    from tdataframe_spark.plans.inspect import explain_str

    df = em.q_cosine_pairs(spark, SF)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_join_strategy_hints_pin_physical_join(spark):
    """Frame.join(strategy=) pins the physical algorithm: merge -> SortMergeJoin,
    shuffle_hash -> ShuffledHashJoin, broadcast -> BroadcastHashJoin."""
    from tdataframe_spark.plans.inspect import explain_str

    li = Frame(spark.read.parquet(f"{SF}/lineitem.parquet"))
    orders = spark.read.parquet(f"{SF}/orders.parquet")

    cases = {
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
        "broadcast": "BroadcastHashJoin",
    }
    for strategy, node in cases.items():
        df = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey"), strategy=strategy
        ).df
        plan = explain_str(df, "simple")
        assert node in plan, (strategy, plan)

    with pytest.raises(ValueError):
        li.join(orders, "l_orderkey", strategy="nested_gpu")


def test_nearest_centroid_broadcasts_and_no_pair_shuffle(spark):
    """Inference must broadcast the centroid table and fold the argmax with
    a partial aggregate BEFORE the exchange (one row per vector crosses);
    no cartesian escape."""
    from tdataframe_spark.plans.inspect import explain_str

    df = em.q_nearest_centroid(spark, SF)
    plan = explain_str(df, "simple")
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "partial_max" in plan, plan  # map-side argmax fold


def test_bloom_decontamination_filters_before_any_join(spark):
    """The bloom probe must appear as a plain Filter on the corpus shingle
    stream (codegen bit math) — the corpus must NOT join the eval set at
    full width; its only join input is the post-filter survivor stream."""
    from tdataframe_spark.plans.inspect import explain_str

    df = em.q_decontamination_bloom(spark, SF)
    plan = explain_str(df, "formatted")
    assert "shiftleft" in plan, plan       # the bitset probe
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop join allowed is the 1-row broadcast bloom attach
    # (count on the simple plan: formatted repeats each node in its detail
    # section)
    simple = explain_str(df, "simple")
    assert simple.count("BroadcastNestedLoopJoin") <= 1, simple


def test_rolling_window_single_exchange(spark):
    """The RANGE-frame rolling aggregate must cost exactly one shuffle (the
    user partition) — any time self-join would show as a second join/
    exchange pair."""
    from tdataframe_spark.plans.inspect import explain_str

    df = em.q_rolling_window(spark, SF)
    plan = explain_str(df, "simple")
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_fuzzy_join_is_inverted_index_not_cross(spark):
    from tdataframe_spark.plans.inspect import explain_str

    df = em.q_fuzzy_join(spark, SF)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dq_fk_check_broadcasts_dimension(spark):
    """The referential-integrity expectation must anti-join against a
    BROADCAST dimension — the fact side must not shuffle."""
    from tdataframe_spark.ops.quality import expect_fk

    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    df = expect_fk(o, "fk", "o_custkey", c, "c_custkey")
    assert has_broadcast_join(df), df._jdf.queryExecution().executedPlan().toString()


def test_global_rank_never_single_partitions(spark):
    """The distributed global numbering must plan a RANGE repartition and
    contain no window operator and no single-partition exchange — the
    failure mode it exists to avoid."""
    from tdataframe_spark.operators.windows import _ranged_numbered
    from tdataframe_spark.plans.inspect import explain_str
    from tdataframe_spark.sources.parquet import read_table

    # the range exchange lives in the pre-checkpoint stage (the final
    # plan starts at the checkpointed RDD) — pin it there
    orders = read_table(spark, SF, "orders")
    staged = _ranged_numbered(
        orders, [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()], 4
    )
    assert "rangepartitioning" in explain_str(staged, "simple").lower()
    df = em.q_global_rank(spark, SF)
    plan = explain_str(df, "simple").lower()
    assert "window" not in plan, plan
    assert "singlepartition" not in plan, plan


def test_roc_auc_never_single_partitions_the_scores(spark):
    """The AUC cumulation must be two-level (range partition →
    per-partition window → broadcast prefix offsets): the plan must show
    a RANGE repartition and NO Window fed by a single-partition exchange
    — continuous scores (distinct ≈ n rows) would otherwise funnel the
    whole score table through one task."""
    from tdataframe_spark.ops.classify import _auc_partitioned_scores
    from tdataframe_spark.plans.inspect import count_global_windows, explain_str
    from tdataframe_spark.sources.parquet import read_table

    # the range exchange lives in the pre-checkpoint stage (the final
    # plan starts at the checkpointed RDD) — pin it there
    ev = read_table(spark, SF, "events")
    staged, _ = _auc_partitioned_scores(
        ev.select((F.col("value") > 500).cast("int").alias("y"),
                  F.col("value").alias("s")),
        "y", "s",
    )
    assert "rangepartitioning" in explain_str(staged, "simple").lower()
    df = em.q_roc_auc(spark, SF)
    plan = explain_str(df, "simple")
    assert count_global_windows(plan) == 0, plan
    # and the cumulation window is genuinely per-range-partition
    assert "windowspecdefinition(__pid" in plan, plan


def test_global_window_lint_detects_the_trap(spark):
    """count_global_windows must flag an unpartitioned cumulative window
    and pass a partitioned one — the lint the registry audit relies on."""
    from pyspark.sql import Window as W

    from tdataframe_spark.plans.inspect import count_global_windows, explain_str

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    bad = df.withColumn("c", F.sum("id").over(W.orderBy("id")))
    good = df.withColumn(
        "c", F.sum("id").over(W.partitionBy("k").orderBy("id"))
    )
    assert count_global_windows(explain_str(bad, "simple")) == 1
    assert count_global_windows(explain_str(good, "simple")) == 0
    # misattribution guard: a window whose distribution is ALREADY
    # satisfied has no exchange of its own — a deeper operator's
    # SinglePartition exchange (here: a global agg's partial-row funnel)
    # must not be pinned on it
    one = df.groupBy().agg(F.sum("id").alias("t"))
    over_agg = one.withColumn(
        "r", F.row_number().over(W.partitionBy("t").orderBy("t"))
    )
    assert count_global_windows(explain_str(over_agg, "simple")) == 0
    # stacked windows: the shared exchange belongs to the INNER window;
    # the outer one must not double-report (and a partitioned pair is 0)
    stacked = good.withColumn(
        "d", F.count("id").over(W.partitionBy("k").orderBy("id"))
    )
    assert count_global_windows(explain_str(stacked, "simple")) == 0
    stacked_bad = bad.withColumn(
        "d", F.count("id").over(W.orderBy("id"))
    )
    assert count_global_windows(explain_str(stacked_bad, "simple")) == 1


def test_pq_adc_scan_broadcasts_and_no_cartesian(spark):
    """PQ search must score the compressed codes via a BROADCAST ADC-table
    join (map-side, no shuffle of the corpus for candidate generation) and
    never fall back to a cartesian/nested-loop pair plan. Inspect the lazy
    plan (materialize=False): pq_topk's default path eagerly checkpoints
    the top-k so it can release its corpus caches, which collapses the
    executed plan to a checkpoint scan."""
    from pyspark.sql import functions as F2

    from tdataframe_spark.ops.similarity import pq_topk
    from tdataframe_spark.plans.inspect import explain_str

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = pq_topk(
        emb.filter(F2.col("vec_id") % 100 == 0), emb, k=5, rerank=50,
        materialize=False,
    )
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert has_broadcast_join(df), plan


def test_perplexity_buckets_approx_has_no_window_sort(spark):
    """The approx bucket path exists to dodge the per-group window sort: its
    plan must contain no Window operator (the exact ntile path has one)."""
    from tdataframe_spark.ops.textstats import perplexity_buckets
    from tdataframe_spark.plans.inspect import explain_str

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = perplexity_buckets(docs, "doc_id", "text", "lang")
    approx = perplexity_buckets(docs, "doc_id", "text", "lang", method="approx")
    assert "Window" in explain_str(exact, "simple")
    assert "Window" not in explain_str(approx, "simple")


def test_dedup_keep_best_single_window_over_cluster(spark):
    """Representative selection is one window pass partitioned by cluster —
    no join back, no cartesian."""
    from tdataframe_spark.ops.dedup import dedup_keep_best
    from tdataframe_spark.plans.inspect import explain_str

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = explain_str(dedup_keep_best(docs, pairs, "doc_id"), "simple")
    assert plan.count("Window") == 1, plan
    assert "CartesianProduct" not in plan, plan


# the registry-wide audit enforces the three unconditional scale-killers
# plus global windows; "single-partition-exchange" is informational only —
# every global .agg() legitimately funnels its PARTIAL rows (#partitions
# of them) through one task, and string matching can't tell that apart
# from a full-data sort. "global-window" CAN tell (it walks the plan tree
# for a Window fed by an Exchange SinglePartition), so it is enforced.
_LINT_ENFORCED = {"cartesian", "python-row-udf", "bnlj", "global-window"}

# Window-over-SinglePartition is allowed NOWHERE: the last site
# (encode_categorical's vocabulary ranking) was rebuilt on the two-level
# global_row_number machinery in round 6 — the allowlist is empty and
# must stay empty (new global windows are a scale bug, not a policy call).
_GLOBAL_WINDOW_ALLOWED: set[str] = set()

# BroadcastNestedLoopJoin is allowed ONLY at these enumerated
# constant-attach sites (PLANS.md "deliberate 1-row constant attaches"):
# the build side is a single-row aggregate, a bounded query/constant set,
# or similar O(1)-size data — never a data-proportional table. Everything
# else in the registry must candidate-generate via equi-joins.
_BNLJ_ALLOWED = {
    "cosine_topk",         # bounded query-set broadcast (by contract)
    "q22_idle_customers",  # 1-row scalar avg(acctbal) subquery attach
    "decayed_engagement",  # 1-row corpus max-timestamp attach
    "histo_equidepth",     # 1-row quantile-edges array attach
    "histo_equidepth_approx",  # same attach, sketch-placed edges
    "ccnet_buckets",       # per-language cutpoint rows (bounded by #langs)
    "retrieval_metrics",   # bounded labeled query-set attach
    "winsorize",           # 1-row clip-bounds attach
    "winsorize_approx",    # same attach, GK-sketch-placed bounds
    "collocations",        # 1-row total-bigram-count attach
    "domain_mix",          # 1-row corpus-total attach for mix ratios
    "bm25_topk",           # 1-row corpus stats (N, avgdl) attach
    "hybrid_search",       # 1-vector dense query broadcast (cosine leg) +
                           # bm25's 1-row corpus-stats attach
    "heavy_hitters",       # 1-row dense CMS counter attach (bounded
                           # depth×width longs, ridden as data)
    "tfidf_pairs",         # 1-row corpus-size (n_docs) attach for idf
    "q11_important_parts",  # 1-row scalar threshold (avg part value) attach
    "dsir_weights",        # 1-row corpus-total attaches (target + raw gram
                           # counts) feeding the bounded bucket table
    "dsir_sample",         # inherits dsir_weights' total attaches; the
                           # selection itself is a TakeOrdered
    "source_divergence",   # 1-row corpus-token-total attach + the bounded
                           # occupied-bucket table (≤ n_buckets rows)
    "bm25_indexed",        # bm25's 1-row corpus-stats (n_docs, avglen) attach
    "triangle_count",      # three 1-row count attaches assembling the
                           # (n_nodes, n_edges, n_triangles) summary row
    "ab_test",             # 1-row group-B moment attach onto the 1-row
                           # group-A moments
    "histo2d",             # nx×ny dense grid spine (bounded constant,
                           # 100 rows) crossed from two range() axes
    "target_encode",       # 1-row global-mean (prior) attach
    "bootstrap_ci",        # 1-row percentile-band attach onto 1-row stats
    "dds_quantiles",       # len(qs)-row quantile-probe attach onto the
                           # bounded (zone, bucket) sketch table
    # heavy builders (linted on their FINAL plans): each BNLJ is a
    # bounded model/constant attach, never a data-proportional side
    "decontamination_bloom",  # 1-row bloom-bitset attach (map-side probes)
    "nearest_centroid",    # k-row centroid table attach
    "semdedup_assign",     # k-row centroid argmax attach (index is bounded)
    "ivf_ann",             # centroid table + bounded query-vector attach
    "filtered_ann",        # same centroid-probe attach; the metadata
                           # predicate itself is a pushed scan filter
    "ivf_append",          # k-row persisted-centroid argmax attach + the
                           # bounded appended-batch query broadcast
    "lang_id",             # n_langs-row grid attach (bounded by the
                           # language set) for the all-out-of-place leg
    "ivfpq_ann",           # same, plus the bounded ADC codebook attach
    "lm_score",            # bounded vocabulary/corpus-stats attach
    "logreg_score",        # (d+1)-row weight-vector attach
    "pca_embeddings",      # d-row component-matrix attach
}


# these train/materialize during DataFrame CONSTRUCTION (cheap plan-only
# construction is impossible); the fast registry-wide lint below skips
# them and the dedicated heavy-builder lint runs their FINAL plans once.
_HEAVY_BUILDERS = {
    "pq_ann", "ivf_ann", "ivfpq_ann", "lsh_ann", "filtered_ann",
    "bpe_tokens", "dedup_components",
    "dedup_keep_best", "rollup_incremental", "snapshot_diff",
    "merge_upsert", "global_rank", "decontamination_bloom",
    "nearest_centroid", "lm_score", "semdedup", "semdedup_assign",
    "pca_embeddings", "logreg_score", "merge_upsert_txn", "cdc_changes", "time_travel",
    # round-7: txn MERGE-with-delete commit, memoized index build+append,
    # memoized pq build, in-engine langid profile training
    "merge_delete_txn", "delete_vectors", "dv_purge", "ivf_append",
    "pq_query", "lang_id",
    "restore_table", "data_skipping", "gif_frames",
    # round-8: fixture AVI/WAV/image payload construction (collects ≤16 ids)
    "video_frames", "audio_features", "image_dedup", "shot_detect",
    "image_dedup_index",
    # round-11: reduce_fold EXECUTES the fold at construction (instant
    # action); txn_sql_view / cdf_feed seed+mutate txn tables at
    # construction
    "reduce_fold", "txn_sql_view", "cdf_feed",
}


def _lint_failures(spark, names, failures):
    from tdataframe_spark.plans.inspect import lint_plan

    for name in names:
        fn = em.queries()[name]
        try:
            df = fn(spark, SF)
        except Exception as e:  # construction itself must not fail
            failures.append(f"{name}: construction error {e}")
            continue
        for hit in lint_plan(df):
            rule = hit.split(":")[0]
            if rule not in _LINT_ENFORCED:
                continue
            if rule == "bnlj" and name in _BNLJ_ALLOWED:
                continue
            if rule == "global-window" and name in _GLOBAL_WINDOW_ALLOWED:
                continue
            failures.append(f"{name}: {hit}")


def test_registry_wide_plan_lint(spark):
    """EVERY registered query's physical plan must be free of cartesian
    products and row-at-a-time Python — the structural 100 TB audit."""
    failures = []
    _lint_failures(
        spark,
        [n for n in em.queries() if n not in _HEAVY_BUILDERS],
        failures,
    )
    assert not failures, "\n".join(failures)


def test_heavy_builders_final_plans_linted(spark):
    """The construction-time trainers excluded from the fast lint get the
    SAME audit on the plans they ultimately return — training runs once
    at sf0.001, then the final DataFrame is linted. Together with the
    registry-wide lint, every registry entry's returned plan is checked;
    no entry escapes because its builder is expensive."""
    failures = []
    _lint_failures(spark, sorted(_HEAVY_BUILDERS), failures)
    assert not failures, "\n".join(failures)
