"""Large-row-count smoke (the reference's test_par.cxx runs 100M rows,
/root/reference/tests/test_par.cxx:13-22): generate 50M rows in-engine and
run the fused aggregate + histogram pipeline. Verifies the engine's
partial+final shapes and observe fusion hold beyond toy sizes, with exact
closed-form expectations."""

import pytest
from pyspark.sql import functions as F

from tdataframe_spark import Frame

N = 50_000_000


@pytest.fixture(scope="module")
def big(spark):
    df = spark.range(N).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 1000).cast("double").alias("m"),
    )
    return Frame(df)


def test_fused_aggregates_50m(big):
    fr = big.filter("x >= 0")
    cnt, mn, mx, me = fr.count(), fr.min("x"), fr.max("x"), fr.mean("m")
    assert cnt.get() == N
    assert mn.ready and mx.ready and me.ready  # one fused pass
    assert mn.get() == 0.0 and mx.get() == float(N - 1)
    assert me.get() == pytest.approx(499.5)


def test_histo_50m(big):
    hist = big.histo("m", nbins=10, lo=0.0, hi=1000.0).get()
    assert sum(b[3] for b in hist) == N
    # uniform residues: every bin exactly N/10
    assert all(b[3] == N // 10 for b in hist)


def test_ivf_1m_vectors(spark):
    """IVF index build + probe on a 1M-vector in-engine corpus: proves the
    training loop holds beyond toy sizes with no corpus-sized driver
    collect (round-1 seeding collected every id)."""
    from tdataframe_spark.ops.similarity import ivf_topk

    corpus = spark.range(1_000_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), d -> cast(sin(id * d) as double))"
        ).alias("embedding"),
    )
    # offset 7 skips vec_id=0, whose all-zero vector has no direction
    queries = corpus.filter(F.col("vec_id") % 200_000 == 7)
    out = ivf_topk(queries, corpus, k=5, n_cells=16, n_probe=4)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 5
    assert all(len(v) == 5 for v in by_q.values())
    assert all(-1.0 <= r["cos_sim"] <= 1.0 + 1e-9 for r in rows)


def test_minhash_lsh_50k_docs(spark):
    """MinHash+LSH at 10x the bench corpus (50k docs built by replicating
    sf0.1 documents with perturbed ids): the pair-restricted verify must
    hold up when banding yields corpus-wide candidates — planted exact
    replicas must be found, runtime bounded by the smoke timeout rather
    than an all-pairs blowup."""
    from tdataframe_spark.ops.dedup import minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    # 10 copies; copy k shifts ids by k*100_000 — every doc has 9 exact
    # replicas, so banding floods the candidate set on purpose
    replicated = docs.selectExpr(
        "explode(sequence(0, 9)) as k", "doc_id", "text"
    ).select(
        (F.col("doc_id") + F.col("k") * 100_000).alias("doc_id"), "text"
    )
    try:
        pairs = minhash_lsh_pairs(
            replicated, "doc_id", "text", n=3, k=16, bands=4, threshold=0.9,
            persist=True,
        )
        # replicas of doc 0: pairs among {0, 100000, ...} with jaccard 1
        hits = pairs.filter(
            (F.col("id_a") % 100_000 == 0) & (F.col("id_b") % 100_000 == 0)
            & (F.col("jaccard") == 1.0)
        ).count()
        assert hits >= 45  # C(10,2) pairs for doc 0 alone
    finally:
        # a failing assert must not leak the persisted 500k-doc corpus
        # into the session-scoped SparkSession
        spark.catalog.clearCache()


def test_minhash_lsh_5m_docs_planted_duplicates(spark):
    """Near-dup detection at 5M docs — the scale none of the sf runs can
    probe: in-engine generated corpus with closed-form planted structure
    (25k exact-duplicate pairs among ids < 50k, one HOT 1000-replica
    group to force a skewed band bucket, every other doc shingle-disjoint
    by construction). The banded candidate generation + pair-restricted
    verify must return EXACTLY the planted pairs (identical texts always
    collide in every band and verify at jaccard 1; disjoint shingle sets
    can reach the verifier only through band-hash collisions, which the
    exact-jaccard filter then rejects) — and survive the C(1000,2) hot
    bucket without an all-pairs or memory cliff."""
    from tdataframe_spark.ops.dedup import minhash_lsh_pairs

    n = 5_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(0, 7), j -> format_string("
            "  'a%db%d', "
            "  CASE WHEN id < 50000 THEN id - (id % 2) "
            "       WHEN id >= 4900000 AND id < 4901000 THEN 4900000 "
            "       ELSE id END, j)))"
        ).alias("text"),
    )
    try:
        pairs = minhash_lsh_pairs(
            docs, "doc_id", "text", n=3, k=16, bands=4, threshold=0.9,
            persist=True,
        ).persist()
        total = pairs.count()
        hot = pairs.filter(
            (F.col("id_a") >= 4_900_000) & (F.col("id_b") < 4_901_000)
        ).count()
        plain = pairs.filter(F.col("id_a") < 50_000).count()
        assert hot == 1000 * 999 // 2, hot
        assert plain == 25_000, plain
        assert total == hot + plain, (total, hot, plain)
        assert pairs.filter(F.col("jaccard") != 1.0).count() == 0
    finally:
        spark.catalog.clearCache()


def test_nearest_centroid_500k_vectors(spark):
    """Classifier scale shape: 500k synthetic 16-dim vectors in 10 exactly
    separable clusters — centroids must land on the cluster structure and
    classification must be perfect, with the per-(label,dim) partial-sum
    shuffle and one-row-per-vector argmax holding at this size."""
    from tdataframe_spark.ops.classify import nearest_centroid_confusion

    n, dim, classes = 500_000, 16, 10
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % classes).cast("int").alias("label"),
        F.expr(
            # one-hot-ish: strong signal at dim (label mod 16) plus a small
            # deterministic per-row wobble elsewhere
            "transform(sequence(0, 15), d -> CAST("
            "  CASE WHEN d = CAST(id % 10 AS INT) THEN 10.0 "
            "       ELSE (pmod(id * 37 + d, 7)) / 100.0 END AS FLOAT))"
        ).alias("embedding"),
    )
    conf = nearest_centroid_confusion(df).collect()
    assert sum(r["n"] for r in conf) == n
    assert all(r["label"] == r["pred"] for r in conf), conf


def test_pq_200k_vectors(spark):
    """PQ train+encode+ADC search on a 200k-vector in-engine corpus (dim
    16, m=4 subspaces): the compressed-domain path beyond toy sizes —
    codebook training's driver state stays k×dim regardless of corpus."""
    from tdataframe_spark.ops.similarity import pq_topk

    corpus = spark.range(200_000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 16), d -> cast(sin(id * d) as double))"
        ).alias("embedding"),
    )
    queries = corpus.filter(F.col("vec_id") % 50_000 == 7)
    out = pq_topk(
        queries, corpus, k=5, m=4, n_codes=16, lloyd_iterations=2, rerank=20
    )
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 4
    assert all(len(v) == 5 for v in by_q.values())
    assert all(-1.0 <= r["cos_sim"] <= 1.0 + 1e-9 for r in rows)


def test_synthetic_source_5m_sessionize_and_heavy_hitters(spark):
    """The Python DataSource feeds real operators at the millions scale:
    5M generated events flow through sessionization and CMS-prefiltered
    heavy hitters with exact closed-form checks (generator rows are a
    pure function of index, so totals are computable)."""
    from tdataframe_spark.functions.sketches import heavy_hitters
    from tdataframe_spark.sources.synthetic import register_synthetic

    register_synthetic(spark)
    n = 5_000_000
    ev = (
        spark.read.format("synthetic_events")
        .option("rows", n).option("partitions", 32)
        .option("users", 1000).option("step_us", 1000)
        .load()
    )
    # heavy hitters over user_id: splitmix64 is near-uniform, so each of
    # 1000 users has ~5000 events and min_count=2500 is a bar nearly all
    # clear; the CMS prefilter may drop unlucky light users, so only
    # >=990 and sum<=n are sound assertions
    hh = heavy_hitters(ev, "user_id", min_count=2500)
    rows = hh.collect()
    assert len(rows) >= 990  # near-uniform: almost every user qualifies
    assert sum(r["count"] for r in rows) <= n
    # sessionization: 1 ms cadence per GLOBAL index, per-user gaps are
    # ~users×step; a 10-minute gap never triggers -> one session per user
    from tdataframe_spark.operators.windows import sessionize

    s = sessionize(
        ev.select("user_id", F.col("ts_us")), "user_id", "ts_us",
        gap_seconds=600,
    )
    agg = s.agg(
        F.countDistinct("user_id", "session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_rows"),
    ).first()
    assert agg["n_rows"] == n and agg["n_sessions"] == 1000


def test_deletion_vectors_2m_rows(spark, tmp_path):
    """DV scale smoke: a 2M-row table takes a selective row-level delete
    (0.1% of rows) as a small DV commit — the delete's cost is dominated
    by one scan, the DV parquet stays kilobyte-scale relative to the
    data, reads anti-join exactly right, and txn_purge rewrites nothing
    at a sane threshold (no file is 10% deleted)."""
    import os

    from tdataframe_spark.sources.txn import (
        txn_delete, txn_latest, txn_purge, txn_read, txn_write,
    )

    n = 2_000_000
    path = str(tmp_path / "t")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("grp")
    )
    txn_write(df.repartition(16), path, mode="overwrite")
    v = txn_delete(spark, path, "k % 1000 = 7")  # 2000 rows
    assert v == 2
    _, m = txn_latest(path)
    dv_bytes = sum(
        os.path.getsize(os.path.join(path, e["path"])) for e in m["dv"]
    )
    data_bytes = sum(
        os.path.getsize(os.path.join(path, f["path"])) for f in m["files"]
    )
    assert dv_bytes < data_bytes / 100  # kilobyte-scale vs the table
    got = txn_read(spark, path)
    assert got.count() == n - 2000
    assert got.filter("k % 1000 = 7").count() == 0
    # nothing crosses a 10% per-file threshold: purge is a no-op commit
    assert txn_purge(spark, path, min_deleted_ratio=0.1) == v
