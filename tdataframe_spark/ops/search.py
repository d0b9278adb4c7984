"""Lexical retrieval over a document corpus: term statistics and BM25
top-k scoring — the keyword-search/retrieval side of a training-data
pipeline (query-based corpus inspection, boilerplate hunting, eval-leak
checks by keyword).

Scale shape: the term index is one explode + hash aggregation keyed by
(term, doc) — linear in corpus token count; document frequencies are a
term-keyed aggregate of that index; the query side is a literal `isin`
filter (predicate-pushdown-friendly) so scoring only ever touches postings
of the query terms, never the full index. Global scalars (N, avg doc
length) are a 1-row aggregate broadcast into the scoring plan. No
driver-side state beyond the query terms themselves.

Determinism: all counts are integers; the only transcendental is `ln` in
the BM25 idf. Both Spark (java.lang.Math.log) and the DuckDB oracle (ln)
are evaluated over the same small set of rational inputs, which the oracle
parity gate pins exactly — cross-engine agreement is verified empirically
by the `bm25_topk` driver query rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tdataframe_spark.core.partitioning import ensure_min_partitions
from tdataframe_spark.functions.text import words

BM25_K1 = 1.2
BM25_B = 0.75


def term_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Postings with term frequencies: (term, id, tf). Whitespace terms,
    lowercased."""
    df = ensure_min_partitions(df)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(words(F.lower(F.col(text_col)))).alias("term"),
        )
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def _bm25_score_topk(hits, lens, g, k1: float, b: float, k: int):
    """Shared BM25 scoring tail for the one-shot and indexed paths: the
    Robertson-Sparck Jones idf, the tf saturation with length
    normalization, the term-ORDERED per-doc fold (canonical double
    addition on any partitioning / any engine), and the tie-broken
    TakeOrdered. Both entry points MUST score through here so the
    indexed artifact can never drift from the one-shot scorer."""
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(lens, "id")
        .crossJoin(F.broadcast(g))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("len") / F.col("avglen"))
            ),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("term", "w"))).alias("__tw"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )
    score = F.aggregate(
        F.col("__tw"), F.lit(0.0), lambda acc, x: acc + x["w"]
    )
    return (
        per_doc.select("id", score.alias("score"), "n_terms_hit")
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query terms.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Robertson-Sparck Jones)
    score  = sum_t idf(t) * tf / (tf + k1 * (1 - b + b * len/avglen))

    Ties broken by ascending id for a total order. Returns
    (id, score, n_terms_hit).
    """
    idx = term_index(df, id_col, text_col)
    # lens feeds both the scoring join and the global scalars; hits feeds
    # both scoring and dfreq. Unpersisted, each re-runs its corpus pass
    # (the two postings subtrees differ by a pushed IsNotNull, so even
    # exchange reuse does not fire) — 4 corpus scans; persisted, 2.
    lens = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        F.size(words(F.col(text_col))).cast("long").alias("len"),
    )
    # global scalars: corpus size and average length (exact decimal mean)
    g = lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.col("len").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avglen"),
    )
    hits = idx.filter(
        F.col("term").isin([t.lower() for t in query_terms])
    ).persist()
    from tdataframe_spark.core.caching import tie_cache_lifetimes

    return tie_cache_lifetimes(
        _bm25_score_topk(hits, lens, g, k1, b, k), hits
    )


RRF_C = 60  # the standard reciprocal-rank-fusion constant (Cormack et al.)


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id,
    k: int = 10,
    n_candidates: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    rrf_c: int = RRF_C,
) -> DataFrame:
    """Hybrid lexical + dense retrieval fused with Reciprocal Rank Fusion:
    BM25 ranks documents for ``query_terms``, exact cosine ranks them
    against the embedding of ``query_vec_id`` (docs and vectors share ids),
    and each document's fused score is

        rrf = 1/(c + lex_rank) + 1/(c + dense_rank)

    summed over the lists it appears in (the standard RRF of Cormack,
    Clarke & Buettcher 2009 — rank-only fusion needs no score calibration
    between BM25's unbounded scale and cosine's [-1, 1]).

    Scale shape: each leg is its own top-``n_candidates`` retrieval (BM25 =
    postings-only scoring; dense = broadcast-query scan), so the fusion
    join touches at most 2·n_candidates rows — the single-partition rank
    windows here run AFTER each leg's top-k reduction, never on corpus-
    sized data. Determinism: ranks are integers, 1/(c+rank) is the same
    IEEE division on every engine, and the two-term sum has a fixed
    operand order; ties in the fused score break by ascending id.

    Returns (id, rrf_score, lex_rank, dense_rank) — ranks NULL for a
    document only one leg retrieved.
    """
    from tdataframe_spark.ops.similarity import cosine_topk

    lex = bm25_topk(
        docs, query_terms, k=n_candidates, id_col=id_col, text_col=text_col
    )
    # bm25_topk returns the ordered top-n slice; rank it explicitly (the
    # window sees only n_candidates rows — bounded by contract)
    wl = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    lex_ranked = lex.select(
        "id", F.row_number().over(wl).cast("long").alias("lex_rank")
    )
    dense = cosine_topk(
        embeddings.filter(F.col(vec_id_col) == F.lit(query_vec_id)),
        embeddings,
        vec_id_col,
        vec_col,
        k=n_candidates,
    ).select(
        F.col("neighbor_id").alias("id"),
        F.col("rnk").cast("long").alias("dense_rank"),
    )
    c = F.lit(float(rrf_c))
    fused = lex_ranked.join(dense, "id", "full_outer").select(
        "id",
        F.round(
            F.coalesce(F.lit(1.0) / (c + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (c + F.col("dense_rank")), F.lit(0.0)),
            9,
        ).alias("rrf_score"),
        "lex_rank",
        "dense_rank",
    )
    return fused.orderBy(F.col("rrf_score").desc(), F.col("id").asc()).limit(k)


def retrieval_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
    rank_col: str = "rnk",
) -> DataFrame:
    """Standard retrieval-quality metrics per query from a RANKED result
    table (any of the ANN/BM25 paths) and a (query, relevant id) truth
    set: recall@k, MRR@k, nDCG@k — the evaluation loop that tells you
    whether an index's speed/recall trade is acceptable before deploying
    it over the full corpus.

    Per query: recall = |relevant retrieved in top-k| / |relevant|;
    MRR = 1 / rank of the first relevant hit (0 if none); nDCG = DCG over
    relevant hits at 1/log2(rank+1) divided by the ideal DCG of
    min(|relevant|, k) hits. Queries with no relevant set rows are absent
    (nothing to measure).

    Scale + determinism: one join of the top-k rows (|queries|·k) against
    the truth set keyed by (query, neighbor), then one hash-agg per query;
    log2 terms are rounded to 9 dp and summed via an ORDERED fold over the
    rank-sorted hit list (the avg_logp/BM25 convention), so the metric
    doubles are bit-identical across engines and partitionings.
    """
    r = results.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(neighbor_col).alias("__n"),
        F.col(rank_col).alias("__r"),
    )
    t = truth.select(
        F.col(query_col).alias("__q"), F.col(neighbor_col).alias("__n")
    ).distinct()
    n_rel = t.groupBy("__q").agg(F.count(F.lit(1)).cast("long").alias("n_rel"))
    hits = r.join(t, ["__q", "__n"]).select("__q", "__r")
    per_q = hits.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.min("__r").alias("__first"),
        F.array_sort(F.collect_list("__r")).alias("__ranks"),
    )
    dcg = F.aggregate(
        F.transform(
            F.col("__ranks"),
            lambda rr: F.round(F.lit(1.0) / F.log2(rr + 1), 9),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    idcg = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.least(F.col("n_rel"), F.lit(k)).cast("int")),
            lambda i: F.round(F.lit(1.0) / F.log2(i + 1), 9),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        n_rel.join(per_q, "__q", "left")
        .select(
            F.col("__q").alias(query_col),
            "n_rel",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.col("n_rel"), 9
            ).alias("recall_at_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("__first"), F.lit(0.0)), 9
            ).alias("mrr_at_k"),
            F.round(
                F.coalesce(dcg, F.lit(0.0)) / idcg, 9
            ).alias("ndcg_at_k"),
        )
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase retrieval: (id, n_occurrences, first_pos) for every
    document containing the words of ``phrase`` consecutively — the
    positional-inverted-index query BM25's bag-of-words scoring cannot
    answer.

    Plan: one posexplode builds (id, pos, word) restricted by an `isin`
    filter to ONLY the phrase's words (predicate pushdown keeps the
    postings tiny), then the i-th word's positions equi-join the first
    word's at (id, pos + i) — n-1 shuffle-free-after-the-first joins on
    already-small postings. Linear in occurrences of the phrase words,
    never in corpus size; no full-text scan reaches the join.
    """
    terms = [w for w in phrase.split(" ") if w]
    if not terms:
        raise ValueError("empty phrase")
    from tdataframe_spark.functions.text import words

    postings = (
        ensure_min_partitions(docs)
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode(words(F.col(text_col))).alias("__pos", "__w"),
        )
        .filter(F.col("__w").isin(terms))
        # referenced once per phrase word: persist the (tiny, isin-
        # filtered) postings so the corpus posexplode runs once, not
        # n_terms times
        .persist()
    )
    starts = postings.filter(F.col("__w") == terms[0]).select("__id", "__pos")
    for i, w in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("__w") == w).select(
            "__id", (F.col("__pos") - i).alias("__pos")
        )
        starts = starts.join(nxt, ["__id", "__pos"])
    from tdataframe_spark.core.caching import tie_cache_lifetimes

    return tie_cache_lifetimes(
        starts.groupBy("__id").agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("__pos").cast("long").alias("first_pos"),
        ).select(F.col("__id").alias(id_col), "n_occurrences", "first_pos"),
        postings,
    )


def build_text_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int = 16,
) -> None:
    """Persist the lexical index once so queries never touch the corpus
    again — the BM25 twin of ``ivf_build``/``ivf_query``. Writes:

    - ``path/postings``: (term, id, tf), TERM-SORTED via range
      partitioning so per-file min/max footers prune a query's term
      lookups to the matching files (the layout machinery the snapshot
      sinks use);
    - ``path/lens``: (id, len) document lengths;
    - ``path/meta``: the 1-row corpus stats (n_docs, exact-decimal
      avglen) every query broadcasts.

    At 100 TB the postings table is the inverted index ANY search system
    carries; building it is one explode + hash aggregate over the corpus,
    and queries read only the term-pruned slice of it.
    """
    from tdataframe_spark.sources.layout import write_sorted

    idx = term_index(df, id_col, text_col)
    write_sorted(idx, f"{path}/postings", ["term"], n_files=n_files)
    lens = ensure_min_partitions(df).select(
        F.col(id_col).alias("id"),
        F.size(words(F.col(text_col))).cast("long").alias("len"),
    ).persist()
    lens.write.mode("overwrite").parquet(f"{path}/lens")
    lens.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.col("len").cast("decimal(25,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avglen"),
    ).write.mode("overwrite").parquet(f"{path}/meta")
    lens.unpersist()


def query_text_index(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-``k`` against a ``build_text_index`` artifact — identical
    scores to the one-shot ``bm25_topk`` on the indexed corpus (tested),
    but the corpus itself is never re-read: the postings scan carries an
    ``isin`` term filter that parquet pushes into the term-sorted files
    (file/row-group skipping), document lengths join by id, and the 1-row
    meta broadcasts."""
    terms = [t.lower() for t in query_terms]
    hits = spark.read.parquet(f"{path}/postings").filter(F.col("term").isin(terms))
    lens = spark.read.parquet(f"{path}/lens")
    g = spark.read.parquet(f"{path}/meta")
    return _bm25_score_topk(hits, lens, g, k1, b, k)
