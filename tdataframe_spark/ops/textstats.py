"""Document-level text statistics for corpus curation (quality filtering,
language ID, token accounting, fingerprinting) — SURVEY.md §2.2 north-star
extensions. One projection over the corpus, all JVM-side expressions."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tdataframe_spark.core.partitioning import ensure_min_partitions
from tdataframe_spark.functions.text import (
    fingerprint64,
    lang_guess,
    n_tokens,
    n_words,
    quality_score,
    words,
)


def doc_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document stats: (id, n_chars, n_words, n_tokens, quality,
    lang_guess, fingerprint)."""
    t = F.col(text_col)
    df = ensure_min_partitions(df)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_words(t).cast("long").alias("n_words"),
        n_tokens(t).cast("long").alias("n_tokens"),
        quality_score(t).alias("quality"),
        lang_guess(t).alias("lang_guess"),
        fingerprint64(t).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping word-window chunks — the
    long-context training prep that turns documents into model-sized
    pieces while keeping ``overlap`` words of continuity between
    neighbours.

    Chunk starts are 0, step, 2*step, … with step = chunk_size - overlap;
    the last chunk may be shorter. Fully JVM-side: one
    sequence→transform→posexplode per document, no shuffle at all (the
    operator is embarrassingly parallel over input partitions — at 100 TB
    it scales with the scan).

    Returns (id, chunk_id, chunk_text, n_words_chunk), chunk_id dense from
    0 in document order.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    step = chunk_size - overlap
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    starts = F.sequence(
        F.lit(0), F.greatest(n - overlap - 1, F.lit(0)), F.lit(step)
    )
    chunks = F.transform(
        starts, lambda s: F.array_join(F.slice(w, s + 1, chunk_size), " ")
    )
    return (
        ensure_min_partitions(df)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .select(
            id_col,
            F.col("chunk_id").cast("int"),
            "chunk_text",
            F.size(F.split(F.col("chunk_text"), " ")).cast("long").alias("n_words_chunk"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    shard_col: str | None = None,
    n_shards: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style training layout):
    within each shard, documents are laid end-to-end in id order and the
    token stream is cut into fixed ``budget``-token chunks; each document
    records the chunk it starts in, its offset there, and how many chunks
    it spans (1 = fits without straddling).

    Sharding bounds the window: a global ORDER BY would funnel the corpus
    through one task, so documents are hash-sharded (``n_shards``, or an
    explicit ``shard_col``) and packed per shard — each shard's window is
    an independent partition at cluster scale. One window pass, integer
    cumulative sums only (exact, deterministic, oracle-checkable).

    Returns (id, tokens, shard, chunk, offset_in_chunk, n_chunks_spanned).
    """
    from pyspark.sql import Window

    shard = (
        F.col(shard_col)
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    d = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).cast("long").alias("tokens"),
        shard.cast("long").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("id")
    cum_before = F.coalesce(
        F.sum("tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    d = d.withColumn("__start", cum_before)
    chunk = F.floor(F.col("__start") / budget).cast("long")
    end_chunk = F.floor(
        (F.col("__start") + F.greatest(F.col("tokens"), F.lit(1)) - 1) / budget
    ).cast("long")
    return d.select(
        "id",
        "tokens",
        "shard",
        chunk.alias("chunk"),
        F.pmod(F.col("__start"), F.lit(budget)).cast("long").alias("offset_in_chunk"),
        (end_chunk - chunk + 1).cast("long").alias("n_chunks_spanned"),
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``n_words``         whitespace word count
    - ``dup_word_frac``   1 - |distinct words| / |words| (0 = no repeats)
    - ``top_gram_frac``   count of the most frequent word ``n``-gram /
                          total n-gram count (0 when the doc is shorter
                          than ``n`` words)

    High values of either fraction are the classic boilerplate/spam
    markers used by corpus-quality filters. Word-level fractions are pure
    JVM array expressions (no shuffle); the n-gram mode needs the
    per-(doc, gram) frequency table, one explode + two hash aggregations
    keyed by doc — linear in corpus token count, no all-pairs anywhere.
    All ratios are integer-derived doubles (cross-engine exact).
    """
    from tdataframe_spark.functions.text import word_ngrams, words

    df = ensure_min_partitions(df)
    w = words(text_col)
    base = df.select(
        F.col(id_col),
        F.size(w).cast("long").alias("n_words"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(w)).cast("double")
            / F.greatest(F.size(w), F.lit(1)).cast("double")
        ).alias("dup_word_frac"),
    )
    grams = df.select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("__g")
    )
    per_gram = grams.groupBy(id_col, "__g").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_doc = per_gram.groupBy(id_col).agg(
        F.max("__c").alias("__m"), F.sum("__c").alias("__tot")
    )
    return base.join(per_doc, id_col, "left").select(
        F.col(id_col),
        "n_words",
        "dup_word_frac",
        F.coalesce(
            F.col("__m").cast("double") / F.col("__tot").cast("double"),
            F.lit(0.0),
        ).alias("top_gram_frac"),
    )


def mix_domains(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, int],
    id_col: str,
) -> DataFrame:
    """Deterministic domain-mixture sampling: downsample each listed domain
    so the output matches the integer weight ratios exactly at the largest
    achievable size. With ``t = min_d floor(n_d / w_d)`` every domain ``d``
    keeps exactly ``w_d * t`` rows — integer math only, so any engine picks
    the identical sample. Rows are chosen by portable-hash order within the
    domain (decorrelated from ingestion order); unlisted domains drop out.

    Scale shape: the per-domain counts are a tiny aggregate broadcast back;
    the only big operation is one window rank per domain. For domains so
    large that a single ordered partition is a bottleneck, switch to
    threshold-hash sampling (rate = w_d*t/n_d) — approximate counts, no
    ordering; this operator favors exactness.
    """
    from pyspark.sql import Window

    from tdataframe_spark.functions.numeric import portable_hash64

    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    d = df.filter(F.col(domain_col).isin(list(weights)))
    counts = d.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    # weight lookup via the SAME literal map as the filter below — never
    # by interpolating domain VALUES into SQL text (quotes would break it)
    t = counts.withColumn("__w", wmap[F.col(domain_col)]).select(
        F.min(F.expr("__n div __w")).alias("__t")
    )
    h = portable_hash64(F.col(id_col).cast("string"))
    w = Window.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .crossJoin(F.broadcast(t))
        .filter(F.col("__rn") <= wmap[F.col(domain_col)] * F.col("__t"))
        .select(F.col(id_col), F.col(domain_col))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    id_col: str,
) -> DataFrame:
    """Deterministic stratified sampling: within each stratum, keep the
    first ``ceil(fraction * stratum_size)`` rows ordered by a stable hash
    of the id — every stratum is represented at the same rate regardless of
    skew (a plain Bernoulli sample under- or over-shoots small strata).

    Hash-ordering (not id-ordering) decorrelates the sample from ingestion
    order. One window pass; the order key is the portable md5-derived hash
    (not Spark-private xxhash64), so the selected rows are identical in any
    engine — the property the oracle check rides on.
    """
    from pyspark.sql import Window

    from tdataframe_spark.functions.numeric import portable_hash64

    h = portable_hash64(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(h.asc(), F.col(id_col).asc())
    n = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(n))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn", "__n")
    )


def _bigram_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(__id, pos, w1, w2) rows — every adjacent word pair with its
    1-based position (the canonical fold-order key). Docs with < 2 words
    yield nothing (guarded: Spark's sequence() DESCENDS for n < 2)."""
    from tdataframe_spark.functions.text import words

    w = words(F.col(text_col))
    return (
        ensure_min_partitions(df)
        .filter(F.size(w) >= 2)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.element_at(w, i).alias("w1"),
                        F.element_at(w, i + 1).alias("w2"),
                    ),
                )
            ).alias("__b"),
        )
        .select("__id", "__b.pos", "__b.w1", "__b.w2")
    )


def _fold_logprobs(scored: DataFrame, id_col: str) -> DataFrame:
    """(id, n_bigrams, avg_logp) from (__id, pos, __lp) rows via the
    canonical ordered fold."""
    per_doc = scored.groupBy("__id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "__lp"))).alias("__lps")
    )
    total = F.aggregate(
        F.col("__lps"), F.lit(0.0), lambda acc, x: acc + x["__lp"]
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        F.size("__lps").cast("long").alias("n_bigrams"),
        (total / F.size("__lps")).alias("avg_logp"),
    )


def train_bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    alpha: float = 1.0,
) -> None:
    """Persist a Laplace bigram LM: ``path/c12`` (w1, w2, c12), ``path/c1``
    (w1, c1), ``path/meta`` (v = vocab size, alpha). Train once on the
    reference corpus (the CCNet shape: a fixed high-quality LM scores all
    incoming data), score forever with :func:`lm_score_with` — including
    on streams."""
    from tdataframe_spark.functions.text import words

    bg = _bigram_table(df, id_col, text_col)
    # c1 is the exact marginal of c12: derive it from the aggregated
    # (small) table rather than re-exploding the corpus a second time.
    c12 = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    ).persist()
    try:
        c12.write.mode("overwrite").parquet(f"{path}/c12")
        c12.groupBy("w1").agg(
            F.sum("c12").cast("long").alias("c1")
        ).write.mode("overwrite").parquet(f"{path}/c1")
    finally:
        c12.unpersist()
    (
        df.select(F.explode(words(F.col(text_col))).alias("__w"))
        .agg(
            F.countDistinct("__w").cast("long").alias("v"),
            F.lit(alpha).alias("alpha"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/meta")
    )


def lm_score_with(
    docs: DataFrame, path: str, id_col: str, text_col: str
) -> DataFrame:
    """Score documents against a :func:`train_bigram_lm` model WITHOUT
    touching the training corpus: two left joins against the persisted
    count tables + one broadcast meta row. Bigrams unseen in training get
    the Laplace floor (c12→0; unseen context w1 → c1→0), so out-of-domain
    text scores low instead of erroring — the property that makes this a
    quality FILTER. Stateless projections + static joins: ``docs`` may be
    a streaming DataFrame.

    Self-consistency law (tested): scoring the training corpus itself
    reproduces :func:`ngram_lm_score` exactly.
    """
    spark = docs.sparkSession
    bg = _bigram_table(docs, id_col, text_col)
    c12 = spark.read.parquet(f"{path}/c12")
    c1 = spark.read.parquet(f"{path}/c1")
    meta = spark.read.parquet(f"{path}/meta")
    lp = F.round(
        F.log(
            (F.coalesce("c12", F.lit(0)) + F.col("alpha"))
            / (F.coalesce("c1", F.lit(0)) + F.col("alpha") * F.col("v"))
        ),
        9,
    )
    scored = (
        bg.join(c12, ["w1", "w2"], "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(meta))
        .select("__id", "pos", lp.alias("__lp"))
    )
    return _fold_logprobs(scored, id_col)


def ngram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Bigram language-model quality score (the CCNet/Gopher-style filter):
    train Laplace-smoothed bigram probabilities on the corpus itself, then
    score every document by its mean bigram log-probability —
    low-probability (junk / boilerplate-shuffled / wrong-language) text
    scores far below fluent text. Returns (id, n_bigrams, avg_logp); docs
    with < 2 words have no bigrams and are absent. For the
    train-once / score-anything (incl. streams) split, see
    :func:`train_bigram_lm` / :func:`lm_score_with`.

    Shapes: counting is two hash aggregates over the exploded bigram
    stream (map-side combined); the vocab size is a 1-row broadcast;
    scoring joins each doc bigram to the count tables on the bigram key —
    count tables are aggregated (distinct bigrams), so the join never
    amplifies. Determinism: ln rounded to 9 dp (libm implementations
    disagree by an ulp on a subset of inputs) plus an ordered per-doc
    fold (the BM25 convention).
    """
    from tdataframe_spark.functions.text import words

    # bg feeds both the count build and the scoring probe: persist it so
    # the corpus is scanned+exploded once, not three times. c1 is the
    # exact integer marginal of c12 (sum over w2), so it aggregates the
    # small distinct-bigram table instead of re-walking the bigram stream.
    bg = _bigram_table(df, id_col, text_col).persist()
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12")).persist()
    c1 = c12.groupBy("w1").agg(F.sum("__c12").alias("__c1"))
    vocab = (
        df.select(F.explode(words(F.col(text_col))).alias("__w"))
        .agg(F.countDistinct("__w").alias("__v"))
    )
    lp = F.round(
        F.log(
            (F.col("__c12") + F.lit(alpha))
            / (F.col("__c1") + F.lit(alpha) * F.col("__v"))
        ),
        9,
    )
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("__id", "pos", lp.alias("__lp"))
    )
    from tdataframe_spark.core.caching import tie_cache_lifetimes

    return tie_cache_lifetimes(_fold_logprobs(scored, id_col), bg, c12)


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = "lang",
    n_buckets: int = 3,
    method: str = "ntile",
) -> DataFrame:
    """CCNet-style perplexity bucketing: score every document with the
    bigram LM (:func:`ngram_lm_score`), then split each ``group_col``
    stratum (typically language) into ``n_buckets`` equal-size quality
    tiers — bucket 1 = head (highest avg log-prob / lowest perplexity),
    ``n_buckets`` = tail. Downstream mixers sample per (group, bucket),
    the CCNet recipe for trading data quality against volume.

    ``method="ntile"`` (default, exact): one window shuffle per group with
    an in-partition sort; ties broken by id so the assignment is a total
    order, identical across engines. At 100 TB a single dominant language
    makes that group's partition the bottleneck — ``method="approx"``
    assigns buckets by comparing against per-group ``percentile_approx``
    cut points instead (two hash aggregates + a broadcast join, no sort,
    no hot partition; boundaries approximate, assignment stable).

    Returns (id, group, n_bigrams, avg_logp, bucket).
    """
    from pyspark.sql import Window

    scored = ngram_lm_score(df, id_col, text_col)
    if group_col is None:
        joined = scored.withColumn("__g", F.lit("all"))
        gname = "group"
    else:
        joined = scored.join(
            df.select(id_col, F.col(group_col).alias("__g")), id_col
        )
        gname = group_col
    if method == "ntile":
        w = Window.partitionBy("__g").orderBy(
            F.col("avg_logp").desc(), F.col(id_col).asc()
        )
        out = joined.withColumn("bucket", F.ntile(n_buckets).over(w))
    elif method == "approx":
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = joined.groupBy("__g").agg(
            F.percentile_approx("avg_logp", qs).alias("__cuts")
        )
        # cuts ascend; head = highest score = bucket 1, so bucket is
        # 1 + (number of cut points the score is strictly below)
        n_below = F.aggregate(
            F.col("__cuts"),
            F.lit(0),
            lambda acc, c: acc
            + F.when(F.col("avg_logp") < c, F.lit(1)).otherwise(F.lit(0)),
        )
        out = joined.join(F.broadcast(cuts), "__g").withColumn(
            "bucket", F.lit(1) + n_below
        ).drop("__cuts")
    else:  # pragma: no cover - guarded
        raise ValueError(f"unknown method {method!r}")
    return out.select(
        id_col,
        F.col("__g").alias(gname),
        "n_bigrams",
        "avg_logp",
        F.col("bucket").cast("int").alias("bucket"),
    )


def group_split(
    df: DataFrame,
    group_col: str,
    eval_fraction: float = 0.1,
    buckets: int = 1000,
) -> DataFrame:
    """Leakage-free train/eval split: EVERY row of a group lands on the
    same side, decided by a portable hash of the group key — near-dup or
    same-source rows (same domain, same base document, same user) can
    never straddle the boundary, the property a random row split silently
    violates. Adds ``split`` = 'train' | 'eval'.

    Map-side only (a projection — no shuffle, no state); the assignment
    is a pure function of the key, so it is stable across runs, engines,
    and data arrivals — new rows of a known group inherit its side,
    which is what makes the split safe to apply incrementally/on streams.
    ``eval_fraction`` resolves to round(buckets·fraction) hash buckets —
    round, not int(): float representation error truncates some exact
    fractions a bucket low (0.29 · 1000 → 289.99999999999994 → 289).
    """
    from tdataframe_spark.functions.numeric import portable_hash64

    cut = _eval_bucket_cut(buckets, eval_fraction)
    b = F.pmod(portable_hash64(F.col(group_col).cast("string")), F.lit(buckets))
    return df.withColumn(
        "split", F.when(b < cut, F.lit("eval")).otherwise(F.lit("train"))
    )


def shard_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int | None = None,
    seed: int = 0,
    target_shard_rows: int = 1_000_000,
) -> DataFrame:
    """Deterministic GLOBAL SHUFFLE into training shards — the layout
    step before writing a corpus for data-parallel training: every row
    gets a ``shard`` (which output file / data-loader worker reads it)
    and a ``pos`` (its position within the shard), both pure functions
    of (seed, id). The same corpus + seed yields the SAME permutation on
    any engine, any partitioning, any run — reshuffling for a new epoch
    is just a new seed, and late-arriving rows slot in without
    perturbing other shards' relative order.

    Shape: one portable hash per row (map-side), one shuffle on the
    shard key, and a PER-SHARD (never global) rank window; shard
    populations are hash-balanced n/n_shards, so the window state stays
    bounded ONLY when ``n_shards`` scales with the corpus. That dial is
    therefore enforced, not just documented: leave ``n_shards=None``
    and it is derived as ``ceil(rows / target_shard_rows)`` from one
    cheap count (the semdedup ``target_cluster_size`` pattern); an
    EXPLICIT ``n_shards`` is validated against the same count and
    raises when a shard would exceed 4×``target_shard_rows`` — at 100×
    the data a forgotten constant becomes one n/n_shards-row sort task,
    and that must fail loudly, not spill quietly. Pass
    ``target_shard_rows=None`` with an explicit ``n_shards`` to skip
    the count entirely (caller-audited sizing; no extra pass). Ties
    (hash collisions) break on the id, so ``pos`` is total and
    deterministic.
    """
    from tdataframe_spark.functions.numeric import portable_hash64

    from pyspark.sql import Window

    if n_shards is None:
        if target_shard_rows is None:
            raise ValueError(
                "n_shards=None needs target_shard_rows to derive from"
            )
        n = df.count()
        n_shards = max(1, -(-n // target_shard_rows))
    elif n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    elif target_shard_rows is not None:
        per_shard = -(-df.count() // n_shards)
        if per_shard > 4 * target_shard_rows:
            raise ValueError(
                f"n_shards={n_shards} puts ~{per_shard} rows in each "
                f"shard (> 4 x target_shard_rows={target_shard_rows}); "
                "the per-shard rank window would become one giant sort "
                "task — raise n_shards (or n_shards=None to derive it), "
                "raise target_shard_rows, or pass target_shard_rows=None "
                "to accept caller-audited sizing"
            )
    h = portable_hash64(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy(F.col("__h"), F.col(id_col))
    return (
        df.withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("__h")
    )


def _eval_bucket_cut(buckets: int, eval_fraction: float) -> int:
    """Hash buckets assigned to the eval side (see group_split's round-vs-
    int note; separated so the arithmetic is directly testable)."""
    return round(buckets * eval_fraction)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    rate: float,
    id_col: str,
) -> DataFrame:
    """Deterministic weighted (Poisson) sampling: row ``i`` is kept iff
    hash(id) < p_i · 2⁶⁰ with inclusion probability p_i = min(rate · wᵢ, 1)
    — higher-quality rows are proportionally likelier to survive, the
    CCNet/DataComp quality-weighted downsampling shape. Pure map-side
    projection: no shuffle, no RNG state; the same row always gets the
    same verdict (stable across runs, engines, and incremental arrivals —
    the property Bernoulli `sample()` lacks).
    """
    from tdataframe_spark.functions.numeric import portable_hash64

    h = portable_hash64(F.col(id_col).cast("string"))
    p = F.least(F.col(weight_col).cast("double") * F.lit(rate), F.lit(1.0))
    return df.filter(h < F.floor(p * F.lit(float(1 << 60))).cast("long"))


def collocations(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Collocation mining by pointwise mutual information: word pairs that
    co-occur adjacently far more than their unigram frequencies predict —
    the standard detector for multiword expressions ("new york", "machine
    learning") worth treating as single tokens before training.

    PMI = ln( p(w1,w2) / (p(w1)·p(w2)) ) computed over the corpus bigram
    table; pairs below ``min_count`` occurrences are dropped first (PMI is
    noise-dominated at low counts). Returns the ``top_k`` pairs by PMI
    (ties → lexicographic) with their counts.

    Shapes: the bigram/unigram counts are two hash aggregates over one
    exploded pass (the LM-scoring tables); totals broadcast as a 1-row
    join; ln rounded to 9 dp (the cross-libm convention).
    """
    bg = _bigram_table(df, id_col, text_col)
    # one exploded pass: the unigram-slot counts and the totals are exact
    # integer marginals of the distinct-pair table, so every other figure
    # aggregates c12_all instead of re-walking the corpus (was 4 passes).
    c12_all = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    ).persist()
    c12 = c12_all.filter(F.col("n_pair") >= min_count)
    # unigram occurrences counted over bigram slots (left+right) so the
    # probabilities share one denominator with the pair counts
    c1 = (
        c12_all.select(
            F.explode(F.array(F.col("w1"), F.col("w2"))).alias("w"), "n_pair"
        )
        .groupBy("w")
        .agg(F.sum("n_pair").cast("long").alias("n_w"))
    )
    tot = c12_all.agg(
        (2 * F.sum("n_pair")).cast("long").alias("n_tot_u"),
        F.sum("n_pair").cast("long").alias("n_tot_b"),
    )
    scored = (
        c12.join(c1.withColumnsRenamed({"w": "w1", "n_w": "n_w1"}), "w1")
        .join(c1.withColumnsRenamed({"w": "w2", "n_w": "n_w2"}), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("n_tot_b"))
                    / (
                        (F.col("n_w1") / F.col("n_tot_u"))
                        * (F.col("n_w2") / F.col("n_tot_u"))
                    )
                ),
                9,
            ).alias("pmi"),
        )
    )
    from tdataframe_spark.core.caching import tie_cache_lifetimes

    return tie_cache_lifetimes(
        scored.orderBy(
            F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
        ).limit(top_k),
        c12_all,
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weighting — Xie et al., "Data Selection for
# Language Models via Importance Resampling" (arXiv 2302.03169): hashed
# n-gram bag-of-words distributions for a target and a raw corpus, and a
# per-document log importance weight log p_target(doc) − log p_raw(doc).


def _hashed_grams(df: DataFrame, id_col: str, text_col: str, n_buckets: int):
    """One row per unigram AND bigram occurrence, hashed into
    ``n_buckets`` feature buckets with the portable 60-bit hash (so the
    bucketing is reproducible in any engine). Documents with NULL text or
    fewer than one word contribute nothing."""
    from tdataframe_spark.functions.numeric import portable_hash64

    ws = words(text_col)
    n = F.size(F.col("__ws"))
    uni = F.col("__ws")
    bi = F.when(
        n >= 2,
        F.transform(
            F.slice(F.col("__ws"), 1, n - 1),
            lambda w, i: F.concat_ws(" ", w, F.element_at(F.col("__ws"), i + 2)),
        ),
    ).otherwise(F.array())
    return (
        ensure_min_partitions(df.filter(F.col(text_col).isNotNull()))
        .select(F.col(id_col).alias("__id"), ws.alias("__ws"))
        .select("__id", F.explode(F.concat(uni, bi)).alias("__g"))
        .select(
            "__id",
            F.pmod(portable_hash64(F.col("__g")), F.lit(n_buckets)).alias("__b"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight over hashed unigram+bigram
    features: ``log_weight = Σ_g [ln p_target(bucket(g)) − ln p_raw(bucket(g))]``
    with Laplace smoothing ``alpha`` — the arXiv 2302.03169 estimator with
    bag-of-hashed-ngrams distributions. Downstream selection keeps the
    top-weighted (or Gumbel-resamples); this op emits the weights.

    100 TB shape: one explode pass per corpus; both distributions are
    ≤ ``n_buckets`` aggregate rows BROADCAST back into a map-side join
    (never a shuffle of the corpus on bucket); the per-doc reduce is one
    hash aggregate on doc id. Log-ratios are rounded to 9 dp at the
    bucket level and the per-doc sum runs in decimal, so weights are
    partitioning-invariant and engine-reproducible.

    Returns one row per RAW input document (NULL-text docs ride with zero
    grams and weight 0.0): (id, n_grams, log_weight).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (Laplace smoothing)")
    from tdataframe_spark.functions.numeric import dsum

    tg = _hashed_grams(target, id_col, text_col, n_buckets)
    rg = _hashed_grams(raw, id_col, text_col, n_buckets)
    # one exploded pass per corpus: the raw side aggregates straight to
    # per-doc bucket counts (which per_doc needs anyway), and every other
    # figure is an exact integer marginal of an already-aggregated table
    # (bucket counts <= n_buckets rows, totals 1 row) — was 5 passes.
    rg_doc = rg.groupBy("__id", "__b").agg(
        F.count(F.lit(1)).alias("__n")
    ).persist()
    t_counts = tg.groupBy("__b").agg(F.count(F.lit(1)).alias("__ct")).persist()
    r_counts = rg_doc.groupBy("__b").agg(F.sum("__n").alias("__cr"))
    # coalesce: SUM over an empty table is NULL where COUNT was 0
    t_tot = t_counts.agg(
        F.coalesce(F.sum("__ct"), F.lit(0).cast("long")).alias("__tt")
    )
    r_tot = rg_doc.agg(
        F.coalesce(F.sum("__n"), F.lit(0).cast("long")).alias("__tr")
    )
    # dense bucket table: missing buckets still carry the smoothed mass
    lr = (
        raw.sparkSession.range(n_buckets)
        .select(F.col("id").cast("long").alias("__b"))
        .join(t_counts, "__b", "left")
        .join(r_counts, "__b", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "__b",
            F.round(
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(alpha))
                    / (F.col("__tt") + F.lit(alpha) * F.lit(n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(alpha))
                    / (F.col("__tr") + F.lit(alpha) * F.lit(n_buckets))
                ),
                9,
            ).alias("__lr"),
        )
    )
    per_doc = (
        rg_doc
        .join(F.broadcast(lr), "__b")
        .groupBy("__id")
        .agg(
            F.sum("__n").cast("long").alias("n_grams"),
            dsum(F.col("__n") * F.col("__lr")).alias("log_weight"),
        )
    )
    from tdataframe_spark.core.caching import tie_cache_lifetimes

    return tie_cache_lifetimes(
        raw.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight"),
        ),
        rg_doc,
        t_counts,
    )


def dsir_sample(
    weights: DataFrame,
    id_col: str,
    n: int,
    temperature: float = 1.0,
    seed: str = "dsir",
    weight_col: str = "log_weight",
) -> DataFrame:
    """Importance resampling without replacement via the Gumbel top-k
    trick (the selection step of arXiv 2302.03169): each doc gets key =
    log_weight / temperature + Gumbel noise, and the global top ``n``
    keys ARE a without-replacement sample ∝ softmax(log_weight / T).

    The noise is derived, not drawn: u = (h + 1) / (2^60 + 1) with
    h = portable_hash64(id ‖ seed), g = −ln(−ln u) rounded to 9 dp — so
    the "sample" is a pure function of (corpus, seed) that any engine
    reproduces bit-for-bit, re-runs are stable, and no RNG state rides
    the cluster. Selection is one TakeOrdered pass (no global sort
    materialization); ties break on id.

    Returns (id, log_weight, sample_key) — the ``n`` selected docs.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    from tdataframe_spark.functions.numeric import portable_hash64

    u = (portable_hash64(F.concat(F.col(id_col).cast("string"), F.lit(seed))) + 1) / F.lit(
        float(2**60 + 1)
    )
    g = F.round(-F.log(-F.log(u)), 9)
    key = F.round(F.col(weight_col) / F.lit(float(temperature)) + g, 9)
    return (
        weights.select(F.col(id_col), F.col(weight_col), key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col(id_col).asc())
        .limit(n)
    )


def pack_bins(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """No-straddle sequence packing: first-fit-decreasing bin packing of
    whole documents into ``budget``-token bins — the layout used when
    examples must stay contiguous (SFT, preference pairs) and
    concat-and-chunk (``pack_sequences``) would split them.

    FFD is inherently sequential, so documents are hash-sharded and
    packed per shard with one Arrow ``applyInPandas`` pass over METADATA
    ROWS ONLY (id + token count — document text never enters the
    packer). Each task's state is its shard's open-bin table; bins are
    (shard, bin) pairs, globally unique without coordination. Ordering
    inside a shard is (tokens desc, id asc), so the packing is a pure
    function of the corpus — repartitioning cannot change a bin
    assignment. A document longer than ``budget`` gets a dedicated bin
    flagged ``overflow`` (the caller decides whether to chunk it first).

    Returns (id, tokens, shard, bin, overflow).
    """
    import pandas as pd

    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    # NULL token counts (NULL-text docs) pack as zero-width rows instead
    # of reaching the packer as NaN (int(NaN) kills the Python worker)
    d = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).cast("long").alias("shard"),
    )

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["tokens", "id"], ascending=[False, True], ignore_index=True
        )
        bins: list[int] = []  # remaining capacity per open bin
        out_bin, out_over = [], []
        for t in pdf["tokens"]:
            t = int(t)
            if t > budget:
                bins.append(-1)  # dedicated, never reused
                out_bin.append(len(bins) - 1)
                out_over.append(True)
                continue
            # first OPEN bin with room, in creation order (first-fit)
            for i, rem in enumerate(bins):
                if rem >= t:
                    bins[i] = rem - t
                    out_bin.append(i)
                    break
            else:
                bins.append(budget - t)
                out_bin.append(len(bins) - 1)
            out_over.append(False)
        pdf["bin"] = pd.Series(out_bin, dtype="int64")
        pdf["overflow"] = pd.Series(out_over, dtype="bool")
        return pdf

    # schema mirrors the input id dtype (string ids pack the same way)
    id_type = d.schema["id"].dataType.simpleString()
    return d.groupBy("shard").applyInPandas(
        _ffd, f"id {id_type}, tokens long, shard long, bin long, overflow boolean"
    )


def corpus_divergence(
    df: DataFrame,
    group_col: str,
    text_col: str,
    n_buckets: int = 4096,
) -> DataFrame:
    """Per-group distribution drift: Jensen–Shannon divergence between
    each group's hashed-unigram distribution and the whole corpus's —
    the standard monitor for "which source/day/shard stopped looking
    like the corpus" in curation pipelines. JS is symmetric and bounded
    by ln 2, so groups are directly comparable.

    100 TB shape: one explode pass; per-(group, bucket) and per-bucket
    counts are two hash aggregates bounded by groups × ``n_buckets``
    rows; the divergence itself folds ≤ ``n_buckets`` terms per group in
    bucket order (deterministic ordered fold — cross-engine identical,
    per the repo's transcendental conventions: ln rounded to 9 dp).

    Returns (group, n_tokens, js_div) with js_div rounded to 9 dp.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from tdataframe_spark.functions.numeric import portable_hash64

    g = (
        ensure_min_partitions(df.filter(F.col(text_col).isNotNull()))
        .select(
            F.col(group_col).alias("__g"),
            F.explode(words(text_col)).alias("__w"),
        )
        .select("__g", F.pmod(portable_hash64(F.col("__w")), F.lit(n_buckets)).alias("__b"))
    )
    # one exploded pass: the per-group, per-bucket and corpus totals are
    # exact integer marginals of the (groups × buckets)-bounded gb table
    # — deriving them there replaces three more corpus explodes
    gb = g.groupBy("__g", "__b").agg(F.count(F.lit(1)).alias("__c")).persist()
    gt = gb.groupBy("__g").agg(F.sum("__c").alias("__n"))
    cb = gb.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    ct = gb.agg(F.coalesce(F.sum("__c"), F.lit(0).cast("long")).alias("__ctot"))
    # grid: every group × every OCCUPIED bucket (q > 0 everywhere on it;
    # buckets empty corpus-wide contribute 0 to every group's JS)
    grid = (
        gt.crossJoin(F.broadcast(cb))
        .join(gb, ["__g", "__b"], "left")
        .crossJoin(F.broadcast(ct))
        .select(
            "__g",
            "__b",
            "__n",
            (F.coalesce(F.col("__c"), F.lit(0)) / F.col("__n")).alias("__p"),
            (F.col("__cb") / F.col("__ctot")).alias("__q"),
        )
    )
    m = (F.col("__p") + F.col("__q")) / 2
    term = (
        F.when(
            F.col("__p") > 0, F.col("__p") * F.round(F.log(F.col("__p") / m), 9)
        ).otherwise(F.lit(0.0))
        + F.col("__q") * F.round(F.log(F.col("__q") / m), 9)
    ) / 2
    per_bucket = grid.select("__g", "__n", "__b", term.alias("__t"))
    folded = (
        per_bucket.groupBy("__g", "__n")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__b", "__t"))),
                    lambda s: s["__t"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__js")
        )
    )
    from tdataframe_spark.core.caching import tie_cache_lifetimes

    return tie_cache_lifetimes(
        folded.select(
            F.col("__g").alias(group_col),
            F.col("__n").cast("long").alias("n_tokens"),
            F.round(F.col("__js"), 9).alias("js_div"),
        ),
        gb,
    )
