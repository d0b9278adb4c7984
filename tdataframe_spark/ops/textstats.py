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
