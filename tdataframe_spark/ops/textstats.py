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
