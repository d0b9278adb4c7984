"""Distributed byte-pair-encoding (BPE) tokenizer training + application.

The classic Sennrich word-frequency formulation: BPE merges are learned
from the (word, frequency) table, not the raw corpus — ONE corpus-sized
shuffle builds that table, and every Lloyd-style merge iteration after it
runs over vocab-sized data (bounded by distinct words, not corpus rows).
Driver state per iteration is a single (pair, count) row: the argmax.

Scale notes (100 TB):
- the word-frequency aggregate is the only corpus-sized job (map-side
  combined hash agg);
- each of the ``n_merges`` iterations re-pairs and re-aggregates the
  persisted vocab table (persist + unpersist + localCheckpoint every few
  rounds — the connected-components loop discipline, constant plan depth);
- tokenization joins documents' words against the learned segmentation
  table (vocab-sized, usually broadcastable); out-of-vocabulary words
  fall back to character splits — the standard subword contract.

All merge application is JVM-side: adjacent-pair replacement is an
ordered ``aggregate`` fold over the symbol array; no Python in any loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tdataframe_spark.functions.text import words

END_OF_WORD = "▁"  # marks word end so merges can't cross words


def _merge_pair(col, a: str, b: str):
    """Column rebuilding ``col`` (array<string>) with every adjacent
    (a, b) replaced by their concatenation — a left fold that either
    glues x onto a pending ``a`` or appends. Greedy left-to-right,
    matching the reference BPE algorithm. Built with the HOF API and
    ``F.lit`` symbols (no SQL-string interpolation — symbols may contain
    quotes, backslashes, or any other text)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        col,
        F.expr("cast(array() as array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _word_freq_symbols(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms): distinct corpus words with counts, split into
    character symbols with the end-of-word marker appended."""
    w = (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return w.withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),
            F.array(F.lit(END_OF_WORD)),
        ),
    )


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    checkpoint_every: int = 10,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list [(a, b), ...] — apply with :func:`bpe_tokenize`.

    Ties in pair frequency break lexicographically (deterministic across
    partitionings and engines)."""
    vocab = _word_freq_symbols(df, text_col).persist()
    merges: list[tuple[str, str]] = []
    try:
        for i in range(n_merges):
            pairs = (
                vocab.select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1),"
                            " (s, j) -> struct(s as a,"
                            " element_at(syms, j + 2) as b))"
                        )
                    ).alias("p"),
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if not pairs or pairs[0]["n"] < 2:
                break
            a, b = pairs[0]["a"], pairs[0]["b"]
            merges.append((a, b))
            nxt = vocab.withColumn("syms", _merge_pair("syms", a, b))
            # localCheckpoint both stores the data AND truncates lineage;
            # persist alone suffices between truncation rounds
            if (i + 1) % checkpoint_every == 0:
                nxt = nxt.localCheckpoint()
            else:
                nxt = nxt.persist()
                nxt.count()
            vocab.unpersist()
            vocab = nxt
    finally:
        vocab.unpersist()
    return merges


def bpe_segment_table(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """(word, syms): the learned segmentation of every corpus word —
    the artifact a deployment persists next to the merge list. Built by
    replaying the merge rules over the vocab table (vocab-sized work)."""
    vocab = _word_freq_symbols(df, text_col).select("word", "syms")
    for i, (a, b) in enumerate(merges):
        vocab = vocab.withColumn("syms", _merge_pair("syms", a, b))
        # dozens of chained folds nest the expression tree past codegen
        # limits — truncate lineage every few merges, not every merge
        if (i + 1) % 8 == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return vocab


def build_bpe_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    n_merges: int = 50,
) -> list[tuple[str, str]]:
    """Train-once BPE: learn the merges, then persist the deployment
    artifacts — ``path/merges`` (ordered rule table: rank, a, b) and
    ``path/segments`` (the replayed word→syms segmentation) — so
    tokenization of new batches (:func:`bpe_tokenize_indexed`) is ONE
    broadcast join with zero training work, the same amortized contract
    as ``pq_build``/``semdedup_build``. Merge ORDER is semantics (rules
    apply in learned sequence), so it rides the index as an explicit
    rank column rather than file order. Returns the merge list."""
    merges = train_bpe(df, text_col, n_merges)
    spark = df.sparkSession
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    ).write.mode("overwrite").parquet(f"{path}/merges")
    bpe_segment_table(df, merges, text_col).write.mode("overwrite").parquet(
        f"{path}/segments"
    )
    return merges


def load_bpe_merges(spark, path: str) -> list[tuple[str, str]]:
    """The ordered merge list back from a persisted index (rank order —
    needed to segment genuinely NEW words exactly as training would)."""
    rows = spark.read.parquet(f"{path}/merges").orderBy("rank").collect()
    return [(r["a"], r["b"]) for r in rows]


def bpe_tokenize_indexed(
    docs: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize against a persisted :func:`build_bpe_index`: the
    segmentation table loads from parquet and the corpus is never
    retrained or re-aggregated — the scoring path of a deployed
    tokenizer. Out-of-vocabulary words fall back to character symbols
    (same contract as :func:`bpe_tokenize`; replay the persisted merges
    with ``load_bpe_merges`` + ``bpe_segment_table`` over the new batch
    first if exact-subword OOV handling matters more than one join)."""
    spark = docs.sparkSession
    segments = spark.read.parquet(f"{index_path}/segments")
    return bpe_tokenize(docs, segments, id_col, text_col)


def bpe_tokenize(
    docs: DataFrame,
    segments: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_segments: bool = True,
) -> DataFrame:
    """(id, tokens array<string>, n_tokens): tokenize documents by joining
    their words against the learned segmentation table; words not in the
    table (out-of-vocabulary) fall back to character symbols. Every input
    doc appears in the output — empty/whitespace-only text yields empty
    tokens with n_tokens 0 (no silent row loss). Stateless projections +
    one join — ``docs`` may be a streaming DataFrame when the segment
    table is static."""
    seg = segments.select("word", F.col("syms").alias("__seg"))
    if broadcast_segments:
        seg = F.broadcast(seg)
    exploded = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(words(F.col(text_col))).alias("__pos", "word"),
    ).filter(F.length("word") > 0)
    joined = exploded.join(seg, "word", "left").select(
        "__id",
        "__pos",
        F.coalesce(
            "__seg",
            F.concat(F.split("word", ""), F.array(F.lit(END_OF_WORD))),
        ).alias("__seg"),
    )
    # an empty marker row per doc keeps wordless docs in the output while
    # preserving the SINGLE-aggregation shape (update-mode stream-safe —
    # a join back after the aggregation would not be)
    marker = docs.select(
        F.col(id_col).alias("__id"),
        F.lit(-1).alias("__pos"),
        F.expr("cast(array() as array<string>)").alias("__seg"),
    )
    return (
        joined.unionByName(marker)
        .groupBy("__id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__seg"))),
                    lambda st: st["__seg"],
                )
            ).alias("tokens")
        )
        .select(
            F.col("__id").alias(id_col),
            "tokens",
            F.size("tokens").cast("long").alias("n_tokens"),
        )
    )
