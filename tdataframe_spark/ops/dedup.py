"""Deduplication operators for large-scale text corpora: exact, n-gram
Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB rules):
- exact dedup: hash-groupBy — one shuffle on a 128-bit digest, no driver
  state.
- n-gram Jaccard: shingle → self-join on shingle → per-pair intersection
  counts. The shingle join is the classic inverted-index plan; hot shingles
  are the skew risk, so extremely frequent shingles can be dropped via
  ``max_shingle_freq`` (standard df-cut trick) before the join.
- MinHash+LSH: k permutation min-hashes per doc (one shuffle: explode
  shingles → groupBy doc), band signatures, bucket-join on (band, band_key)
  so only same-bucket docs pair up — candidate generation is linear-ish in
  corpus size instead of quadratic.
- SimHash: 64-bit sign-aggregated token hashes; near-dups share low Hamming
  distance (verification joins on rotated prefixes can be layered on).

All hashes go through ``portable_hash64`` (md5-derived) so every stage is
integer-exact and reproducible in the DuckDB oracle — no engine-private
hash functions in semantically meaningful places.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tdataframe_spark.core.partitioning import ensure_min_partitions
from tdataframe_spark.functions.numeric import portable_hash64
from tdataframe_spark.functions.text import word_shingles, words

# Per-permutation XOR masks for the k min-hashes: m_i = min over shingles
# of (h56(shingle) XOR MINHASH_XOR[i]).
#
# Why XOR, not the textbook (a*h + b) mod p affine family: int64 overflow
# caps the multiplier at a <= 127 (h < 2^56), and for every hash with
# a*h < p the affine map is ORDER-PRESERVING — all k "permutations" then
# pick the same min shingle and the signature degenerates to a min-shingle
# fingerprint (observed: two docs at Jaccard 0.86 sharing ZERO of 16
# signature slots because the one unshared shingle hashed smallest).
# XOR with a full-width random constant is an order-breaking bijection on
# [0, 2^56), is one cheap integer op, and DuckDB's xor() reproduces it
# exactly for the oracle. Constants are the md5 of "minhash-perm-{i}"
# (first 14 hex digits) — fixed, documented provenance.
MINHASH_XOR: list[int] = [
    5219494209792805, 56220535428324277, 10406094378268877,
    28650798363752103, 42505226248051183, 28191584683659461,
    67789192207942985, 64808199727250801, 71185343203040298,
    22678422856652888, 16621100350893093, 43058040837333365,
    44194947493436087, 57309002542948519, 4556952874206207,
    12131346054396882,
]
# retained for backward import compatibility (the affine family is no
# longer used by the signature builder)
MERSENNE61 = (1 << 61) - 1
MINHASH_PERMS: list[tuple[int, int]] = [
    (3, 12820163), (11, 906010081), (19, 22801), (29, 96002303),
    (37, 404201477), (43, 11213), (53, 700001093), (61, 4000037),
    (71, 900001541), (79, 52600121), (89, 300007), (101, 104729),
    (107, 15487469), (113, 32452843), (121, 49979687), (127, 67867979),
]

# scale-safe document-frequency cut for the shingle inverted-index join: a
# shingle occurring in more docs than this is dropped before the self-join
# (the standard df-cut). Without it one stopword shingle in every doc turns
# the join into an all-pairs cross product.
DEFAULT_MAX_SHINGLE_FREQ = 1000


def _minhash56(c):
    """56-bit portable hash (14 hex digits of md5): the headroom that lets
    minhash multipliers go up to 127 without int64 overflow.
    DuckDB equivalent: CAST(concat('0x', substr(md5(x), 1, 14)) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("long")


def exact_dedup_groups(
    df: DataFrame, id_col: str, text_col: str, normalize: bool = True
) -> DataFrame:
    """Group identical documents by content digest; returns one row per
    distinct content with the canonical (minimum) id and duplicate count."""
    t = F.col(text_col)
    if normalize:
        t = F.trim(F.regexp_replace(F.lower(t), "\\s+", " "))
    return (
        ensure_min_partitions(df)
        .select(F.md5(t).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_dups"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-decontamination check: flag corpus documents that share at
    least one word ``n``-gram with any document in ``eval_df`` (the held-out
    eval/benchmark set). Returns ``(id, n_hits)`` where ``n_hits`` is the
    number of distinct contaminated shingles — join back on id to drop or
    quarantine the flagged docs.

    Scale shape: eval sets are tiny next to a training corpus, so the
    distinct eval-shingle set is broadcast (``broadcast_eval=True``) and
    the check is one map-side semi-ish join over the corpus shingle stream —
    no shuffle of corpus-sized data beyond the per-doc count. Set
    ``broadcast_eval=False`` for pathological eval sets to fall back to a
    shuffle join.
    """
    csh = _shingle_table(corpus, id_col, text_col, n)
    esh = _shingle_table(eval_df, id_col, text_col, n).select("__sh").distinct()
    if broadcast_eval:
        esh = F.broadcast(esh)
    return (
        csh.join(esh, "__sh")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .select(F.col("__id").alias(id_col), "n_hits")
    )


def _bloom_hits(col: Column, bits_lit: Column, m_bits: int, k: int) -> Column:
    """AND of k membership probes against a bitset embedded as an
    array<long> literal: position = xxhash64(value, seed) mod m, probe =
    (words[p/64] >> (p%64)) & 1 — pure JVM bit math inside whole-stage
    codegen, no join, no UDF."""
    cond = F.lit(True)
    for seed in range(k):
        p = F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(m_bits))
        word = F.element_at(bits_lit, (p / 64).cast("int") + 1)
        # F.shiftleft only takes a Python-int shift; call_function passes
        # the column through to the SQL function, which accepts it
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def build_bloom_bits(
    df: DataFrame, col: str, m_bits: int, k: int
) -> list[int]:
    """Distributed Bloom-filter build: each value sets k bit positions;
    positions fold to ≤ m/64 (word_idx, OR-of-bits) rows in one hash-agg,
    and only that FIXED-size bitset (m/64 longs — independent of row count)
    comes back to the driver. The standard 'aggregate a sketch, broadcast
    it' shape."""
    pos = df.select(
        F.explode(
            F.array(*[
                F.pmod(F.xxhash64(F.col(col), F.lit(seed)), F.lit(m_bits))
                for seed in range(k)
            ])
        ).alias("__p")
    )
    words = (
        pos.groupBy((F.col("__p") / 64).cast("int").alias("__w"))
        .agg(
            F.bit_or(
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    (F.col("__p") % 64).cast("int"),
                )
            ).alias("__bits")
        )
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["__w"]] = r["__bits"]
    return arr


def decontaminate_bloom(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """``decontaminate`` with a Bloom-filter prefilter — the shape for eval
    sets whose distinct shingle table is too big to broadcast raw.

    Two stages, exact final answer:
    1. The eval shingles fold into an ``m_bits`` bitset (2^20 bits = 128 KB
       vs potentially hundreds of MB of distinct strings); it rides into
       every task as a plan literal and the k-probe membership test drops
       the overwhelming majority of corpus shingles map-side, inside
       codegen — the corpus never shuffles at full width.
    2. Bloom survivors (true hits + ~(1-e^(-kn/m))^k false positives) are
       verified with an exact semi-join against the eval shingle set, so
       the output is identical to exact ``decontaminate`` — only the
       *shuffled volume* is approximate.

    At 100 TB the corpus side is the cost; this plan touches it with one
    map-side filter and shuffles only ``~(hit_rate + fpp)`` of it. The
    driver materializes exactly ``m_bits/64`` longs — a constant, like a
    histogram's bin table, not data-proportional state.
    """
    spark = corpus.sparkSession
    csh = _shingle_table(corpus, id_col, text_col, n)
    esh = _shingle_table(eval_df, id_col, text_col, n).select("__sh").distinct()
    # ship the bitset as a broadcast 1-row DataFrame, NOT a plan literal:
    # a 2^20-bit filter is a 16k-element array, and embedding it in the
    # expression tree (×k probes) blows codegen up to ~10 s of compile
    # time — as data it broadcasts once and the plan stays tiny
    arr = build_bloom_bits(esh, "__sh", m_bits, k)
    bloom_df = spark.createDataFrame([(arr,)], "__bloom array<bigint>")
    survivors = (
        csh.join(F.broadcast(bloom_df))
        .where(_bloom_hits(F.col("__sh"), F.col("__bloom"), m_bits, k))
        .drop("__bloom")
    )
    return (
        survivors.join(esh, "__sh", "left_semi")
        .groupBy("__id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        .select(F.col("__id").alias(id_col), "n_hits")
    )


def char_shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, distinct lowercase char n-gram) pairs, built JVM-side with a
    sequence→substring transform (no UDF). Strings shorter than ``n``
    contribute themselves."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(length(lower({text_col})) - {n - 1}, 1)),"
                    f" i -> substring(lower({text_col}), i, {n}))"
                )
            )
        ).alias("__sh"),
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    n: int = 3,
    threshold: float = 0.5,
    max_freq: int | None = None,
) -> DataFrame:
    """Approximate string join (entity resolution): pairs whose char
    n-gram Jaccard similarity reaches ``threshold``. Returns
    (left_id, right_id, n_common, n_left, n_right, jaccard).

    The cross-table twin of :func:`ngram_jaccard_pairs`: an inverted-index
    equi-join on shingles replaces the quadratic compare-everything — only
    pairs sharing at least one (df-cut-surviving) gram are ever scored.
    ``max_freq`` drops grams present in more than that many RIGHT-side
    entities (stopword grams — e.g. a shared brand prefix — are the skew
    risk that would otherwise turn one gram into an all-pairs join).
    """
    lt = char_shingle_table(left, left_id, left_text, n)
    rt = char_shingle_table(right, right_id, right_text, n)
    if max_freq is not None:
        hot = (
            rt.groupBy("__sh")
            .agg(F.count(F.lit(1)).alias("__f"))
            .filter(F.col("__f") > max_freq)
            .select("__sh")
        )
        lt = lt.join(F.broadcast(hot), "__sh", "left_anti")
        rt = rt.join(F.broadcast(hot), "__sh", "left_anti")
    sizes_l = lt.groupBy("__id").agg(F.count(F.lit(1)).alias("n_left"))
    sizes_r = rt.groupBy("__id").agg(F.count(F.lit(1)).alias("n_right"))
    common = (
        lt.join(rt.withColumnRenamed("__id", "__rid"), "__sh")
        .groupBy("__id", "__rid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        common.join(sizes_l, "__id")
        .join(sizes_r.withColumnRenamed("__id", "__rid"), "__rid")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_left") + F.col("n_right") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__id").alias(left_id),
            F.col("__rid").alias(right_id),
            "n_common",
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            "jaccard",
        )
    )


def _shingle_table(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, shingle) pairs, distinct per doc."""
    df = ensure_min_partitions(df)
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(text_col, n)).alias("__sh"),
    )


def _posting_pairs(ids):
    """C(f,2) (id_a < id_b) pair structs from one sorted posting list —
    shared by the full-postings and prefix-filtered join plans."""
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _jaccard_from_shingles(
    sh: DataFrame,
    threshold: float,
    max_freq: int | None = None,
    persist: bool = False,
) -> DataFrame:
    """Pairwise Jaccard from a (__id, __sh) table via a postings-list plan:
    ONE shuffle groups each shingle to its sorted doc list, the df-cut is a
    free filter on that list's size, and candidate pairs are generated
    JVM-side from each posting (a nested transform — C(f,2) structs per
    shingle, bounded by the cut). The older inverted-index self-join
    shuffled the shingle table three times (freq agg, cut join, self join);
    this shuffles it once.

    Per-doc sizes are recomputed from the (cut) postings so jaccard
    denominators see exactly the shingles the intersection counted.
    """
    postings = sh.groupBy("__sh").agg(
        F.sort_array(F.collect_list("__id")).alias("__ids")
    )
    if max_freq is not None:
        postings = postings.filter(F.size("__ids") <= max_freq)
    if persist:
        from pyspark.storagelevel import StorageLevel

        postings = postings.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = (
        postings.select(F.explode("__ids").alias("__id"))
        .groupBy("__id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    if persist:
        # sizes feeds BOTH broadcast builds (n_a and n_b attach) — each
        # build is an independent job, so without a cache the
        # explode+agg subtree executes twice
        sizes = sizes.persist()
    common = (
        postings.select(F.explode(_posting_pairs(F.col("__ids"))).alias("__p"))
        .select("__p.id_a", "__p.id_b")
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    out = (
        common.join(sizes.withColumnsRenamed({"__id": "id_a", "__n": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"__id": "id_b", "__n": "n_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")
    )
    if persist:
        from tdataframe_spark.core.caching import tie_cache_lifetimes

        out = tie_cache_lifetimes(out, postings, sizes)
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
    persist: bool = False,
) -> DataFrame:
    """All document pairs with word-n-gram Jaccard similarity >= threshold.

    Returns (id_a, id_b, n_common, n_a, n_b, jaccard) with id_a < id_b.
    Jaccard is integer-derived (|∩| / (|A|+|B|-|∩|)) — exact double math.

    ``max_shingle_freq`` (df-cut) defaults ON: shingles present in more
    than that many (doc, shingle) rows are dropped — with the postings
    plan this is a free filter on the posting-list size, and it bounds the
    per-shingle pair fan-out to C(max_freq, 2). Slightly underestimates
    similarity for docs that share only ubiquitous shingles. Pass ``None``
    explicitly to disable (all-pairs risk on corpora with stopword
    shingles).

    ``persist=True`` caches the postings table (consumed by both the pair
    generation and the per-doc size agg) — use it whenever the input isn't
    a cheap re-scannable source.
    """
    sh = _shingle_table(df, id_col, text_col, n)
    return _jaccard_from_shingles(
        sh, threshold, max_freq=max_shingle_freq, persist=persist
    )


def _minhash_doc_table(
    df: DataFrame, id_col: str, text_col: str, n: int, k: int
) -> DataFrame:
    """Per-row minhash doc table: (__id, __set, __n, m0..m{k-1}) with NO
    shuffle — ``word_shingles`` already yields each doc's distinct shingle
    set as an array, shingle hashes are computed once into an array column,
    and every signature component is an ``array_min`` over integer math.
    Being pure projections, this runs identically on a streaming DataFrame
    (the key to incremental index matching). Docs with zero shingles
    (< n words) are dropped, matching the explode-based formulation."""
    assert k <= len(MINHASH_XOR)
    d = (
        ensure_min_partitions(df)
        .select(
            F.col(id_col).alias("__id"),
            word_shingles(F.col(text_col), n).alias("__set"),
        )
        .filter(F.size("__set") > 0)
        .withColumn("__hs", F.transform(F.col("__set"), _minhash56))
    )
    sigs = [
        F.array_min(
            F.transform(F.col("__hs"), lambda h: h.bitwiseXOR(F.lit(c)))
        ).alias(f"m{i}")
        for i, c in enumerate(MINHASH_XOR[:k])
    ]
    return d.select(
        "__id", "__set", F.size("__set").cast("long").alias("__n"), *sigs
    )


def _band_structs(k: int, bands: int):
    """(band, key) struct array over signature columns m0..m{k-1}."""
    rpb = k // bands
    return F.array(
        *[
            F.struct(
                F.lit(bi).alias("__band"),
                F.concat_ws(
                    "_", *[F.col(f"m{bi * rpb + j}") for j in range(rpb)]
                ).alias("__key"),
            )
            for bi in range(bands)
        ]
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, k: int = 16
) -> DataFrame:
    """Per-doc MinHash signature columns m0..m{k-1} (docs with >=1 shingle).
    Shuffle-free: see `_minhash_doc_table`."""
    doc = _minhash_doc_table(df, id_col, text_col, n, k)
    return doc.select(F.col("__id").alias(id_col), *[f"m{i}" for i in range(k)])


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    persist: bool = False,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verification.

    Candidate pairs = docs sharing at least one identical band of the
    signature (rows_per_band = k/bands); candidates are then verified with
    the exact n-gram Jaccard, so the result has no false positives (only the
    usual LSH false-negative probability).
    Returns (id_a, id_b, jaccard).

    Signatures here use the explode+groupBy formulation: one extra shuffle
    of (id, hash) pairs, but the whole pipeline stays inside whole-stage
    codegen — measurably faster than the per-row higher-order-function
    form (`_minhash_doc_table`), whose lambdas are interpreted. The
    per-row form exists for the incremental index ops, where statelessness
    (streamability) is the requirement; `test_minhash_index_incremental_
    match` pins the two formulations to identical results.
    ``persist=True`` caches the doc table (signatures + shingle sets),
    which feeds the bucket join and both verification sides.
    """
    assert k % bands == 0
    sh_all = _shingle_table(df, id_col, text_col, n)
    aggs = [
        F.min(F.col("__h").bitwiseXOR(F.lit(c))).alias(f"m{i}")
        for i, c in enumerate(MINHASH_XOR[:k])
    ]
    # ONE aggregation pass produces signatures AND the verification sets —
    # hash and shingle ride the same shuffle; the aggregated doc table (one
    # row per doc) then feeds the bucket explode and both verify sides
    doc = (
        sh_all.select("__id", "__sh", _minhash56(F.col("__sh")).alias("__h"))
        .groupBy("__id")
        .agg(
            *aggs,
            F.collect_set("__sh").alias("__set"),
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
    )
    if persist:
        from pyspark.storagelevel import StorageLevel

        doc = doc.persist(StorageLevel.MEMORY_AND_DISK)

    bucketed = doc.select(
        "__id", F.explode(_band_structs(k, bands)).alias("__bk")
    ).select("__id", F.col("__bk.__band").alias("__band"), F.col("__bk.__key").alias("__key"))

    left = bucketed.select(F.col("__id").alias("id_a"), "__band", "__key")
    right = bucketed.select(F.col("__id").alias("id_b"), "__band", "__key")
    cand = (
        left.join(right, ["__band", "__key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # verify ONLY candidate PAIRS: join each pair to its two per-doc shingle
    # sets and compute |∩| with array_intersect — work is O(pairs × set
    # size). (An inverted-index join over candidate DOCS would degenerate to
    # the full no-df-cut all-pairs job whenever banding flags most of the
    # corpus as some candidate, which one hot band key is enough to cause.)
    sa = doc.select(
        F.col("__id").alias("id_a"),
        F.col("__set").alias("__set_a"),
        F.col("__n").alias("__n_a"),
    )
    sb = doc.select(
        F.col("__id").alias("id_b"),
        F.col("__set").alias("__set_b"),
        F.col("__n").alias("__n_b"),
    )
    inter = F.size(F.array_intersect(F.col("__set_a"), F.col("__set_b"))).cast("long")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            inter.cast("double")
            / (F.col("__n_a") + F.col("__n_b") - inter).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def build_exact_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    normalize: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist the exact-dedup state: one (content_hash, keep_id) row per
    distinct normalized content. The exact-match counterpart of
    :func:`build_minhash_index` for incremental ingestion."""
    exact_dedup_groups(df, id_col, text_col, normalize=normalize).select(
        "content_hash", "keep_id"
    ).write.mode(mode).parquet(path)


def match_exact_index(
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    normalize: bool = True,
) -> DataFrame:
    """Flag NEW documents whose content already exists in a
    :func:`build_exact_index` — returns (new_id, keep_id). Stateless hash
    projection + static join: works on a streaming ``new_docs`` too."""
    spark = new_docs.sparkSession
    t = F.col(text_col)
    if normalize:
        t = F.trim(F.regexp_replace(F.lower(t), "\\s+", " "))
    hashed = new_docs.select(
        F.col(id_col).alias("new_id"), F.md5(t).alias("content_hash")
    )
    idx = spark.read.parquet(index_path)
    return hashed.join(idx, "content_hash").select("new_id", "keep_id")


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    mode: str = "overwrite",
) -> None:
    """Persist the incremental near-dup state for a corpus: ``path/buckets``
    (band, key, id) and ``path/docs`` (id, shingle set, set size). New data
    then matches against this with :func:`match_minhash_index` WITHOUT
    re-processing the corpus — the index is the only thing a 100 TB
    pipeline keeps between ingestion batches. ``mode="append"`` grows the
    index incrementally as matched batches are admitted."""
    assert k % bands == 0
    doc = _minhash_doc_table(df, id_col, text_col, n, k)
    doc.select(
        "__id", F.explode(_band_structs(k, bands)).alias("__bk")
    ).select(
        F.col("__id").alias("id"),
        F.col("__bk.__band").alias("band"),
        F.col("__bk.__key").alias("key"),
    ).write.mode(mode).parquet(f"{path}/buckets")
    doc.select(
        F.col("__id").alias("id"),
        F.col("__set").alias("shingles"),
        F.col("__n").alias("n_shingles"),
    ).write.mode(mode).parquet(f"{path}/docs")


def match_minhash_index(
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    dedupe: bool = True,
) -> DataFrame:
    """Flag near-duplicates of NEW documents against a prebuilt
    :func:`build_minhash_index` — the incremental-ingestion dedup step.
    Returns (new_id, corpus_id, jaccard).

    The new side is pure stateless projections (per-row signatures +
    band explode, shingle set carried along), joined against the STATIC
    index tables — so ``new_docs`` may be a STREAMING DataFrame: the plan
    is a stream-static join, no stateful operator needed. Pass
    ``dedupe=False`` on streams (a pair matched by several bands then
    appears once per matching band; ``dropDuplicates`` is a stateful op
    the caller can add with a watermark if exact-once pairs matter).
    """
    assert k % bands == 0
    spark = new_docs.sparkSession
    doc = _minhash_doc_table(new_docs, id_col, text_col, n, k)
    new_buckets = doc.select(
        F.col("__id").alias("new_id"),
        F.col("__set").alias("__set_a"),
        F.col("__n").alias("__n_a"),
        F.explode(_band_structs(k, bands)).alias("__bk"),
    ).select(
        "new_id",
        "__set_a",
        "__n_a",
        F.col("__bk.__band").alias("band"),
        F.col("__bk.__key").alias("key"),
    )
    corpus_buckets = spark.read.parquet(f"{index_path}/buckets")
    corpus_docs = spark.read.parquet(f"{index_path}/docs").select(
        F.col("id").alias("corpus_id"),
        F.col("shingles").alias("__set_b"),
        F.col("n_shingles").alias("__n_b"),
    )
    cand = new_buckets.join(corpus_buckets, ["band", "key"]).select(
        "new_id", "__set_a", "__n_a", F.col("id").alias("corpus_id")
    )
    inter = F.size(F.array_intersect(F.col("__set_a"), F.col("__set_b"))).cast("long")
    out = (
        cand.join(corpus_docs, "corpus_id")
        .withColumn(
            "jaccard",
            inter.cast("double")
            / (F.col("__n_a") + F.col("__n_b") - inter).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "corpus_id", "jaccard")
    )
    return out.dropDuplicates(["new_id", "corpus_id"]) if dedupe else out


def _cc_driver_finish_pdf(pdf, spark, id_type) -> DataFrame:
    """Small-graph exit of :func:`connected_components`: the collected
    (already symmetric, deduped) edge list finishes with a path-compressed
    union-find on the driver — identical labels (min reachable id:
    union-by-min keeps the component minimum at the root). The standard
    two-phase CC shape (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond": iterate distributed only while the graph is
    big, finish in memory once it fits): one in-memory pass replaces
    O(log diameter) distributed rounds of join+groupBy+checkpoint whose
    per-round fixed cost dominates on all but huge edge sets."""
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(pdf["src"].tolist(), pdf["dst"].tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # union by min: the root IS the component min
    nodes = list(parent)
    out = pd.DataFrame({"id": nodes, "component": [find(n) for n in nodes]})
    schema = StructType(
        [StructField("id", id_type), StructField("component", id_type)]
    )
    return spark.createDataFrame(out, schema=schema)


def connected_components(
    pairs: DataFrame,
    left_col: str = "id_a",
    right_col: str = "id_b",
    max_iterations: int = 20,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """Connected components over a pair graph (duplicate-cluster assembly):
    every node gets the MINIMUM id reachable from it as its component label.

    Hybrid execution: an edge set at or under ``driver_edge_threshold``
    (counted after symmetrization+dedup) finishes in one driver-side
    union-find pass — bit-identical labels, none of the distributed
    loop's per-round job overhead (see :func:`_cc_driver_finish_pdf`).
    Larger graphs run the loop below.

    Iterative label propagation with POINTER JUMPING: each round (1) every
    node takes the minimum label across its edges, then (2) every node
    replaces its label with its label-node's label (path halving). Step 2
    turns the O(diameter) convergence of plain propagation into
    O(log diameter) — low-threshold similarity graphs form chain-like
    components whose diameter tracks component size, and plain propagation
    was observed needing >20 rounds on a 1.4k-node chain-y graph (166 s of
    round overhead) where the jumped loop needs ~5. The loop is
    driver-side control flow but all data stays distributed.
    Deterministic output: (id, component).

    Raises RuntimeError if ``max_iterations`` rounds pass without
    convergence — returning unconverged labels would be silently WRONG
    cluster assignments downstream (keep-best canonicalization would keep
    several "representatives" of one true cluster). With jumping, 20
    rounds cover diameters past 10^6.

    Persistence discipline (the part that makes the loop viable at depth):
    ``edges`` and each round's labels are persisted, the previous round is
    unpersisted once superseded, and lineage is truncated with
    ``localCheckpoint`` every few rounds — otherwise the per-round
    convergence count re-executes the whole chain from the root (O(rounds²)
    scans) and the plan grows without bound. On a multi-node cluster with
    executor churn, prefer a reliable ``checkpoint()`` directory over
    localCheckpoint.
    """
    # lineage MUST truncate every round: the pointer-jump step self-joins
    # the round's labels, so an unmaterialized plan DOUBLES per round
    # (observed: driver OOM in explainString by round ~5 at checkpoint
    # cadence 5). The labels table is node-sized and the convergence count
    # materializes it anyway, so per-round truncation is ~free.
    checkpoint_every = 1
    edges = (
        pairs.select(F.col(left_col).alias("src"), F.col(right_col).alias("dst"))
        .union(pairs.select(F.col(right_col).alias("src"), F.col(left_col).alias("dst")))
        .distinct()
        .persist()
    )
    # size gate fused with the collect: pull at most threshold+1 edges —
    # if they all fit, that IS the complete edge set and one in-memory
    # union-find replaces the loop's per-round job overhead (a dup graph
    # is banded/eps-restricted, not the corpus, so this is the common
    # case even at corpus scale); one extra row means the graph is big →
    # distributed loop (the bounded probe cost is the price of one job)
    if driver_edge_threshold > 0:
        probe = edges.limit(driver_edge_threshold + 1).toPandas()
        if len(probe) <= driver_edge_threshold:
            out = _cc_driver_finish_pdf(
                probe, edges.sparkSession, edges.schema["src"].dataType
            )
            edges.unpersist()
            return out
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    converged = False
    for i in range(max_iterations):
        # labels flowing across edges: each node may learn a smaller label
        # from any neighbour
        candidate = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        propagated = (
            labels.select("id", "component")
            .union(candidate)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping (path halving): component <- component's
        # component. A node's label is always a reachable node's id, and
        # that node's label is reachable transitively — so the jump stays
        # within the component while halving label-chain length, giving
        # O(log diameter) total rounds.
        mapping = propagated.select(
            F.col("id").alias("component"), F.col("component").alias("__cc")
        )
        new_labels = (
            propagated.join(mapping, "component", "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__cc"), F.col("component")),
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist()
        # convergence check: any node improved this round? (also the action
        # that materializes new_labels into its cache)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") < F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components: no convergence in {max_iterations} "
            "rounds — refusing to return partial labels (wrong clusters "
            "downstream); raise max_iterations"
        )
    return labels.select("id", "component")


def simhash64(
    df: DataFrame, id_col: str, text_col: str, n: int = 1
) -> DataFrame:
    """64-bit SimHash per document over word n-gram hashes.

    bit_j(doc) = 1 iff sum over tokens of sign(bit_j(hash(token))) > 0.
    Implemented as one explode + groupBy with 64 conditional sums folded
    into a packed bigint (docs → one row each; a single shuffle).
    """
    sh = _shingle_table(df, id_col, text_col, n)
    h = portable_hash64(F.col("__sh"))
    # contribution of each token to each of 60 usable bits: +1 or -1
    # (bitwiseAND keeps the test integer-exact; h does not fit a double)
    bit_sums = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(1 << j).cast("long")) != 0, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(60)
    ]
    per_doc = sh.groupBy(F.col("__id").alias(id_col)).agg(*bit_sums)
    packed = None
    for j in range(60):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = term if packed is None else packed + term
    return per_doc.select(F.col(id_col), packed.alias("simhash"))


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 8,
    n: int = 1,
    n_bits: int = 60,
    expand: int = 1,
) -> DataFrame:
    """All document pairs whose SimHash Hamming distance is <= max_distance
    (d), found by pigeonhole banding — never an all-pairs cross product,
    and exact: banded candidates + bit_count verify return the identical
    pair set to the quadratic formulation.

    Pigeonhole with variant expansion (``expand`` = e): split the signature
    into b = floor(d / (e+1)) + 1 contiguous bands; for any pair within
    distance d, SOME band carries at most floor(d/b) <= e of the differing
    bits. One side of the join therefore emits, per band, every value
    within Hamming distance e of its band value (e=1: the value plus one
    row per flipped bit); the other side emits the exact value. The
    equi-join on (band_idx, band_value) then has guaranteed recall at
    radius d — the HmSearch-style trade of join-key fan-out for band width.

    Honest cost floor (why e matters): two UNRELATED signatures collide in
    a w-bit band with probability ~(variants)/2^w, so the candidate set has
    an irreducible ~b·sum_{i<=e} C(w,i)/2^w · n²/2 term for uniform
    signatures. At d=8 over 60 bits: e=0 → 9 bands of ~6.7 bits ≈ 9% of
    all pairs; e=1 → 5 bands of 12 bits ≈ 1.6%. Larger e widens bands
    further (e=2 → 3 bands of 20 bits, ~2e-4) at C(w,2) fan-out. And on
    any corpus, output size is a lower bound — a tight threshold on
    clustered data is quadratic because the ANSWER is.

    100 TB shape: one explode per doc (b·variants rows on the expanded
    side, b on the exact side), one shuffle join on the band key, one
    distinct on the candidate pairs, map-side verify.
    """
    return hamming_pairs(
        simhash64(df, id_col, text_col, n=n),
        id_col,
        "simhash",
        max_distance=max_distance,
        n_bits=n_bits,
        expand=expand,
    )


def hamming_pairs(
    sigs: DataFrame,
    id_col: str,
    sig_col: str,
    max_distance: int = 8,
    n_bits: int = 60,
    expand: int = 1,
    other: DataFrame | None = None,
    include_self: bool = False,
) -> DataFrame:
    """Generic banded Hamming join over ANY packed-bigint signature
    column (SimHash text signatures, pHash image signatures, ...) — the
    pigeonhole machinery of :func:`simhash_hamming_pairs` factored out
    so every fixed-width binary embedding gets the never-all-pairs
    near-dup join. See that docstring for the banding math and the
    honest cost floor.

    ``other``: when given, pairs are CROSS-SET — ``other``'s rows (the
    new batch; takes the expanded join-key side, so fan-out scales with
    the batch, not the corpus) against ``sigs``' rows (the persisted
    index; exact band keys only) — and every (id_a ∈ other, id_b ∈
    sigs) match returns, with no id ORDERING filter; the trivial
    ``id_a == id_b`` self-pair is dropped (re-matching a batch whose
    ids were already folded into the index via an append must not
    return every row as its own hamming-0 duplicate). This assumes the
    id is one namespace identifying ITEMS across both sets — the
    append/re-match contract of the index twins; when the batch's ids
    are an independent namespace (equal id != same item), pass
    ``include_self=True`` to keep such pairs. The incremental near-dup
    shape: index once, match forever."""
    if max_distance < 0:
        raise ValueError("max_distance must be >= 0")
    if expand not in (0, 1):
        raise ValueError("expand must be 0 (exact bands) or 1 (1-flip variants)")
    bands = max_distance // (expand + 1) + 1
    if bands > n_bits:
        raise ValueError(f"{bands} bands need at least that many signature bits")
    base, extra = divmod(n_bits, bands)
    # band i covers [offset, offset + width) of the signature; the first
    # `extra` bands get one extra bit so all n_bits are covered
    widths = [base + (1 if i < extra else 0) for i in range(bands)]
    offsets = [sum(widths[:i]) for i in range(bands)]

    h = sigs.select(F.col(id_col), F.col(sig_col).alias("simhash"))

    def band_val(i: int):
        return F.shiftrightunsigned(F.col("simhash"), offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1).cast("long")
        )

    exact_structs = F.array(
        *[
            F.struct(F.lit(i).alias("band_idx"), band_val(i).alias("band_val"))
            for i in range(bands)
        ]
    )
    if expand == 0:
        expanded_structs = exact_structs
    else:
        expanded_structs = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band_idx"),
                    v.alias("band_val"),
                )
                for i in range(bands)
                for v in [band_val(i)]
                + [
                    band_val(i).bitwiseXOR(F.lit(1 << j).cast("long"))
                    for j in range(widths[i])
                ]
            ]
        )

    def explode_side(structs, id_alias: str, h_alias: str) -> DataFrame:
        return h.select(
            F.col(id_col).alias(id_alias),
            F.col("simhash").alias(h_alias),
            F.explode(structs).alias("__b"),
        ).select(id_alias, h_alias, "__b.band_idx", "__b.band_val")

    def explode_from(df, structs, id_alias: str, h_alias: str) -> DataFrame:
        hh = df.select(F.col(id_col), F.col(sig_col).alias("simhash"))
        return hh.select(
            F.col(id_col).alias(id_alias),
            F.col("simhash").alias(h_alias),
            F.explode(structs).alias("__b"),
        ).select(id_alias, h_alias, "__b.band_idx", "__b.band_val")

    if other is None:
        a = explode_side(expanded_structs, "id_a", "h_a")
        b = explode_side(exact_structs, "id_b", "h_b")
        joined = a.join(b, ["band_idx", "band_val"]).filter(
            F.col("id_a") < F.col("id_b")
        )
    else:
        a = explode_from(other, expanded_structs, "id_a", "h_a")
        b = explode_side(exact_structs, "id_b", "h_b")
        joined = a.join(b, ["band_idx", "band_val"])
        if not include_self:
            joined = joined.filter(F.col("id_a") != F.col("id_b"))
    candidates = (
        joined
        # a close pair can collide in several bands — dedupe before verify
        # (h_a/h_b are functionally dependent on the ids, so distinct on
        # all four columns is a distinct on the pair)
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    return (
        candidates.select(
            "id_a",
            "id_b",
            F.expr("bit_count(h_a ^ h_b)").cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_distance)
    )


def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    words_per_line: int = 3,
) -> DataFrame:
    """C4-style line-level deduplication: drop every repeated line from all
    but its first occurrence, then reassemble documents.

    The corpus tables carry no newline structure, so "lines" are
    synthesized deterministically as fixed ``words_per_line``-word chunks
    of the whitespace-split text (the splitter both engines can mirror
    exactly). A line's first occurrence is the lexicographically smallest
    (doc id, line index); every other occurrence corpus-wide is dropped —
    the C4 paper's "discard all but one of any three-sentence span
    occurring more than once" policy at line granularity.

    100 TB shape: explode to one row per line, ONE hash aggregate on
    line text whose min(struct) IS the kept set (no join back against the
    full line table), then a per-doc aggregate to reassemble. Shuffled
    bytes track the line table, never pairs; hot boilerplate lines cost
    one combine-side min each.

    Returns (id, text_clean, n_lines, n_kept, n_dropped) — one row per
    input document, always: a document whose every line was dropped keeps
    an empty text_clean, and a NULL-text document keeps a row with zero
    counts (anchoring totals on the line table instead would silently
    delete it from the output).
    """
    if words_per_line < 1:
        raise ValueError("words_per_line must be >= 1")
    w = words_per_line
    ws = F.split(F.col(text_col), " ")
    # ceil(size/w) chunk starts; slice() past the end returns the short tail
    n_chunks = F.ceil(F.size(ws) / F.lit(w)).cast("int")
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(ws, i * w + 1, w)),
            )
        ).alias("line_idx", "line_text"),
    )
    # first occurrence per distinct line — the aggregate's value IS the
    # kept (doc, idx, text) row, so no second pass over the line table
    kept = (
        lines.groupBy("line_text")
        .agg(F.min(F.struct("__id", "line_idx")).alias("__w"))
        .select(
            F.col("__w.__id").alias("__id"),
            F.col("__w.line_idx").alias("line_idx"),
            "line_text",
        )
    )
    clean = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line_text"))),
                lambda s: s["line_text"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    line_counts = lines.groupBy("__id").agg(F.count(F.lit(1)).alias("n_lines"))
    # anchor on the INPUT docs, not the line table: a NULL-text document
    # produces no line rows and must still appear in the output
    totals = df.select(F.col(id_col).alias("__id")).join(
        line_counts, "__id", "left"
    )
    return (
        totals.join(clean, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.coalesce(F.col("n_lines"), F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            (
                F.coalesce(F.col("n_lines"), F.lit(0))
                - F.coalesce(F.col("n_kept"), F.lit(0))
            )
            .cast("long")
            .alias("n_dropped"),
        )
    )


def build_cluster_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> None:
    """Persist the full near-dup state for incremental ingestion: the
    MinHash bucket/doc index (``path/buckets``, ``path/docs``) plus the
    corpus' duplicate-cluster labels (``path/clusters``: id, cluster) —
    every doc labeled, non-duplicates as singleton clusters of themselves.
    """
    build_minhash_index(df, id_col, text_col, path, n, k, bands)
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, n, k, bands, threshold, persist=True
    )
    comp = connected_components(pairs)
    all_ids = df.select(F.col(id_col).alias("id"))
    (
        all_ids.join(comp, "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("cluster"))
        .write.mode("overwrite")
        .parquet(f"{path}/clusters")
    )


def assign_clusters(
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental cluster assignment: place NEW documents into the
    persisted near-dup clusters WITHOUT reprocessing the corpus. Returns
    (new_id, cluster, n_clusters_hit, needs_merge):

    - no match → the doc founds its own singleton cluster (cluster =
      new_id, n_clusters_hit = 0);
    - matches in one existing cluster → that cluster;
    - matches spanning SEVERAL clusters → the doc is a bridge: it gets the
      minimum matched cluster and ``needs_merge=true``. Bridges are the
      one case incremental assignment cannot settle locally (a true merge
      rewrites other docs' labels) — the honest contract is to flag them
      and fold them in at the next periodic full ``build_cluster_index``,
      exactly how production dedup services square incremental ingestion
      with global connectivity.

    Match side is stateless projections + static-table joins (stream-safe,
    like :func:`match_minhash_index`).
    """
    spark = new_docs.sparkSession
    m = match_minhash_index(
        new_docs, index_path, id_col, text_col, n, k, bands, threshold
    )
    clusters = spark.read.parquet(f"{index_path}/clusters").select(
        F.col("id").alias("corpus_id"), "cluster"
    )
    hit = (
        m.join(clusters, "corpus_id")
        .groupBy("new_id")
        .agg(
            F.min("cluster").alias("__cluster"),
            F.countDistinct("cluster").cast("long").alias("n_clusters_hit"),
        )
    )
    return (
        new_docs.select(F.col(id_col).alias("new_id"))
        .join(hit, "new_id", "left")
        .select(
            "new_id",
            F.coalesce("__cluster", F.col("new_id")).alias("cluster"),
            F.coalesce("n_clusters_hit", F.lit(0)).cast("long").alias(
                "n_clusters_hit"
            ),
            (F.coalesce("n_clusters_hit", F.lit(0)) > 1).alias("needs_merge"),
        )
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score: Column | None = None,
    left_col: str = "id_a",
    right_col: str = "id_b",
) -> DataFrame:
    """Cluster-canonicalization: group near-duplicates (connected
    components over ``pairs``), then keep exactly ONE representative per
    cluster — the member with the highest ``score`` (default:
    :func:`~tdataframe_spark.functions.text.quality_score` of ``text``),
    ties to the lowest id. Singleton docs form their own cluster and are
    always kept. This is the step after near-dup *detection* that real
    curation pipelines need: not "which docs collide" but "which copy do
    we train on".

    Returns one row per input doc: (id, cluster, quality, keep 0/1).

    Scale shape: CC is the persisted/checkpointed label-propagation loop;
    the representative choice is ONE window shuffle on cluster id (near-dup
    clusters are small and numerous — no hot partition). The score is any
    JVM-side expression; plug in an LM score column for CCNet-style
    best-of-cluster selection.
    """
    from pyspark.sql import Window

    from tdataframe_spark.functions.text import quality_score

    if score is None:
        score = quality_score(F.col("text"))
    comp = connected_components(pairs, left_col, right_col)
    labeled = (
        docs.withColumn("__q", score)
        .join(comp, docs[id_col] == comp["id"], "left")
        .select(
            docs[id_col],
            F.coalesce("component", docs[id_col]).alias("cluster"),
            F.col("__q").alias("quality"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    return labeled.withColumn(
        "keep",
        (F.row_number().over(w) == 1).cast("int"),
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    max_df: int | None = DEFAULT_MAX_SHINGLE_FREQ,
    persist: bool = False,
) -> DataFrame:
    """All document pairs with TF-IDF-weighted cosine similarity >=
    ``threshold`` — the WEIGHTED near-dup signal: where Jaccard/MinHash
    treat every shingle equally, tf-idf cosine discounts ubiquitous terms
    (idf) and rewards repeated rare ones (tf), the classic
    boilerplate-tolerant duplicate detector.

    Returns (id_a, id_b, cos_sim) with id_a < id_b, cos rounded to 9 dp.

    Plan shape (the ngram_jaccard postings discipline): one explode +
    hash-agg builds the (doc, term, tf) postings; document frequencies are
    a term-keyed aggregate of it; ``max_df`` (df-cut, default ON) drops
    terms in more than that many docs — a free filter on the posting list
    that bounds per-term pair fan-out to C(max_df, 2), exactly the
    stopword-blowup cap. Pair dot products flow through one term-keyed
    self-join; norms use the SAME post-cut weighted table, so the measure
    is a true cosine in the truncated term space (cos(a,a) = 1).

    Determinism: tf/df are integers; idf = ln(1 + N/df) is rounded to
    9 dp (the ln-parity convention); per-doc and per-pair double sums are
    ORDERED folds over term-sorted lists, bit-stable on any partitioning
    and reproducible by the DuckDB oracle.
    """
    from tdataframe_spark.functions.text import words

    post = (
        ensure_min_partitions(df)
        .select(
            F.col(id_col).alias("__id"),
            F.explode(words(F.lower(F.col(text_col)))).alias("__t"),
        )
        .groupBy("__id", "__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    if persist:
        post = post.persist()
    n_docs = post.select("__id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("__n_docs")
    )
    dfreq = post.groupBy("__t").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    if max_df is not None:
        dfreq = dfreq.filter(F.col("__df") <= max_df)
    weighted = (
        post.join(dfreq, "__t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id",
            "__t",
            (
                F.col("__tf")
                * F.round(F.log(F.lit(1.0) + F.col("__n_docs") / F.col("__df")), 9)
            ).alias("__w"),
        )
    )
    if persist:
        weighted = weighted.persist()

    def _fold_sum(lst):
        return F.aggregate(lst, F.lit(0.0), lambda acc, x: acc + x)

    norms = (
        weighted.groupBy("__id")
        .agg(F.array_sort(F.collect_list(F.struct("__t", "__w"))).alias("__l"))
        .select(
            "__id",
            F.sqrt(
                _fold_sum(F.transform(F.col("__l"), lambda x: x["__w"] * x["__w"]))
            ).alias("__norm"),
        )
    )
    if persist:
        # referenced twice (na/nb) under different aliases, which defeats
        # subtree reuse — persist so the per-doc fold aggregates once
        norms = norms.persist()
    a = weighted.select(
        "__t", F.col("__id").alias("id_a"), F.col("__w").alias("__wa")
    )
    b = weighted.select(
        "__t", F.col("__id").alias("id_b"), F.col("__w").alias("__wb")
    )
    dots = (
        a.join(b, "__t")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("__t", (F.col("__wa") * F.col("__wb")).alias("__p"))
                )
            ).alias("__l")
        )
        .select(
            "id_a",
            "id_b",
            _fold_sum(F.transform(F.col("__l"), lambda x: x["__p"])).alias("__dot"),
        )
    )
    na = norms.select(F.col("__id").alias("id_a"), F.col("__norm").alias("__na"))
    nb = norms.select(F.col("__id").alias("id_b"), F.col("__norm").alias("__nb"))
    out = (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("__dot") / (F.col("__na") * F.col("__nb")), 9).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    if persist:
        from tdataframe_spark.core.caching import tie_cache_lifetimes

        out = tie_cache_lifetimes(out, post, weighted, norms)
    return out


# ---------------------------------------------------------------------------
# exact repeated-substring (span-level) dedup — Lee et al., "Deduplicating
# Training Data Makes Language Models Better" (arXiv 2107.06499). Reference
# parity note: the reference engine has no curation surface; this is part
# of the task sheet's LLM-pipeline extension, between line-level
# (dedup_lines) and document-level (exact_dedup_groups) granularity.


def _span_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(__id, pos, __h): one row per sliding ``k``-word window, hashed with
    the portable 60-bit hash. Shared by the one-shot and incremental
    ExactSubstr paths."""
    n_sh = (F.size(F.col("__ws")) - F.lit(k) + 1).cast("int")
    return (
        ensure_min_partitions(df).select(
            F.col(id_col).alias("__id"), words(text_col).alias("__ws")
        )
        .filter(n_sh > 0)
        .select(
            "__id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_sh - 1),
                    lambda i: portable_hash64(
                        F.concat_ws(" ", F.slice(F.col("__ws"), i + 1, k))
                    ),
                )
            ).alias("pos", "__h"),
        )
    )


def _merge_marked_spans(marked: DataFrame, k: int, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of marked window positions into maximal
    (id, span_start, span_end, n_dup_tokens) rows."""
    w = Window.partitionBy("__id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = marked.select(
        "__id",
        "pos",
        F.sum(
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
        )
        .over(w)
        .alias("__island"),
    )
    return (
        islands.groupBy("__id", "__island")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + k).cast("int").alias("span_end"),
        )
        .select(
            F.col("__id").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).cast("long").alias("n_dup_tokens"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Find every maximal duplicated token span: positions covered by a
    ``k``-word window whose text occurs more than once corpus-wide, with
    the single first occurrence (lexicographically smallest (doc id, pos)
    per distinct window) left unmarked — the ExactSubstr policy of
    arXiv 2107.06499 expressed on sliding word shingles instead of a
    suffix array.

    100 TB shape: the shingle table is ~one row per corpus token —
    inherent to the algorithm (every occurrence must be markable) — and
    is shuffled twice on the 60-bit shingle hash (once to find duplicated
    windows + their kept occurrence, once to join the verdict back); no
    suffix array, no driver state, no pairs. Hot boilerplate windows cost
    one aggregate row plus their own occurrence rows, never a cross
    product. Span assembly is a per-document sort-window (gaps-and-
    islands), so its shuffle is the marked-occurrence table only.

    Returns one row per maximal span: (id, span_start, span_end, n_dup_tokens)
    with token positions 0-based and ``span_end`` exclusive.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sh = _span_shingles(df, id_col, text_col, k)
    dup = (
        sh.groupBy("__h")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min(F.struct("__id", "pos")).alias("__keep"),
        )
        .filter(F.col("__n") > 1)
        .select("__h", "__keep")
    )
    marked = sh.join(dup, "__h").filter(
        (F.col("__id") != F.col("__keep.__id")) | (F.col("pos") != F.col("__keep.pos"))
    )
    return _merge_marked_spans(marked, k, id_col)


def strip_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Remove every duplicated span found by ``duplicate_spans`` from the
    corpus, keeping each window's first occurrence — the destructive half
    of ExactSubstr dedup. Returns one row per INPUT document:
    (id, text_clean, n_tokens, n_dup_tokens) — a document with no
    duplicated spans (or NULL text) keeps its full text.

    The per-document span list is bounded by n_tokens/k after island
    merging, so the strip is a broadcast-free left join plus one
    JVM-side filter over token positions (the lambda touches only plain
    attributes; the span array is a grouped attribute, not a
    recomputed expression).
    """
    spans = duplicate_spans(df, id_col, text_col, k=k).groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans"),
        F.sum("n_dup_tokens").alias("__dup"),
    )
    ws = words(text_col)
    joined = df.join(spans, id_col, "left")
    covered = lambda t: F.exists(  # noqa: E731
        F.col("__spans"),
        lambda s: (s["span_start"] <= t) & (t < s["span_end"]),
    )
    kept_words = F.filter(
        F.transform(ws, lambda x, i: F.struct(x.alias("w"), i.alias("i"))),
        lambda s: ~covered(s["i"]),
    )
    return joined.select(
        F.col(id_col),
        F.when(F.col(text_col).isNull(), F.lit(None))
        .when(
            F.col("__spans").isNull(), F.col(text_col)
        )
        .otherwise(
            F.array_join(F.transform(kept_words, lambda s: s["w"]), " ")
        )
        .alias("text_clean"),
        F.when(F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(ws))
        .cast("long")
        .alias("n_tokens"),
        F.coalesce(F.col("__dup"), F.lit(0)).cast("long").alias("n_dup_tokens"),
    )


def build_span_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    k: int = 8,
    mode: str = "overwrite",
) -> None:
    """Persist the ExactSubstr state: one row per DISTINCT ``k``-word
    window hash in the corpus. Incremental marking only needs MEMBERSHIP
    (any prior occurrence makes a new window a duplicate), so the index
    is the distinct-hash set — one bigint per distinct window, the
    smallest state that preserves the semantics. The incremental
    counterpart of ``build_exact_index``/``build_minhash_index`` at span
    granularity.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    _span_shingles(df, id_col, text_col, k).select(
        F.col("__h").alias("h")
    ).distinct().write.mode(mode).parquet(f"{path}/hashes")
    # k RIDES THE INDEX (the recurring bug class: parameters re-passed at
    # query time silently produce false negatives on mismatch)
    df.sparkSession.createDataFrame([(int(k),)], "k int").write.mode(
        mode
    ).parquet(f"{path}/meta")


def _span_index_k(spark, index_path: str, k: int | None) -> int:
    """Read the window size the index was built with; a caller-passed k
    must match (a mismatch would silently report every real duplicate as
    clean — the false-negative failure mode)."""
    stored = spark.read.parquet(f"{index_path}/meta").first()["k"]
    if k is not None and k != stored:
        raise ValueError(
            f"span index at {index_path} was built with k={stored}; "
            f"refusing to query/update it with k={k}"
        )
    return int(stored)


def mark_spans_incremental(
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    k: int | None = None,
) -> DataFrame:
    """Maximal duplicated spans in NEW documents against (index ∪ the
    batch itself): a window is a duplicate if its hash exists in the
    persisted corpus index (EVERY batch occurrence marks — the kept copy
    lives in the prior corpus) or if it repeats within the batch (first
    batch occurrence kept, same policy as ``duplicate_spans``). The
    corpus is never re-read; the only big join is batch-shingles ⋈ index
    on the hash. Same output schema as ``duplicate_spans``.

    Call ``update_span_index`` afterwards to fold the batch's new hashes
    into the index for the next increment.
    """
    spark = new_docs.sparkSession
    k = _span_index_k(spark, index_path, k)
    idx = spark.read.parquet(f"{index_path}/hashes")
    # ONE scan of the batch shingles and ONE scan of the corpus-scale
    # index: the membership verdict is a flag on a single left join,
    # cached while the hit/miss branches both consume it
    j = _span_shingles(new_docs, id_col, text_col, k).join(
        idx.select(F.col("h").alias("__h"), F.lit(True).alias("__in")),
        "__h",
        "left",
    ).persist()
    try:
        hit = j.filter(F.col("__in").isNotNull())
        miss = j.filter(F.col("__in").isNull())
        dup_in_batch = (
            miss.groupBy("__h")
            .agg(
                F.count(F.lit(1)).alias("__n"),
                F.min(F.struct("__id", "pos")).alias("__keep"),
            )
            .filter(F.col("__n") > 1)
            .select("__h", "__keep")
        )
        marked_miss = miss.join(dup_in_batch, "__h").filter(
            (F.col("__id") != F.col("__keep.__id"))
            | (F.col("pos") != F.col("__keep.pos"))
        )
        marked = hit.select("__id", "pos").unionByName(
            marked_miss.select("__id", "pos")
        )
        # spans are small; materialize them so the cache can be released
        out = _merge_marked_spans(marked, k, id_col).localCheckpoint(eager=True)
    finally:
        j.unpersist()
    return out


def update_span_index(
    new_docs: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str,
    k: int | None = None,
) -> None:
    """Fold a processed batch's window hashes into the span index:
    appends only the hashes the index does not already hold, so the
    index stays a distinct set by construction (no rewrite of existing
    state — append-only, safe to run after every increment). The window
    size is read from the index metadata; an explicit mismatching ``k``
    raises instead of corrupting the index with mixed-size hashes."""
    spark = new_docs.sparkSession
    k = _span_index_k(spark, index_path, k)
    idx = spark.read.parquet(f"{index_path}/hashes")
    fresh = (
        _span_shingles(new_docs, id_col, text_col, k)
        .select(F.col("__h").alias("h"))
        .distinct()
        .join(idx, "h", "left_anti")
    )
    fresh.write.mode("append").parquet(f"{index_path}/hashes")


def ppjoin_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = DEFAULT_MAX_SHINGLE_FREQ,
    persist: bool = False,
) -> DataFrame:
    """Prefix-filtered Jaccard pair join (the PPJoin candidate scheme,
    Xiao et al., WWW'08): identical OUTPUT to ``ngram_jaccard_pairs`` —
    same schema, same values, pinned by test — but candidates are
    generated only from each document's PREFIX under the global
    rarest-first shingle order. The prefix-filter lemma guarantees any
    pair with J ≥ t shares a prefix shingle when each prefix keeps
    |d| − ⌈t·|d|⌉ + 1 elements, so recall is exact by construction.

    100 TB shape: posting lists shrink from every occurrence to prefix
    occurrences (≈ (1−t) of them, and the rare-first order makes the
    surviving lists the SHORT ones), so C(f,2) pair fan-out collapses;
    verification is pair-restricted — candidate pairs join back to the
    two full shingle sets and intersect JVM-side, never through a hot
    posting. The df-cut drops ubiquitous shingles from the sets entirely
    (exactly the existing operator's semantics, so results match).

    Trade: this plan shuffles the shingle table three times (df agg,
    rarest-first reorder, verify join) vs the postings plan's one — on
    corpora where pair fan-out is modest (like the local test corpus) the
    one-shuffle plan is faster; prefix filtering wins when near-dup
    density makes C(f,2) the dominant term. Both ship.
    """
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    sh = _shingle_table(df, id_col, text_col, n)
    dfreq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
    if max_shingle_freq is not None:
        dfreq = dfreq.filter(F.col("__df") <= max_shingle_freq)
    kept = sh.join(dfreq, "__sh")  # hot shingles leave the sets entirely
    docs = (
        kept.groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("__df", "__sh"))
            ).alias("__ord"),
        )
        .select(
            "__id",
            F.transform(F.col("__ord"), lambda s: s["__sh"]).alias("__set"),
        )
        .withColumn("__n", F.size("__set"))
    )
    if persist:
        # docs feeds the prefix explode AND both verification sides —
        # cache it like ngram_jaccard_pairs caches its postings
        from pyspark.storagelevel import StorageLevel

        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    # prefix under the rarest-first order: |d| - ceil(t*|d|) + 1 elements
    plen = (
        F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")).cast("int") + 1
    )
    prefix = docs.select(
        "__id", F.explode(F.slice(F.col("__set"), 1, plen)).alias("__sh")
    )
    postings = prefix.groupBy("__sh").agg(
        F.sort_array(F.collect_list("__id")).alias("__ids")
    )
    cand = (
        postings.select(F.explode(_posting_pairs(F.col("__ids"))).alias("__p"))
        .select("__p.id_a", "__p.id_b")
        .distinct()
    )
    a = docs.select(
        F.col("__id").alias("id_a"),
        F.col("__set").alias("__sa"),
        F.col("__n").alias("n_a"),
    )
    b = docs.select(
        F.col("__id").alias("id_b"),
        F.col("__set").alias("__sb"),
        F.col("__n").alias("n_b"),
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "n_common",
            F.size(F.array_intersect("__sa", "__sb")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "id_a", "id_b", "n_common",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            "jaccard",
        )
    )
