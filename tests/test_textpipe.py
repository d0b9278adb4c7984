"""Unit tests for the training-data text-pipeline operators added on top of
doc_stats: repetition signals, eval-set decontamination, PII redaction, and
domain-mixture sampling."""

from __future__ import annotations

from tdataframe_spark.functions.text import count_pii, redact_pii
from tdataframe_spark.ops.dedup import decontaminate
from tdataframe_spark.ops.textstats import mix_domains, repetition_signals


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_values(spark):
    df = _docs(
        spark,
        [
            (1, "a a a a"),            # 4 words, 1 distinct; bigrams: "a a" x3
            (2, "w x y z"),            # no repetition
            (3, "hi"),                 # shorter than n -> no grams
        ],
    )
    out = {
        r["doc_id"]: r
        for r in repetition_signals(df, "doc_id", "text", n=2).collect()
    }
    assert out[1]["n_words"] == 4
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["top_gram_frac"] == 1.0
    assert out[2]["dup_word_frac"] == 0.0
    # "w x","x y","y z" all distinct -> top fraction 1/3
    assert abs(out[2]["top_gram_frac"] - 1 / 3) < 1e-12
    assert out[3]["top_gram_frac"] == 0.0 and out[3]["dup_word_frac"] == 0.0


def test_decontaminate_flags_planted_overlap(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),   # shares trigram with eval 100
            (2, "completely unrelated words here"),
        ],
    )
    ev = _docs(spark, [(100, "quick brown fox trot")])
    out = decontaminate(corpus, ev, "doc_id", "text", n=3)
    rows = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert rows == {1: 1}  # only "quick brown fox" is shared
    # eval side is broadcast: the join must not shuffle the corpus shingles
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_redact_and_count_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@x.org ip 10.0.0.1 tel 22-555-0099 done")],
        "id long, t string",
    )
    row = df.select(
        redact_pii("t").alias("r"), count_pii("t").alias("n")
    ).first()
    assert row["r"] == "mail <EMAIL> ip <IP> tel <PHONE> done"
    assert row["n"] == 3


def test_bm25_ranking_and_determinism(spark):
    from tdataframe_spark.ops.search import bm25_topk

    docs = _docs(
        spark,
        [
            (1, "rare common common filler filler filler"),
            (2, "common filler filler filler filler filler"),
            (3, "filler only document nothing relevant here"),
            (4, "common common filler filler"),
        ],
    )
    out = bm25_topk(docs, ["rare", "common"], k=4).collect()
    ids = [r["id"] for r in out]
    assert 3 not in ids  # no query term -> no score
    # doc 1 holds the only 'rare' posting (idf max) plus 'common' -> top
    assert ids[0] == 1
    assert out[0]["n_terms_hit"] == 2
    # double-sum determinism: same scores on a different partitioning
    again = bm25_topk(docs.repartition(7), ["rare", "common"], k=4).collect()
    assert [(r["id"], r["score"]) for r in again] == [
        (r["id"], r["score"]) for r in out
    ]


def test_mix_domains_exact_ratios_and_determinism(spark):
    rows = [(i, "a") for i in range(100)] + [(i + 1000, "b") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # t = min(100//3, 10//1) = 10 -> keep 30 a's and 10 b's
    out = mix_domains(df, "source", {"a": 3, "b": 1}, "doc_id")
    got = out.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"a": 30, "b": 10}
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in mix_domains(df, "source", {"a": 3, "b": 1}, "doc_id").collect()
    )
    assert ids1 == ids2  # hash-ordered pick is deterministic
    # unlisted domains are dropped entirely
    df2 = df.union(spark.createDataFrame([(5000, "junk")], df.schema))
    out2 = mix_domains(df2, "source", {"a": 3, "b": 1}, "doc_id")
    assert out2.filter("source = 'junk'").count() == 0


def test_chunk_documents_invariants(spark):
    from tdataframe_spark.ops.textstats import chunk_documents

    words = [f"w{i}" for i in range(25)]
    df = _docs(
        spark,
        [
            (1, " ".join(words)),   # 25 words -> chunks at 0, 6, 12, 18
            (2, "a b"),             # shorter than chunk_size -> one chunk
            (3, "solo"),            # single word
        ],
    )
    out = chunk_documents(df, "doc_id", "text", chunk_size=8, overlap=2)
    rows = sorted(
        [(r["doc_id"], r["chunk_id"], r["chunk_text"]) for r in out.collect()]
    )
    d1 = [r for r in rows if r[0] == 1]
    # starts are 0, 6, 12, 18 (step = chunk_size - overlap = 6)
    assert [c for _, c, _ in d1] == [0, 1, 2, 3]
    # full coverage: every word appears in some chunk, in order
    seen = []
    for _, _, text in d1:
        seen.extend(w for w in text.split(" ") if w not in seen)
    assert seen == words
    # consecutive chunks share exactly `overlap` words
    first, second = d1[0][2].split(" "), d1[1][2].split(" ")
    assert first[-2:] == second[:2]
    # short docs yield exactly one chunk equal to the doc
    assert [r[2] for r in rows if r[0] == 2] == ["a b"]
    assert [r[2] for r in rows if r[0] == 3] == ["solo"]

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_size=4, overlap=4)


def test_ngram_lm_score_ranks_fluent_above_junk(spark):
    """A repeated-pattern corpus trains the LM; a document made of common
    bigrams must out-score a doc of never-repeated bigrams."""
    from pyspark.sql import Row
    from tdataframe_spark.ops.textstats import ngram_lm_score

    rows = [Row(doc_id=i, text="the cat sat on the mat") for i in range(20)]
    rows += [Row(doc_id=100, text="the cat sat on the mat"),
             Row(doc_id=101, text="zx qv jk wp mn bv"),
             Row(doc_id=102, text="one")]  # < 2 words → no bigrams
    df = spark.createDataFrame(rows)
    got = {r["doc_id"]: r["avg_logp"] for r in ngram_lm_score(df, "doc_id", "text").collect()}
    assert got[100] > got[101]  # fluent >> junk
    assert 102 not in got


def test_lm_train_apply_self_consistency(spark, tmp_path):
    """Scoring the training corpus against its own persisted LM must
    reproduce the one-shot self-trained scorer exactly."""
    from tdataframe_spark.ops.textstats import (
        lm_score_with,
        ngram_lm_score,
        train_bigram_lm,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "lm")
    train_bigram_lm(docs, "doc_id", "text", path)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in lm_score_with(docs, path, "doc_id", "text").collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
        for r in ngram_lm_score(docs, "doc_id", "text").collect()
    }
    assert got == want


def test_lm_apply_floors_unseen_and_streams(spark, tmp_path):
    """Out-of-domain text hits the Laplace floor (scores below any
    in-domain doc), and the scorer runs unchanged on a readStream
    (stateless projections + stream-static joins + update-mode fold)."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.textstats import lm_score_with, train_bigram_lm
    from tdataframe_spark.streaming import run_to_memory_sink

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text="the cat sat on the mat") for i in range(10)]
    )
    path = str(tmp_path / "lm2")
    train_bigram_lm(corpus, "doc_id", "text", path)

    probe = spark.createDataFrame([
        Row(doc_id=1, text="the cat sat on the mat"),
        Row(doc_id=2, text="qq ww ee rr tt yy"),  # fully unseen
    ])
    batch = {r["doc_id"]: r["avg_logp"]
             for r in lm_score_with(probe, path, "doc_id", "text").collect()}
    assert batch[1] > batch[2]

    src = str(tmp_path / "probe_in")
    probe.write.parquet(src)
    stream = spark.readStream.schema(probe.schema).parquet(src)
    name, q = run_to_memory_sink(
        lm_score_with(stream, path, "doc_id", "text"), mode="update"
    )
    try:
        got = {r["doc_id"]: r["avg_logp"]
               for r in spark.sql(f"select * from {name}").collect()}
        assert got == batch
    finally:
        q.stop()


def test_perplexity_buckets_ntile_and_approx_agree_on_extremes(spark):
    """Head/tail membership must be stable across the exact (ntile) and
    approx (percentile-cut) assignment paths; both must cover every doc
    exactly once with buckets in [1, 3]."""
    import pyspark.sql.functions as F

    from tdataframe_spark.ops.textstats import perplexity_buckets

    fluent = "the cat sat on the mat and the dog sat on the rug " * 5
    rows = (
        [(i, fluent + f"extra {i}", "en") for i in range(6)]
        + [(10 + i, f"zz{i} qq{i} jj{i} xx{i} ww{i} kk{i} vv{i}", "en")
           for i in range(6)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    exact = perplexity_buckets(docs, "doc_id", "text", "lang").toPandas()
    approx = perplexity_buckets(
        docs, "doc_id", "text", "lang", method="approx"
    ).toPandas()
    for out in (exact, approx):
        assert len(out) == 12
        assert set(out["bucket"]) <= {1, 2, 3}
    # fluent repeated docs score higher (head) than junk (tail) in both
    ex = exact.set_index("doc_id")["bucket"]
    ap = approx.set_index("doc_id")["bucket"]
    for i in range(6):
        assert ex[i] < ex[10 + i]
        # strict: a constant bucket assignment (e.g. cutpoints computed on
        # the wrong column) would satisfy <= with equality everywhere
        assert ap[i] < ap[10 + i]


def test_dedup_keep_best_one_keeper_per_cluster(spark):
    """Exactly one keep per cluster; singletons keep themselves; the
    keeper is the highest-quality member (ties to lowest id)."""
    import pyspark.sql.functions as F

    from tdataframe_spark.ops.dedup import dedup_keep_best

    long_doc = "many words here repeated for a better length score " * 10
    docs = spark.createDataFrame(
        [
            (1, long_doc),          # cluster {1,2}: 1 is longer → kept
            (2, long_doc[:100]),
            (3, "a lone document with nothing like it"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = dedup_keep_best(docs, pairs, "doc_id").toPandas()
    assert len(out) == 3
    per_cluster = out.groupby("cluster")["keep"].sum()
    assert (per_cluster == 1).all()
    kept = set(out[out["keep"] == 1]["doc_id"])
    assert kept == {1, 3}


def _reference_bpe(word_freqs: dict, n_merges: int):
    """Pure-Python Sennrich BPE on a word-frequency table (test oracle)."""
    vocab = {tuple(list(w) + ["▁"]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = {}
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        top = max(pairs.values())
        best = min(p for p, n in pairs.items() if n == top)
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = f
        vocab = new_vocab
    return merges, {"".join(k).replace("▁", ""): list(k) for k in vocab}


def test_bpe_matches_reference_implementation(spark):
    """Distributed BPE must learn the same ordered merge list and the same
    final segmentations as a driver-side reference implementation."""
    from tdataframe_spark.ops.bpe import bpe_segment_table, train_bpe

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got_merges = train_bpe(docs, n_merges=8)
    want_merges, want_segs = _reference_bpe(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 8
    )
    assert got_merges == want_merges
    segs = {
        r["word"]: list(r["syms"])
        for r in bpe_segment_table(docs, got_merges).collect()
    }
    assert set(segs) == set(want_segs)  # completeness, not just agreement
    for w, syms in segs.items():
        assert syms == want_segs[w], (w, syms, want_segs[w])


def test_bpe_index_roundtrip_equals_direct(spark, tmp_path):
    """build_bpe_index → bpe_tokenize_indexed must tokenize EXACTLY like
    the in-memory train→segment→tokenize pipeline, and the persisted
    merge table must reload in rank order (merge ORDER is semantics —
    file order is not a contract)."""
    from tdataframe_spark.ops.bpe import (
        bpe_segment_table,
        bpe_tokenize,
        bpe_tokenize_indexed,
        build_bpe_index,
        load_bpe_merges,
        train_bpe,
    )

    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame(
        [(1, text), (2, "lowest newest unseen")], "doc_id long, text string"
    )
    path = str(tmp_path / "bpeidx")
    merges = build_bpe_index(docs, path, n_merges=8)
    assert load_bpe_merges(spark, path) == merges == train_bpe(docs, n_merges=8)
    direct = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_tokenize(
            docs, bpe_segment_table(docs, merges)
        ).collect()
    }
    indexed = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_tokenize_indexed(docs, path).collect()
    }
    assert indexed == direct
    # new batch with an OOV word tokenizes through the persisted table
    batch = spark.createDataFrame([(3, "low zzz")], "doc_id long, text string")
    out = {r["doc_id"]: list(r["tokens"]) for r in
           bpe_tokenize_indexed(batch, path).collect()}
    assert out[3][:1] != [] and "z" in "".join(out[3])


def test_bpe_tokenize_oov_falls_back_to_chars(spark):
    """Words absent from the segmentation table tokenize as raw character
    symbols (the subword OOV contract); token order follows word order."""
    from tdataframe_spark.ops.bpe import bpe_segment_table, bpe_tokenize, train_bpe

    train = spark.createDataFrame(
        [(1, "aaa aaa aaa bbb bbb")], "doc_id long, text string"
    )
    merges = train_bpe(train, n_merges=4)
    seg = bpe_segment_table(train, merges)
    new = spark.createDataFrame([(9, "aaa zz")], "doc_id long, text string")
    out = bpe_tokenize(new, seg).collect()[0]
    toks = list(out["tokens"])
    assert toks[0].startswith("aaa")  # learned merge applied
    assert toks[-3:] == ["z", "z", "▁"]  # OOV char fallback
    assert out["n_tokens"] == len(toks)


def test_group_split_is_leakage_free_and_stable(spark):
    """All rows of a group land on one side; assignment is a pure function
    of the key (subset recomputation agrees with the full run)."""
    from tdataframe_spark.ops.textstats import group_split

    rows = [(i, f"g{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = group_split(df, "grp", eval_fraction=0.3).toPandas()
    sides = out.groupby("grp")["split"].nunique()
    assert (sides == 1).all()
    # stability under incremental arrival: a disjoint subset gets the
    # same per-group assignment
    sub = group_split(
        df.filter("id >= 35"), "grp", eval_fraction=0.3
    ).toPandas()
    full_map = dict(zip(out["grp"], out["split"]))
    assert all(full_map[g] == s for g, s in zip(sub["grp"], sub["split"]))


def test_group_split_bucket_cut_rounds_exact_fractions():
    """0.29 of 1000 buckets means 290 eval buckets — int() truncation on
    289.99999999999994 gave 289 (a 28.9% share for a requested 29%)."""
    from tdataframe_spark.ops.textstats import _eval_bucket_cut

    assert _eval_bucket_cut(1000, 0.29) == 290
    assert _eval_bucket_cut(1000, 0.2) == 200
    assert _eval_bucket_cut(1000, 0.0) == 0
    assert _eval_bucket_cut(1000, 1.0) == 1000
    assert _eval_bucket_cut(10, 0.29) == 3


def test_retrieval_metrics_hand_computed(spark):
    """recall/MRR/nDCG against hand-computed values, including a query
    with zero hits and one with a partial hit set."""
    import math

    from tdataframe_spark.ops.search import retrieval_metrics

    results = spark.createDataFrame(
        [
            (1, "a", 1), (1, "x", 2), (1, "b", 3),
            (2, "y", 1), (2, "z", 2),
        ],
        "query_id long, neighbor_id string, rnk int",
    )
    truth = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "q")],
        "query_id long, neighbor_id string",
    )
    out = {
        r["query_id"]: r
        for r in retrieval_metrics(results, truth, k=3).collect()
    }
    r1 = out[1]
    assert r1["n_rel"] == 3 and r1["n_hits"] == 2
    assert abs(r1["recall_at_k"] - 2 / 3) < 1e-9
    assert r1["mrr_at_k"] == 1.0
    dcg = round(1 / math.log2(2), 9) + round(1 / math.log2(4), 9)
    idcg = sum(round(1 / math.log2(i + 1), 9) for i in (1, 2, 3))
    assert abs(r1["ndcg_at_k"] - round(dcg / idcg, 9)) < 1e-9
    r2 = out[2]
    assert (r2["n_hits"], r2["recall_at_k"], r2["mrr_at_k"], r2["ndcg_at_k"]) == (
        0, 0.0, 0.0, 0.0,
    )


def test_weighted_sample_monotone_and_deterministic(spark):
    """Inclusion is monotone in weight (same id, higher weight can only
    add it) and byte-stable across runs and partitionings."""
    from tdataframe_spark.ops.textstats import weighted_sample

    rows = [(i, 0.1 if i % 2 else 0.9) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, w double")
    kept = weighted_sample(df, "w", rate=1.0, id_col="id").toPandas()
    hi = (kept["w"] > 0.5).sum()
    lo = (kept["w"] < 0.5).sum()
    assert hi > lo * 3  # ~9x inclusion probability
    again = weighted_sample(
        df.repartition(13), "w", rate=1.0, id_col="id"
    ).toPandas()
    assert sorted(kept["id"]) == sorted(again["id"])
    # monotone: everything kept at rate r stays kept at rate 2r
    bigger = weighted_sample(df, "w", rate=2.0, id_col="id").toPandas()
    assert set(kept["id"]) <= set(bigger["id"])


def test_bpe_handles_quotes_and_backslashes(spark):
    """Merge symbols are data, not SQL: words containing backslashes and
    quotes must train and segment without parse errors."""
    from tdataframe_spark.ops.bpe import bpe_segment_table, train_bpe

    docs = spark.createDataFrame(
        [(1, "a\\b a\\b a\\b it's it's it's")], "doc_id long, text string"
    )
    merges = train_bpe(docs, n_merges=4)
    assert merges, merges
    segs = {r["word"]: list(r["syms"]) for r in bpe_segment_table(docs, merges).collect()}
    assert "a\\b" in segs and "it's" in segs


def test_bpe_tokenize_keeps_empty_docs(spark):
    """Row accounting: empty/whitespace-only docs come back with zero
    tokens instead of vanishing."""
    from tdataframe_spark.ops.bpe import bpe_segment_table, bpe_tokenize, train_bpe

    train = spark.createDataFrame(
        [(1, "aa aa aa"), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    merges = train_bpe(train, n_merges=2)
    out = {r["doc_id"]: r for r in bpe_tokenize(train, bpe_segment_table(train, merges)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["n_tokens"] == 0 and list(out[2]["tokens"]) == []
    assert out[3]["n_tokens"] == 0


def test_bpe_tokenize_streams(spark, tmp_path):
    """bpe_tokenize's claim: with a static segment table, tokenization runs
    unchanged on a readStream (stateless projections + stream-static join +
    ONE update-mode aggregation) and matches the batch result."""
    from tdataframe_spark.ops.bpe import bpe_segment_table, bpe_tokenize, train_bpe
    from tdataframe_spark.streaming import run_to_memory_sink

    train = spark.createDataFrame(
        [(1, "aa bb aa bb aa bb"), (2, "aa aa"), (3, "")],
        "doc_id long, text string",
    )
    merges = train_bpe(train, n_merges=3)
    seg = bpe_segment_table(train, merges)
    batch = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_tokenize(train, seg).collect()
    }
    assert set(batch) == {1, 2, 3} and batch[3][1] == 0

    src = str(tmp_path / "bpe_in")
    train.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    name, q = run_to_memory_sink(bpe_tokenize(stream, seg), mode="update")
    try:
        got = {
            r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
            for r in spark.sql(f"select * from {name}").collect()
        }
        assert got == batch
    finally:
        q.stop()


def test_phrase_search_consecutive_only(spark):
    """Phrase hits require consecutive positions; repeated-word phrases
    and multiple occurrences count correctly."""
    from tdataframe_spark.ops.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "big red fox and big red dog"),
            (2, "red big fox"),               # words present, wrong order
            (3, "big nothing red"),            # not consecutive
            (4, "big red big red big red"),    # 3 occurrences
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_occurrences"], r["first_pos"])
        for r in phrase_search(docs, "big red").collect()
    }
    assert out == {1: (2, 0), 4: (3, 0)}
    three = {
        r["doc_id"]: r["n_occurrences"]
        for r in phrase_search(docs, "big red fox").collect()
    }
    assert three == {1: 1}


def test_collocations_finds_planted_pair(spark):
    """A word pair that always co-occurs ranks above pairs of independent
    common words; pairs under the count floor are excluded."""
    import itertools

    from tdataframe_spark.ops.textstats import collocations

    filler = ["w%d" % (i % 9) for i in range(200)]
    text = " ".join(
        itertools.chain.from_iterable(
            (["hong", "kong"] if i % 10 == 0 else [filler[i]])
            for i in range(200)
        )
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = collocations(docs, min_count=3, top_k=5).collect()
    assert (out[0]["w1"], out[0]["w2"]) == ("hong", "kong")
    assert out[0]["pmi"] > 0
    rare = collocations(docs, min_count=100, top_k=5).collect()
    assert all(r["n_pair"] >= 100 for r in rare)


def test_stopword_ratio_counts_adjacent_markers(spark):
    """'the the the cat' has 3 marker occurrences; the old non-overlapping
    regex counted 2."""
    import pyspark.sql.functions as F

    from tdataframe_spark.functions.text import stopword_ratio

    df = spark.createDataFrame([("the the the cat",)], "t string")
    r = df.select(stopword_ratio("t", ["the"]).alias("r")).first()["r"]
    assert r == 0.75


def test_mix_domains_handles_quoted_domain_names(spark):
    from tdataframe_spark.ops.textstats import mix_domains

    rows = [(i, "men's wear") for i in range(20)] + [
        (100 + i, "plain") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mix_domains(df, "source", {"men's wear": 2, "plain": 1}, "doc_id")
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert got == {"men's wear": 20, "plain": 10}


def test_hybrid_topk_rrf_fusion_hand_computed(spark):
    """RRF = 1/(c+lex_rank) + 1/(c+dense_rank) over the union of both legs,
    NULL rank contributing 0 — pinned on a corpus where the lexical and
    dense orderings disagree and each leg retrieves a doc the other misses."""
    from tdataframe_spark.ops.search import hybrid_topk

    docs = _docs(
        spark,
        [
            (1, "rare common common filler filler filler"),
            (2, "common filler filler filler filler filler"),
            (3, "filler only document nothing relevant here"),
            (4, "common common filler filler"),
        ],
    )
    # embeddings chosen so cosine vs doc 1's vector ranks 3 > 4 > 2 —
    # doc 3 (no query terms, lexical miss) is the dense leg's best hit
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.9, 0.1]),
            (4, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_topk(
        docs, emb, ["rare", "common"], 1, k=4, n_candidates=3, rrf_c=60
    ).collect()
    got = {r["id"]: (r["lex_rank"], r["dense_rank"], r["rrf_score"]) for r in out}
    # lexical: 1 > 4 > 2 (bm25 test above); dense vs v1: 3 > 4 > 2
    assert got[1][:2] == (1, None)
    assert got[3][:2] == (None, 1)
    assert got[4][:2] == (2, 2)
    assert got[2][:2] == (3, 3)
    assert got[4][2] == round(2 * (1.0 / 62), 9)
    assert got[1][2] == round(1.0 / 61, 9)
    # fused order: doc 4 (both legs) beats either single-leg rank-1 doc
    assert [r["id"] for r in out][0] == 4


def test_tfidf_cosine_pairs_matches_reference(spark):
    """TF-IDF cosine against a from-scratch python reference implementing
    the same conventions (9-dp ln, term-ordered folds) — exact equality;
    plus the df-cut drops a ubiquitous term and partitioning invariance
    holds."""
    import math

    from tdataframe_spark.ops.dedup import tfidf_cosine_pairs

    corpus = {
        1: "aa bb aa cc",
        2: "aa bb bb dd",
        3: "cc dd cc aa",
        4: "ee ff ee gg",
    }
    docs = _docs(spark, list(corpus.items()))

    def reference(max_df=None):
        tf = {
            (i, t): txt.split().count(t)
            for i, txt in corpus.items()
            for t in set(txt.split())
        }
        n = len(corpus)
        df_ = {}
        for (_, t) in tf:
            df_[t] = df_.get(t, 0) + 1
        terms = {t for t in df_ if max_df is None or df_[t] <= max_df}
        w = {
            (i, t): c * round(math.log(1.0 + n / df_[t]), 9)
            for (i, t), c in tf.items()
            if t in terms
        }
        def norm(i):
            acc = 0.0
            for t in sorted(t for (j, t) in w if j == i):
                acc = acc + w[(i, t)] * w[(i, t)]
            return math.sqrt(acc)
        out = {}
        ids = sorted(corpus)
        for x in ids:
            for y in ids:
                if x >= y:
                    continue
                shared = sorted(
                    t for (j, t) in w if j == x and (y, t) in w
                )
                if not shared:
                    continue
                acc = 0.0
                for t in shared:
                    acc = acc + w[(x, t)] * w[(y, t)]
                out[(x, y)] = round(acc / (norm(x) * norm(y)), 9)
        return out

    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(docs, "doc_id", "text", threshold=0.0).collect()
    }
    assert got == reference()
    # df-cut: 'aa' appears in 3 docs; max_df=2 must remove its contribution
    cut = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(
            docs, "doc_id", "text", threshold=0.0, max_df=2
        ).collect()
    }
    assert cut == reference(max_df=2) and cut != got
    # partitioning invariance (ordered folds)
    again = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in tfidf_cosine_pairs(
            docs.repartition(7), "doc_id", "text", threshold=0.0
        ).collect()
    }
    assert again == got


def test_dsir_weights_ranks_target_like_docs_higher(spark):
    """Docs sharing the target corpus's vocabulary must get strictly
    larger log weights than docs from a disjoint vocabulary; NULL text
    rides with zero grams and weight 0; repartitioning never changes a
    bit of the output."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.textstats import dsir_weights

    target = spark.createDataFrame(
        [Row(doc_id=f"t{i}", text="the quick brown fox jumps over the lazy dog")
         for i in range(5)],
        "doc_id string, text string",
    )
    raw = spark.createDataFrame(
        [
            Row(doc_id="likes", text="the quick brown fox naps"),
            Row(doc_id="hates", text="zzz qqq www eee rrr"),
            Row(doc_id="nil", text=None),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dsir_weights(raw, target, "doc_id", "text", n_buckets=512).collect()
    }
    assert set(out) == {"likes", "hates", "nil"}
    assert out["likes"]["log_weight"] > out["hates"]["log_weight"]
    assert out["nil"]["n_grams"] == 0 and out["nil"]["log_weight"] == 0.0
    # 5 unigrams + 4 bigrams
    assert out["likes"]["n_grams"] == 9
    again = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(
            raw.repartition(7), target.repartition(3), "doc_id", "text", n_buckets=512
        ).collect()
    }
    assert again == {i: r["log_weight"] for i, r in out.items()}


def test_dsir_weights_rejects_bad_args(spark):
    import pytest
    from pyspark.sql import Row

    from tdataframe_spark.ops.textstats import dsir_weights

    df = spark.createDataFrame([Row(doc_id="a", text="x")])
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(df, df, "doc_id", "text", n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        dsir_weights(df, df, "doc_id", "text", alpha=0.0)


def test_dsir_sample_gumbel_topk_properties(spark):
    """Gumbel top-k selection: n rows come back, keys are a pure function
    of (id, seed) — same seed = identical sample, different seed =
    different noise — and a strongly up-weighted doc family dominates the
    sample; the plan is a TakeOrdered, not a global sort."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.textstats import dsir_sample

    rows = [Row(doc_id=f"good{i:03d}", log_weight=10.0) for i in range(50)]
    rows += [Row(doc_id=f"bad{i:03d}", log_weight=-10.0) for i in range(50)]
    w = spark.createDataFrame(rows, "doc_id string, log_weight double")
    got = dsir_sample(w, "doc_id", n=20, seed="s1")
    sel = [r["doc_id"] for r in got.collect()]
    assert len(sel) == 20
    # Δ log-weight of 20 dwarfs Gumbel noise: the good family must win
    assert all(d.startswith("good") for d in sel)
    assert sel == [r["doc_id"] for r in dsir_sample(w, "doc_id", n=20, seed="s1").collect()]
    other = [r["doc_id"] for r in dsir_sample(w, "doc_id", n=20, seed="s2").collect()]
    assert set(sel) != set(other)  # 50-choose-20 collision ~ impossible
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    import pytest

    with pytest.raises(ValueError, match="temperature"):
        dsir_sample(w, "doc_id", n=5, temperature=0.0)
    with pytest.raises(ValueError, match="n must be"):
        dsir_sample(w, "doc_id", n=0)


def test_pack_bins_ffd_invariants(spark):
    """FFD bin packing: every doc lands in exactly one bin, no bin
    exceeds the budget (except flagged single-doc overflows), bin usage
    is within the FFD guarantee of optimal per shard, string ids pack
    too, and repartitioning never changes an assignment."""
    import math

    from pyspark.sql import Row

    from tdataframe_spark.ops.textstats import pack_bins

    rows = [Row(doc_id=f"d{i:03d}", n_tok=(i * 37) % 90 + 10) for i in range(200)]
    rows.append(Row(doc_id="huge", n_tok=500))  # > budget -> overflow bin
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    out = pack_bins(df, "doc_id", "n_tok", budget=128, n_shards=4).collect()
    assert len(out) == 201 and len({r["id"] for r in out}) == 201
    assert {r["id"] for r in out if r["overflow"]} == {"huge"}
    fill = {}
    for r in out:
        if not r["overflow"]:
            fill[(r["shard"], r["bin"])] = fill.get((r["shard"], r["bin"]), 0) + r["tokens"]
    assert fill and all(v <= 128 for v in fill.values())
    # FFD uses at most (11/9)·OPT + 1 bins; OPT >= ceil(total/budget)
    by_shard = {}
    for r in out:
        if not r["overflow"]:
            by_shard.setdefault(r["shard"], []).append(r["tokens"])
    for shard, toks in by_shard.items():
        used = len({k for k in fill if k[0] == shard})
        opt_floor = math.ceil(sum(toks) / 128)
        assert used <= math.ceil(11 * opt_floor / 9) + 1, (shard, used, opt_floor)
    again = {
        (r["id"], r["shard"], r["bin"])
        for r in pack_bins(
            df.repartition(13), "doc_id", "n_tok", budget=128, n_shards=4
        ).collect()
    }
    assert again == {(r["id"], r["shard"], r["bin"]) for r in out}
    import pytest

    with pytest.raises(ValueError, match="budget"):
        pack_bins(df, "doc_id", "n_tok", budget=0)


def test_corpus_divergence_ranks_drifted_group(spark):
    """A group with alien vocabulary must score a larger JS divergence
    than groups drawn from the shared vocabulary; all values live in
    [0, ln 2]; NULL-text rows are ignored."""
    import math

    from pyspark.sql import Row

    from tdataframe_spark.ops.textstats import corpus_divergence

    rows = [Row(src="a", text="the cat sat on the mat again today")] * 10
    rows += [Row(src="b", text="the dog sat on the rug again today")] * 10
    rows += [Row(src="weird", text="zzz qqq www eee rrr ttt yyy uuu")] * 10
    rows += [Row(src="a", text=None)]
    df = spark.createDataFrame(rows, "src string, text string")
    got = {
        r["src"]: (r["n_tokens"], r["js_div"])
        for r in corpus_divergence(df, "src", "text", n_buckets=512).collect()
    }
    assert set(got) == {"a", "b", "weird"}
    assert got["a"][0] == 80  # the NULL row contributed no tokens
    assert all(0.0 <= js <= math.log(2) + 1e-9 for _, js in got.values())
    assert got["weird"][1] > got["a"][1] and got["weird"][1] > got["b"][1]
    import pytest

    with pytest.raises(ValueError, match="n_buckets"):
        corpus_divergence(df, "src", "text", n_buckets=0)


def test_pack_bins_null_tokens_pack_as_zero(spark):
    """NULL token counts (NULL-text docs) must pack as zero-width rows
    instead of crashing the Arrow worker on int(NaN)."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.textstats import pack_bins

    df = spark.createDataFrame(
        [Row(doc_id="a", n_tok=50), Row(doc_id="b", n_tok=None)],
        "doc_id string, n_tok long",
    )
    out = {r["id"]: r for r in pack_bins(df, "doc_id", "n_tok", budget=64).collect()}
    assert set(out) == {"a", "b"}
    assert out["b"]["tokens"] == 0 and not out["b"]["overflow"]


def test_text_index_roundtrip_equals_oneshot(spark, tmp_path):
    """query_text_index over a persisted index must reproduce the one-shot
    bm25_topk EXACTLY (same ordered fold, same stats), and the postings
    scan must carry the term filter into the parquet source."""
    from tdataframe_spark.ops.search import (
        bm25_topk,
        build_text_index,
        query_text_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    idx = str(tmp_path / "lexidx")
    build_text_index(docs, idx)
    terms = ["merge", "hash", "data"]
    want = [
        (r["id"], r["score"], r["n_terms_hit"])
        for r in bm25_topk(docs, terms, k=10).collect()
    ]
    q = query_text_index(spark, idx, terms, k=10)
    got = [(r["id"], r["score"], r["n_terms_hit"]) for r in q.collect()]
    assert got == want and len(got) == 10
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(term" in plan.replace("\n", " ")


def test_encode_and_target_encode_semantics(spark):
    """Categorical ids follow (freq desc, value asc); NULL categories get
    NULL ids. LOO target encoding: a category's row never sees its own
    target; NULL targets fall back to the plain smoothed encoding;
    unseen-category rows get the pure prior; alpha=0 singleton falls
    back to the global mean instead of NULL."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.features import encode_categorical, target_encode

    df = spark.createDataFrame(
        [Row(k="b")] * 3 + [Row(k="a")] * 3 + [Row(k="c")] + [Row(k=None)],
        "k string",
    )
    ids = {r["k"]: r["k_id"] for r in encode_categorical(df, "k").collect()}
    # ties (a,b both 3) break by value asc
    assert ids == {"a": 0, "b": 1, "c": 2, None: None}

    rows = [
        Row(i=1, k="x", y=10.0),
        Row(i=2, k="x", y=20.0),
        Row(i=3, k="x", y=None),   # NULL target: non-LOO encoding
        Row(i=4, k=None, y=5.0),   # NULL category: pure prior
        Row(i=5, k="solo", y=7.0),
    ]
    d2 = spark.createDataFrame(rows, "i long, k string, y double")
    gm = (10 + 20 + 5 + 7) / 4
    a = 2.0
    out = {
        r["i"]: r["k_te"]
        for r in target_encode(d2, "k", "y", alpha=a).collect()
    }
    assert abs(out[1] - (20 + a * gm) / (1 + a)) < 1e-12   # own 10 excluded
    assert abs(out[2] - (10 + a * gm) / (1 + a)) < 1e-12
    assert abs(out[3] - (30 + a * gm) / (2 + a)) < 1e-12   # NULL y: no LOO
    assert abs(out[4] - gm) < 1e-12
    assert abs(out[5] - (0 + a * gm) / (0 + a)) < 1e-12    # singleton LOO
    # alpha=0 singleton: 0/0 falls back to the prior, never NULL
    out0 = {
        r["i"]: r["k_te"]
        for r in target_encode(d2, "k", "y", alpha=0.0).collect()
    }
    assert abs(out0[5] - gm) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        target_encode(d2, "k", "y", alpha=-1.0)


def test_encode_categorical_cardinality_guard_raises(spark):
    """A column whose distinct count exceeds max_vocab must RAISE (the
    in-plan guard), not silently single-task-sort an unbounded
    vocabulary; under the cap the same data encodes fine."""
    import pytest
    from pyspark.sql import functions as F

    from tdataframe_spark.ops.features import encode_categorical

    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(Exception, match="encode_categorical|ASSERT"):
        encode_categorical(df, "k", max_vocab=50).collect()
    ok = encode_categorical(df, "k", max_vocab=200).collect()
    assert sorted(r["k_id"] for r in ok) == list(range(100))


def test_hash_features_feeds_logreg(spark):
    """Hashed features: correct buckets/sums vs a python reference
    (collisions included), NULLs contribute nothing, and the vectors are
    good enough to train a separable classifier end-to-end — the
    tabular → logreg bridge."""
    import hashlib

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from tdataframe_spark.ops.classify import logreg_score, logreg_train
    from tdataframe_spark.ops.features import hash_features

    def ph(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    dim = 32
    rows = [Row(i=1, color="red", size="xl", amount=2.5),
            Row(i=2, color=None, size="xl", amount=None)]
    df = spark.createDataFrame(rows, "i long, color string, size string, amount double")
    got = {r["i"]: list(r["features"]) for r in hash_features(
        df, ["color", "size"], ["amount"], dim=dim
    ).collect()}
    ref = [0.0] * dim
    ref[ph("color=red") % dim] += 1.0
    ref[ph("size=xl") % dim] += 1.0
    ref[ph("amount") % dim] += 2.5
    assert got[1] == ref
    ref2 = [0.0] * dim
    ref2[ph("size=xl") % dim] += 1.0
    assert got[2] == ref2

    # end-to-end: label perfectly determined by a categorical -> logreg
    # trained on hashed features separates it
    data = spark.createDataFrame(
        [Row(i=i, cat=("pos" if i % 2 else "neg"), label=(i % 2))
         for i in range(200)],
        "i long, cat string, label int",
    )
    feats = hash_features(data, ["cat"], dim=16, out_col="embedding")
    model = logreg_train(feats, "embedding", "label", positive=1, n_iter=40)
    scored = logreg_score(feats, model, "i", "embedding")
    acc = scored.join(data, "i").filter(
        ((F.col("prob") > 0.5).cast("int")) == F.col("label")
    ).count()
    assert acc == 200
    import pytest

    with pytest.raises(ValueError, match="dim"):
        hash_features(df, ["color"], dim=0)
    with pytest.raises(ValueError, match="at least one"):
        hash_features(df, [], None)
    with pytest.raises(ValueError, match="unknown method"):
        hash_features(df, ["color"], method="Arrow")


def test_hash_features_arrow_path_is_bit_identical(spark):
    """The Arrow scatter path (O(#cols) per row — the large-dim strategy)
    must produce BIT-identical vectors to the JVM expression path on
    mixed cat/num data with NULLs and int-typed categoricals, and
    method='auto' must route wide dims to Arrow (plan shows the Python
    map stage)."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.features import hash_features
    from tdataframe_spark.plans.inspect import explain_str

    rows = [
        Row(i=1, color="red", code=7, amount=2.5),
        Row(i=2, color=None, code=None, amount=-1.25),
        Row(i=3, color="blue", code=7, amount=None),
        # NaN numeric: both paths must treat it as missing — the JVM path
        # once added it, poisoning the bucket sum to NaN while Arrow masked
        Row(i=4, color="red", code=3, amount=float("nan")),
    ]
    # coalesce(1): the NULL must share an Arrow batch with the int values
    # — pandas then promotes the column to float64, and a Python-side
    # str() would hash 'code=7.0' instead of Spark's 'code=7' (the
    # partition-dependent bug the JVM-side CAST fixed)
    df = spark.createDataFrame(
        rows, "i long, color string, code int, amount double"
    ).coalesce(1)
    for dim in (16, 700):
        jvm = {r["i"]: list(r["features"]) for r in hash_features(
            df, ["color", "code"], ["amount"], dim=dim, method="jvm"
        ).collect()}
        arrow = {r["i"]: list(r["features"]) for r in hash_features(
            df, ["color", "code"], ["amount"], dim=dim, method="arrow"
        ).collect()}
        assert jvm == arrow, dim
        assert all(v == v for vec in jvm.values() for v in vec), "NaN leaked"
    auto_wide = hash_features(df, ["color"], dim=700)
    assert "MapInPandas" in explain_str(auto_wide, "simple")
    auto_narrow = hash_features(df, ["color"], dim=64)
    assert "MapInPandas" not in explain_str(auto_narrow, "simple")


def test_shard_shuffle_deterministic_permutation(spark):
    """shard_shuffle: (shard, pos) is a pure function of (seed, id) —
    identical under repartitioning; pos is a dense 0..n_s-1 ranking per
    shard; shards are hash-balanced; a different seed yields a different
    permutation; n_shards validates."""
    import pytest
    from tdataframe_spark.ops.textstats import shard_shuffle

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    a = sorted(map(tuple, shard_shuffle(df, "doc_id", 8, seed=1).collect()))
    b = sorted(
        map(tuple, shard_shuffle(df.repartition(13), "doc_id", 8, seed=1).collect())
    )
    assert a == b
    by_shard = {}
    for _, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
        assert 2000 / 8 * 0.6 < len(positions) < 2000 / 8 * 1.4
    c = sorted(map(tuple, shard_shuffle(df, "doc_id", 8, seed=2).collect()))
    assert c != a
    with pytest.raises(ValueError, match="n_shards"):
        shard_shuffle(df, "doc_id", 0)


def test_shard_shuffle_scale_dial_enforced(spark):
    """r8-VERDICT: n_shards must scale with the corpus, and the dial is
    enforced — n_shards=None derives ceil(n/target_shard_rows) from a
    cheap count (and equals the explicit call bit-for-bit); an explicit
    n_shards that would give a shard > 4x target raises loudly;
    target_shard_rows=None skips the count for caller-audited sizing."""
    import pytest
    from tdataframe_spark.ops.textstats import shard_shuffle

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    derived = sorted(map(tuple, shard_shuffle(
        df, "doc_id", seed=1, target_shard_rows=250
    ).collect()))
    explicit = sorted(map(tuple, shard_shuffle(
        df, "doc_id", 8, seed=1
    ).collect()))
    assert derived == explicit  # ceil(2000/250) = 8, identical permutation
    with pytest.raises(ValueError, match="giant sort task"):
        shard_shuffle(df, "doc_id", 1, target_shard_rows=250)
    # escape hatch: caller-audited sizing, no count, no guard
    one = shard_shuffle(df, "doc_id", 1, target_shard_rows=None)
    assert one.where("shard = 0").count() == 2000
    with pytest.raises(ValueError, match="target_shard_rows"):
        shard_shuffle(df, "doc_id", None, target_shard_rows=None)
