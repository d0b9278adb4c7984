"""F2/F3 array-of-struct semantics (the reference's physics shape) and
hypothesis property tests (a layer the reference's suite lacks)."""

import math
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from tdataframe_spark import Frame


# ---------------------------------------------------------------------------
# F3 tracks_tree: define(tracks_n) → filter → define(tracks_pts via
# transform) → flattened histogram (mirrors
# /root/reference/tests/tdf002_dataModel.cxx:82-105)


@pytest.fixture(scope="module")
def tracks_frame(spark):
    rng = random.Random(1)
    rows = []
    for _ in range(50):
        n = rng.randint(0, 12)
        tracks = [
            Row(
                x=rng.gauss(0, 10),
                y=rng.gauss(0, 10),
                z=rng.gauss(0, 1),
                E=abs(rng.gauss(50, 10)),
            )
            for _ in range(n)
        ]
        rows.append(Row(tracks=tracks))
    schema = "tracks array<struct<x: double, y: double, z: double, E: double>>"
    return Frame(spark.createDataFrame(rows, schema=schema)), rows


def test_tracks_define_filter_histo(tracks_frame):
    fr, rows = tracks_frame
    chain = (
        fr.define("tracks_n", F.size("tracks"))
        .filter("tracks_n > 2")
        .define(
            "tracks_pts",
            F.transform("tracks", lambda t: F.sqrt(t.x * t.x + t.y * t.y)),
        )
    )
    expect_rows = [r for r in rows if len(r.tracks) > 2]
    assert chain.count().get() == len(expect_rows)

    # flattened aggregate over the derived array column (§1.3 semantics)
    pts = [
        math.sqrt(t.x * t.x + t.y * t.y) for r in expect_rows for t in r.tracks
    ]
    assert chain.mean("tracks_pts").get() == pytest.approx(
        sum(pts) / len(pts), rel=1e-12
    )
    hist = chain.histo("tracks_pts", nbins=16, lo=0.0, hi=40.0).get()
    in_range = [p for p in pts if 0.0 <= p < 40.0]
    assert sum(b[3] for b in hist) == len(in_range)


def test_struct_field_aggregate(tracks_frame):
    fr, rows = tracks_frame
    # max energy across all tracks of all events: flattened max over a
    # struct-field projection
    got = (
        fr.define("energies", F.transform("tracks", lambda t: t.E))
        .max("energies")
        .get()
    )
    expect = max(t.E for r in rows for t in r.tracks)
    assert got == pytest.approx(expect, rel=1e-12)


# ---------------------------------------------------------------------------
# property-based invariants


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=60
    ),
    nbins=st.integers(min_value=1, max_value=32),
)
def test_histo_partition_of_rows(spark, vals, nbins):
    """Auto-range histogram is a partition: bin counts sum to row count,
    edges are monotone, every bin has lo < hi."""
    fr = Frame(spark.createDataFrame([Row(x=float(v)) for v in vals]))
    hist = fr.histo("x", nbins=nbins).get()
    assert sum(b[3] for b in hist) == len(vals)
    assert all(b[1] < b[2] for b in hist)
    for a, b in zip(hist, hist[1:]):
        assert a[2] == pytest.approx(b[1])


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
        min_size=0,
        max_size=40,
    )
)
def test_aggregates_match_python(spark, vals):
    """min/max/count agree with Python on arbitrary inputs; empty → NULL."""
    rows = [Row(x=float(v)) for v in vals]
    fr = Frame(
        spark.createDataFrame(rows, schema="x double")
        if rows
        else spark.createDataFrame([], schema="x double")
    )
    assert fr.count().get() == len(vals)
    if vals:
        assert fr.min("x").get() == min(vals)
        assert fr.max("x").get() == max(vals)
    else:
        assert fr.min("x").get() is None
        assert fr.max("x").get() is None


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab c"),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_exact_dedup_partition_invariant(spark, texts):
    """Dedup groups partition the corpus: group sizes sum to corpus size and
    every keep_id is a member doc id."""
    from tdataframe_spark.ops.dedup import exact_dedup_groups

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    out = exact_dedup_groups(
        spark.createDataFrame(rows, schema="doc_id long, text string"),
        "doc_id",
        "text",
    ).collect()
    assert sum(r["n_dups"] for r in out) == len(texts)
    assert all(0 <= r["keep_id"] < len(texts) for r in out)


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 19), st.integers(0, 19)).filter(
            lambda t: t[0] != t[1]
        ),
        min_size=1,
        max_size=30,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Property: distributed label propagation == a driver-side union-find
    on random small graphs (labels = min reachable id)."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.dedup import connected_components

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expect = {n: find(n) for n in parent}

    pairs = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    # both physical paths: the driver union-find exit (default threshold)
    # and the distributed pointer-jumped loop (threshold 0)
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs, max_iterations=40).collect()
    }
    assert got == expect
    dist = {
        r["id"]: r["component"]
        for r in connected_components(
            pairs, max_iterations=40, driver_edge_threshold=0
        ).collect()
    }
    assert dist == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet=st.sampled_from("xy z"), min_size=0, max_size=60),
        min_size=1,
        max_size=8,
    ),
    chunk_size=st.integers(min_value=2, max_value=9),
    overlap=st.integers(min_value=0, max_value=3),
)
def test_chunk_documents_coverage_property(spark, texts, chunk_size, overlap):
    """Chunking invariants on arbitrary corpora: word-multiset coverage
    (every word of every doc appears in its chunks exactly once after
    removing the overlap copies), chunk ids dense from 0, and no chunk
    longer than chunk_size."""
    from tdataframe_spark.ops.textstats import chunk_documents

    overlap = min(overlap, chunk_size - 1)
    step = chunk_size - overlap
    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_size, overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_text"]))
    for i, t in enumerate(texts):
        words = t.split(" ")
        chunks = sorted(by_doc[i])
        assert [c for c, _ in chunks] == list(range(len(chunks)))
        # reconstruct: first chunk whole, then drop the overlap prefix
        rebuilt = chunks[0][1].split(" ")
        for _, ctext in chunks[1:]:
            cw = ctext.split(" ")
            assert overlap == 0 or cw[:overlap] == rebuilt[-overlap:]
            rebuilt.extend(cw[overlap:])
        assert rebuilt == words
        assert all(len(c.split(" ")) <= chunk_size for _, c in chunks)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.sampled_from(["ab", "abc", "abd", "bcd", "xy", "xyz", "q"]),
        min_size=3,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_bpe_matches_reference_on_random_corpora(spark, corpus_words, n_merges):
    """Distributed BPE == pure-Python Sennrich reference on arbitrary
    word mixes: same ordered merge list, same final segmentations."""
    from collections import Counter

    from tdataframe_spark.ops.bpe import bpe_segment_table, train_bpe
    from tests.test_textpipe import _reference_bpe

    text = " ".join(corpus_words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = train_bpe(docs, n_merges=n_merges)
    want_merges, want_segs = _reference_bpe(Counter(corpus_words), n_merges)
    assert got == want_merges
    segs = {
        r["word"]: list(r["syms"])
        for r in bpe_segment_table(docs, got).collect()
    }
    assert set(segs) == set(want_segs)  # no word silently dropped
    assert segs == want_segs
