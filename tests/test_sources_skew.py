"""CSV/JSON/memory sources, sinks, skew operators, and observe-fused
multi-action flushes."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tdataframe_spark import Frame
from tdataframe_spark.operators.skew import salted_group_count, salted_join
from tdataframe_spark.sources.files import (
    from_rows,
    read_csv,
    read_json,
    write_csv,
    write_json,
)


def test_csv_roundtrip(spark, tmp_path):
    fr = from_rows(spark, [Row(a=1, b="x"), Row(a=2, b="y")])
    p = str(tmp_path / "csv")
    write_csv(fr.df, p)
    back = read_csv(spark, p, schema="a int, b string")
    assert sorted((r["a"], r["b"]) for r in back.df.collect()) == [(1, "x"), (2, "y")]


def test_json_roundtrip(spark, tmp_path):
    fr = from_rows(spark, [Row(a=1, b=[1.0, 2.0]), Row(a=2, b=[3.0])])
    p = str(tmp_path / "json")
    write_json(fr.df, p)
    back = read_json(spark, p, schema="a int, b array<double>")
    got = {r["a"]: r["b"] for r in back.df.collect()}
    assert got == {1: [1.0, 2.0], 2: [3.0]}


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from tdataframe_spark.sources.files import read_orc, write_orc

    fr = from_rows(spark, [Row(a=i, b=f"s{i}") for i in range(100)])
    p = str(tmp_path / "orc")
    write_orc(fr.df, p)
    back = read_orc(spark, p).filter(F.col("a") < 10).df.select("a")
    assert sorted(r["a"] for r in back.collect()) == list(range(10))
    # filter + projection must reach the ORC scan (same contract as parquet)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(a,10)" in plan
    assert "ReadSchema: struct<a:bigint>" in plan


def test_salted_group_count_matches_plain(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 5).alias("k")  # key 0 is as hot as the rest; fine
    )
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_group_count(df, ["k"], salt_buckets=8).collect()}
    assert plain == salted


def test_salted_join_matches_plain(spark):
    left = spark.range(5_000).select((F.col("id") % 3).alias("k"), F.col("id").alias("v"))
    right = spark.createDataFrame([Row(k=0, tag="zero"), Row(k=1, tag="one"), Row(k=2, tag="two")])
    plain = left.join(right, "k").groupBy("tag").count()
    salted = salted_join(left, right, "k", salt_buckets=4).groupBy("tag").count()
    assert {(r["tag"], r["count"]) for r in plain.collect()} == {
        (r["tag"], r["count"]) for r in salted.collect()
    }


def test_observe_fused_histo_carries_scalars(spark):
    """Scalars + a full-scan histogram on the same frame: ONE Spark pass
    produces all results (observe piggyback), and values are correct."""
    fr = Frame(spark.createDataFrame([Row(x=float(i)) for i in range(100)]))
    f2 = fr.filter("x >= 10")
    cnt, mn, me = f2.count(), f2.min("x"), f2.mean("x")
    h = f2.histo("x", nbins=9, lo=10.0, hi=100.0)
    bins = h.get()  # triggers flush: histogram + piggybacked metrics
    assert cnt.ready and mn.ready and me.ready
    assert cnt.get() == 90
    assert mn.get() == 10.0
    assert me.get() == pytest.approx(54.5)
    assert sum(b[3] for b in bins) == 90


def test_observe_fusion_empty_frame(spark):
    fr = Frame(spark.createDataFrame([Row(x=1.0)])).filter(F.lit(False))
    cnt = fr.count()
    taken = fr.take("x")  # unbounded take is full-scan → carrier
    assert taken.get() == []
    assert cnt.get() == 0


def test_salting_bounds_hot_key_reducer_work(spark):
    """The property that makes salting matter at 100 TB: a key holding 90%
    of rows must spread ~evenly over the salt buckets, so no single reducer
    sees more than ~1/salt_buckets of the hot key's rows. Mirrors the
    operators' salting recipe (rand(seed=0) routing) and checks the
    per-(key, salt) bucket sizes directly."""
    buckets = 8
    hot = 9_000
    df = spark.range(10_000).select(
        F.when(F.col("id") < hot, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    salted = df.withColumn("__salt", (F.rand(seed=0) * buckets).cast("int"))
    sizes = [
        r["c"]
        for r in salted.filter("k = 0")
        .groupBy("__salt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    assert len(sizes) == buckets  # every bucket participates
    assert sum(sizes) == hot
    # no straggler: the largest bucket holds well under 2x the fair share
    assert max(sizes) < 2 * hot / buckets, sizes


def test_salted_group_count_on_skewed_input(spark):
    """Correctness under real skew (not just uniform keys): 90% of rows on
    one key, remainder scattered."""
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(0)).otherwise(F.col("id") % 7).alias("k")
    )
    plain = {
        r["k"]: r["cnt"]
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .collect()
    }
    salted = {
        r["k"]: r["cnt"] for r in salted_group_count(df, ["k"], salt_buckets=8).collect()
    }
    assert plain == salted


# ---------------------------------------------------------------------------
# schema-drift guard (read_table / normalize_events)


def _write_events(tmp_path, subdir, ts_type):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / subdir
    d.mkdir()
    base_us = 1_600_000_000_000_000  # epoch micros
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [base_us, base_us + 1_000_000, base_us + 2_500_000], pa.int64()
            ).cast(pa.timestamp("us"))
            if ts_type == "us"
            else pa.array(
                [
                    base_us * 1000,
                    (base_us + 1_000_000) * 1000,
                    (base_us + 2_500_000) * 1000,
                ],
                pa.int64(),
            ).cast(pa.timestamp("ns")),
            "user_id": pa.array([10, 10, 11], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


def test_read_table_adapts_timestamp_us_events(spark, tmp_path):
    from tdataframe_spark.sources.parquet import read_table

    d = _write_events(tmp_path, "ev_us", "us")
    df = read_table(spark, d, "events")
    assert dict(df.dtypes)["ts_us"] == "bigint"
    assert "ts" not in df.columns
    got = sorted(r["ts_us"] for r in df.collect())
    assert got == [
        1_600_000_000_000_000,
        1_600_000_001_000_000,
        1_600_000_002_500_000,
    ]


def test_read_table_adapts_nanos_events(spark, tmp_path):
    from tdataframe_spark.sources.parquet import read_table

    d = _write_events(tmp_path, "ev_ns", "ns")
    df = read_table(spark, d, "events")
    got = sorted(r["ts_us"] for r in df.collect())
    assert got == [
        1_600_000_000_000_000,
        1_600_000_001_000_000,
        1_600_000_002_500_000,
    ]


def test_read_table_rejects_unknown_ts_dtype(spark, tmp_path):
    from tdataframe_spark.sources.parquet import SchemaDriftError, normalize_events

    df = spark.createDataFrame([(1, "not-a-time")], "event_id long, ts string")
    with pytest.raises(SchemaDriftError):
        normalize_events(df)


def test_register_views_full_sql_interface(spark):
    """register_views exposes every testdata table to spark.sql in one
    call, with events dtype-adapted (ts_us present whatever the parquet
    encoding)."""
    from tdataframe_spark.sources.parquet import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    try:
        assert "lineitem" in names and "events" in names
        n = spark.sql("select count(*) as n from lineitem").first()["n"]
        assert n > 0
        joined = spark.sql(
            "select count(*) as n from orders o join customer c "
            "on o.o_custkey = c.c_custkey"
        ).first()["n"]
        assert joined > 0
        # events arrives normalized: ts_us bigint, no raw ts column
        cols = dict(spark.table("events").dtypes)
        assert cols.get("ts_us") == "bigint" and "ts" not in cols
    finally:
        # generically-named views ('lineitem', 'events', …) must not
        # outlive a failed assert in the shared session
        for v in names:
            spark.catalog.dropTempView(v)


def test_read_json_robust_quarantines_bad_lines(spark, tmp_path):
    """PERMISSIVE ingestion: parseable lines land in `good`, malformed
    lines are preserved verbatim in the quarantine — nothing silently
    dropped, total accounting holds."""
    from tdataframe_spark.sources.files import read_json_robust

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "t": "ok"}\n'
        '{"id": 2 "t": "missing comma"}\n'
        '{"id": 3, "t": "fine"}\n'
    )
    good, bad = read_json_robust(spark, str(p), schema="id long, t string")
    g = {r["id"] for r in good.collect()}
    b = [r["raw"] for r in bad.collect()]
    assert g == {1, 3}
    assert len(b) == 1 and "missing comma" in b[0]
    assert good.count() + bad.count() == 3


def test_read_json_robust_does_not_mutate_schema(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from tdataframe_spark.sources.files import read_json_robust

    p = tmp_path / "a.jsonl"
    p.write_text('{"id": 1, "t": "x"}\n')
    schema = StructType([StructField("id", LongType()), StructField("t", StringType())])
    n_before = len(schema.fields)
    g1, _ = read_json_robust(spark, str(p), schema=schema)
    g2, _ = read_json_robust(spark, str(p), schema=schema)  # second use must not see a grown schema
    assert len(schema.fields) == n_before
    assert g1.count() == 1 and g2.count() == 1


def test_read_csv_robust_quarantines_bad_lines(spark, tmp_path):
    from tdataframe_spark.sources.files import read_csv_robust

    p = tmp_path / "in.csv"
    p.write_text("id,t,x\n1,ok,2.5\n2,bad-line-with-too-few-cols\n3,fine,9.0\n")
    good, bad = read_csv_robust(
        spark, str(p), schema="id long, t string, x double"
    )
    assert {r["id"] for r in good.collect()} == {1, 3}
    b = [r["raw"] for r in bad.collect()]
    assert len(b) == 1 and "too-few-cols" in b[0]


def test_read_media_files_binary_source_to_real_decode(spark, tmp_path):
    """binaryFile ingestion feeds the REAL decode path end-to-end: PPM
    files written to disk come back with exact dimensions through
    read_media_files -> decode_images; the glob prunes non-matching
    files at listing time; media_id is path-stable across reads."""
    import numpy as np

    from tdataframe_spark.ops.multimodal import decode_images
    from tdataframe_spark.sources.files import read_media_files

    d = tmp_path / "media"
    d.mkdir()
    for i, (w, h) in enumerate([(4, 2), (3, 5)]):
        rgb = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
        (d / f"img{i}.ppm").write_bytes(
            b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
        )
    (d / "notes.txt").write_text("not an image")

    media = read_media_files(spark, str(d), kind="image/ppm", glob="*.ppm")
    rows = media.collect()
    assert len(rows) == 2  # the glob excluded notes.txt during listing
    assert all(r["n_bytes"] == len(r["payload"]) for r in rows)
    decoded = {
        r["width"]: (r["height"], r["ok"]) for r in decode_images(media).collect()
    }
    assert decoded == {4: (2, True), 3: (5, True)}
    again = {r["path"]: r["media_id"] for r in media.collect()}
    first = {r["path"]: r["media_id"] for r in rows}
    assert again == first  # deterministic path-derived ids


def test_synthetic_datasource_deterministic_and_pushdown(spark):
    """The Python DataSource generates rows as a pure function of the
    global index (re-reads identical, partition-count independent), and
    ts_us range predicates are PUSHED into the reader as index cuts —
    the filtered scan generates exactly the in-range rows."""
    from tdataframe_spark.sources.synthetic import (
        SyntheticEventsReader,
        register_synthetic,
    )

    register_synthetic(spark)
    opts = {"rows": "1000", "partitions": "7", "seed": "5", "step_us": "1000"}
    r = (
        spark.read.format("synthetic_events")
        .options(**opts)
        .load()
    )
    rows = r.collect()
    assert len(rows) == 1000
    assert len({x["event_id"] for x in rows}) == 1000
    # deterministic across re-reads AND across partition counts
    again = spark.read.format("synthetic_events").options(**dict(opts, partitions="3")).load()
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
    # time-range filter: results correct...
    start = 1_700_000_000_000_000
    lo, hi = start + 200_000, start + 300_000
    got = (
        spark.read.format("synthetic_events").options(**opts).load()
        .filter((F.col("ts_us") >= lo) & (F.col("ts_us") < hi))
        .collect()
    )
    want = [x for x in rows if lo <= x["ts_us"] < hi]
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)) and len(want) == 100
    # ...and actually pushed: the reader's index window is cut to [200,300)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    probe = SyntheticEventsReader(dict(opts))
    rest = probe.pushFilters(
        [GreaterThanOrEqual(("ts_us",), lo), LessThan(("ts_us",), hi)]
    )
    assert list(rest) == [] and (probe.lo, probe.hi) == (200, 300)
    # unsupported filters come back and do not affect the window
    from pyspark.sql.datasource import EqualTo

    probe2 = SyntheticEventsReader(dict(opts))
    back = probe2.pushFilters([EqualTo(("event_type",), "click")])
    assert len(list(back)) == 1 and (probe2.lo, probe2.hi) == (0, 1000)
