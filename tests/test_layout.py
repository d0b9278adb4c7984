"""Write-layout (sorted / z-ordered parquet) and the footer statistics that
make data skipping work: the tests read back the exact per-file min/max a
parquet reader's row-group pruning consults."""

import pytest
from pyspark.sql import functions as F

from tdataframe_spark import Frame
from tdataframe_spark.sources.layout import parquet_column_ranges, read_pruned

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_sorted_snapshot_disjoint_ranges(spark, lineitem, tmp_path):
    """Range-partitioned sorted write: per-file [min,max] of the sort
    column are non-overlapping (boundary values may repeat), so a point or
    range filter touches one file's row groups. An unsorted control write
    has every file spanning ~the full range."""
    out = str(tmp_path / "sorted")
    Frame(lineitem).snapshot(out, sort_by=["l_extendedprice"], n_files=4)
    ranges = sorted(parquet_column_ranges(out, "l_extendedprice"))
    assert len(ranges) == 4
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (equal at boundary allowed)

    ctrl = str(tmp_path / "plain")
    lineitem.repartition(4).write.parquet(ctrl)
    ctrl_ranges = parquet_column_ranges(ctrl, "l_extendedprice")
    full = max(hi for _, hi in ctrl_ranges) - min(lo for lo, _ in ctrl_ranges)
    # unsorted: every file covers nearly the whole value range
    assert all((hi - lo) > 0.9 * full for lo, hi in ctrl_ranges)

    # content unchanged by the layout
    back = spark.read.parquet(out)
    assert back.count() == lineitem.count()
    assert back.agg(F.sum("l_quantity")).first()[0] == \
        lineitem.agg(F.sum("l_quantity")).first()[0]


def test_zorder_snapshot_bounds_both_columns(spark, lineitem, tmp_path):
    """Z-order on (l_extendedprice, l_quantity): EVERY z-ordered column
    gets bounded per-file ranges — a plain sort on price would leave
    quantity full-range in every file."""
    out = str(tmp_path / "zorder")
    Frame(lineitem).snapshot(
        out, zorder_by=["l_extendedprice", "l_quantity"], n_files=16
    )
    for col in ["l_extendedprice", "l_quantity"]:
        ranges = parquet_column_ranges(out, col)
        assert len(ranges) == 16
        full = max(hi for _, hi in ranges) - min(lo for lo, _ in ranges)
        widths = [hi - lo for lo, hi in ranges]
        avg_width = sum(widths) / len(widths)
        # each file covers a sub-slab of the space in BOTH dimensions
        assert avg_width < 0.6 * full, (col, avg_width, full)

    back = spark.read.parquet(out)
    assert back.count() == lineitem.count()


def _hilbert_ref(coords, b):
    """Pure-Python Skilling axes→transpose→index (the published reference
    the Column implementation must reproduce bit-for-bit)."""
    X = list(coords)
    n = len(X)
    Q = 1 << (b - 1)
    while Q > 1:
        P = Q - 1
        for i in range(n):
            if X[i] & Q:
                X[0] ^= P
            else:
                t = (X[0] ^ X[i]) & P
                X[0] ^= t
                X[i] ^= t
        Q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t, Q = 0, 1 << (b - 1)
    while Q > 1:
        if X[n - 1] & Q:
            t ^= Q - 1
        Q >>= 1
    X = [x ^ t for x in X]
    key = 0
    for j in range(b):
        for i in range(n):
            key |= ((X[i] >> j) & 1) << (j * n + (n - 1 - i))
    return key


def test_hilbert_index_is_a_true_hilbert_curve(spark):
    """Over full grids the JVM-expression curve must (a) match the
    published Skilling reference exactly, (b) be a bijection onto
    [0, 2^(n·b)), and (c) have the defining Hilbert property: consecutive
    positions are ADJACENT cells (step distance exactly 1 — the property
    Morton/z-order lacks at seam crossings)."""
    import itertools

    from tdataframe_spark.sources.layout import hilbert_index

    for n, b in [(2, 3), (3, 2)]:
        side = 1 << b
        cells = list(itertools.product(range(side), repeat=n))
        df = spark.createDataFrame(
            cells, ", ".join(f"c{i} int" for i in range(n))
        )
        got = {
            tuple(r[f"c{i}"] for i in range(n)): r["h"]
            for r in df.select(
                *[f"c{i}" for i in range(n)],
                hilbert_index([F.col(f"c{i}") for i in range(n)], b).alias("h"),
            ).collect()
        }
        assert got == {c: _hilbert_ref(c, b) for c in cells}
        assert sorted(got.values()) == list(range(side**n))
        walk = sorted(got.items(), key=lambda kv: kv[1])
        assert all(
            sum(abs(a - c) for a, c in zip(walk[k][0], walk[k + 1][0])) == 1
            for k in range(len(walk) - 1)
        )


def test_hilbert_snapshot_bounds_both_columns(spark, lineitem, tmp_path):
    """Hilbert layout gives every listed column bounded per-file ranges
    (same contract as z-order), and file-level pruning works on the
    second column."""
    out = str(tmp_path / "hilbert")
    Frame(lineitem).snapshot(
        out, hilbert_by=["l_extendedprice", "l_quantity"], n_files=16
    )
    for col in ["l_extendedprice", "l_quantity"]:
        ranges = parquet_column_ranges(out, col)
        assert len(ranges) == 16
        full = max(hi for _, hi in ranges) - min(lo for lo, _ in ranges)
        widths = [hi - lo for lo, hi in ranges]
        assert sum(widths) / len(widths) < 0.6 * full, col
    pruned = read_pruned(spark, out, "l_quantity", 1.0, 5.0)
    assert len(pruned.inputFiles()) < 16
    back = spark.read.parquet(out)
    assert back.count() == lineitem.count()
    with pytest.raises(ValueError):
        Frame(lineitem).snapshot(
            out, zorder_by=["l_quantity"], hilbert_by=["l_quantity"]
        )


def test_read_pruned_skips_files_same_answer(spark, lineitem, tmp_path):
    """File-level skipping on a sorted layout: a narrow range on the sort
    column opens a strict subset of files (df.inputFiles() proves Spark
    never lists the skipped ones) and returns exactly the full-scan
    answer."""
    out = str(tmp_path / "sorted")
    Frame(lineitem).snapshot(out, sort_by=["l_extendedprice"], n_files=8)

    lo, hi = 1000.0, 2000.0
    pruned = read_pruned(spark, out, "l_extendedprice", lo, hi)
    n_total = len(spark.read.parquet(out).inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert n_total == 8
    assert n_pruned < n_total  # skipped at least one file outright

    expect = (
        lineitem.filter(
            (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") <= hi)
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("s"),
        )
        .first()
    )
    got = pruned.agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
    ).first()
    assert (got["n"], got["s"]) == (expect["n"], expect["s"])


def test_read_pruned_on_second_zorder_column(spark, lineitem, tmp_path):
    """Z-ordering bounds EVERY z-ordered column per file, so file-level
    pruning works on the non-leading column too — where a plain sort on
    price would leave quantity full-range in every file (nothing to
    skip)."""
    out = str(tmp_path / "z2")
    Frame(lineitem).snapshot(
        out, zorder_by=["l_extendedprice", "l_quantity"], n_files=16
    )
    lo, hi = 1.0, 5.0  # narrow slice of l_quantity (values ~1..50)
    pruned = read_pruned(spark, out, "l_quantity", lo, hi)
    assert len(pruned.inputFiles()) < 16
    expect = lineitem.filter(
        (F.col("l_quantity") >= lo) & (F.col("l_quantity") <= hi)
    ).count()
    assert pruned.count() == expect


def test_read_pruned_empty_range(spark, lineitem, tmp_path):
    """A range outside every file's stats reads zero files and zero rows."""
    out = str(tmp_path / "sorted2")
    Frame(lineitem).snapshot(out, sort_by=["l_quantity"], n_files=4)
    pruned = read_pruned(spark, out, "l_quantity", 1e12, 2e12)
    # the load-bearing property is FILE skipping, not just zero rows (a
    # plain row filter would also count 0)
    assert len(pruned.inputFiles()) == 0, pruned.inputFiles()
    assert pruned.count() == 0


def test_sorted_and_zorder_mutually_exclusive(lineitem, tmp_path):
    with pytest.raises(ValueError):
        Frame(lineitem).snapshot(
            str(tmp_path / "x"), sort_by=["l_quantity"], zorder_by=["l_tax"]
        )


def test_compact_small_files(spark, lineitem, tmp_path):
    """Compaction rewrites a many-small-files directory into right-sized
    files with identical content; sort_by additionally restores disjoint
    per-file ranges."""
    from tdataframe_spark.sources.layout import compact

    out = str(tmp_path / "fragmented")
    lineitem.repartition(64).write.parquet(out)  # 64 tiny files
    import glob

    assert len(glob.glob(f"{out}/*.parquet")) == 64
    before_cnt = lineitem.count()
    before_sum = lineitem.agg(F.sum("l_quantity")).first()[0]

    n = compact(spark, out, target_file_bytes=10 * 1024 * 1024)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) == n and n < 64
    back = spark.read.parquet(out)
    assert back.count() == before_cnt
    assert back.agg(F.sum("l_quantity")).first()[0] == before_sum

    # compaction with sort re-establishes skippable layout
    compact(spark, out, target_file_bytes=1, sort_by=["l_extendedprice"])
    ranges = sorted(parquet_column_ranges(out, "l_extendedprice"))
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_schema_evolution_merge_read(spark, tmp_path):
    """Parquet schema evolution: files written with an added column read
    back as one table with mergeSchema, NULLs where the column predates."""
    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(
        f"{out}/part=1"
    )
    spark.createDataFrame(
        [(2, "b", 3.5)], "id long, v string, score double"
    ).write.parquet(f"{out}/part=2")
    df = spark.read.option("mergeSchema", "true").parquet(out)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[2]["score"] == 3.5
    assert rows[1]["score"] is None
