"""Large-row-count smoke (the reference's test_par.cxx runs 100M rows,
/root/reference/tests/test_par.cxx:13-22): generate 50M rows in-engine and
run the fused aggregate + histogram pipeline. Verifies the engine's
partial+final shapes and observe fusion hold beyond toy sizes, with exact
closed-form expectations."""

import pytest
from pyspark.sql import functions as F

from tdataframe_spark import Frame

N = 50_000_000


@pytest.fixture(scope="module")
def big(spark):
    df = spark.range(N).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") % 1000).cast("double").alias("m"),
    )
    return Frame(df)


def test_fused_aggregates_50m(big):
    fr = big.filter("x >= 0")
    cnt, mn, mx, me = fr.count(), fr.min("x"), fr.max("x"), fr.mean("m")
    assert cnt.get() == N
    assert mn.ready and mx.ready and me.ready  # one fused pass
    assert mn.get() == 0.0 and mx.get() == float(N - 1)
    assert me.get() == pytest.approx(499.5)


def test_histo_50m(big):
    hist = big.histo("m", nbins=10, lo=0.0, hi=1000.0).get()
    assert sum(b[3] for b in hist) == N
    # uniform residues: every bin exactly N/10
    assert all(b[3] == N // 10 for b in hist)
