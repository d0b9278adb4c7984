"""Local replica of the driver's correctness gate: run every query in
``__spark_entry__.queries()`` at sf0.001 and compare row count, column names,
and exact values against the DuckDB ``oracle_sql()``.

Strictness matches the driver's order-insensitive value-hash: columns sorted
by name, rows sorted by all columns, exact equality (no tolerance) — because
the engine's determinism conventions (decimal sums, ordered folds, portable
hashes) are supposed to make both engines produce bit-identical values.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(x):
        if isinstance(x, (list, tuple)) or hasattr(x, "tolist") and not isinstance(x, str):
            try:
                return tuple(x.tolist() if hasattr(x, "tolist") else x)
            except Exception:
                return x
        return x

    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(norm_cell)
    return df.sort_values(list(df.columns), ignore_index=True)


ORACLE = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.fixture(scope="module")
def duck():
    """One shared read-only connection + view set for the whole
    parametrized suite (recreating 10 views per query was pure setup
    waste)."""
    con = _duck(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, name, duck):
    spark_df = QUERIES[name](spark, SF).toPandas()
    duck_df = duck.sql(ORACLE[name]).df()

    assert sorted(spark_df.columns) == sorted(duck_df.columns), (
        f"{name}: column mismatch spark={sorted(spark_df.columns)} "
        f"duck={sorted(duck_df.columns)}"
    )
    assert len(spark_df) == len(duck_df), (
        f"{name}: row count spark={len(spark_df)} duck={len(duck_df)}"
    )
    # the driver hashes serialized values, so int-vs-float dtype drift (e.g.
    # DuckDB HUGEINT → float64) fails its gate even when values compare equal
    for c in spark_df.columns:
        sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
        assert sk == dk or {sk, dk} <= {"i", "u"} or "O" in {sk, dk}, (
            f"{name}.{c}: dtype kind mismatch spark={spark_df[c].dtype} "
            f"duck={duck_df[c].dtype}"
        )
    s, d = _canon(spark_df), _canon(duck_df)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b, (
                    f"{name}.{c}[{i}]: {a!r} != {b!r} (diff={abs(a - b):.3e})"
                )
            else:
                # pandas NaT/NaN vs None
                if pd.isna(a) and pd.isna(b):
                    continue
                assert a == b, f"{name}.{c}[{i}]: {a!r} != {b!r}"


def test_rows_only_queries_run(spark):
    """Rows-only registry entries have no oracle — this is their only
    registry-level gate, so it must not be vacuous: every one is expected
    to produce actual rows on the fixture (an inverted filter or broken
    join returning empty would otherwise report green)."""
    for name in sorted(set(QUERIES) - set(ORACLE)):
        df = QUERIES[name](spark, SF)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r["cnt"] for r in rows) > 0
