"""Parquet scan: the engine's primary source.

Reference parity (SURVEY.md §2.1 S1/S2): ``TDataFrame(treeName, dir)``
/root/reference/TDataFrame.hxx:716 binds one on-disk columnar dataset;
a TChain (/root/reference/h1analysisDataFrame.C:117-123) concatenates many
identical-schema files. Spark's multi-path parquet read covers both, and
Catalyst gives projection/predicate pushdown into the scan for free —
the analogue of the reference reading only booked branches
(/root/reference/TDataFrame.hxx:260-281).
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from tdataframe_spark.core.frame import Frame

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(
    spark: SparkSession,
    *paths: str,
    default_columns: Sequence[str] = (),
) -> Frame:
    """Read one or more parquet paths (multi-path = the reference's TChain)
    into a Frame."""
    return Frame(spark.read.parquet(*paths), default_columns=default_columns)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(sf_dir, name))


def read_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present under ``sf_dir``."""
    out: dict[str, DataFrame] = {}
    for name in TESTDATA_TABLES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out
