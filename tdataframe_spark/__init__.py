"""tdataframe_spark — a PySpark-native analytics engine with the query
capabilities of the reference `tdataframe` library (a lazy, functional-chain
dataframe: Filter/Define transformations, Count/Min/Max/Mean/Sum/Histo/Take/
Foreach actions with single-pass multi-result execution), re-expressed on top
of Spark DataFrames so Catalyst/Tungsten own optimization and physical
execution, and extended with the relational + large-scale-pipeline operators
(joins, group-by, windows, dedup, similarity search, text analysis) that a
100 TB training-data pipeline needs.

Reference semantics surveyed in SURVEY.md; file:line citations in docstrings
point into /root/reference (read-only) for parity checking.
"""

from tdataframe_spark.core.errors import (
    DuplicateColumnError,
    FrameError,
    UnknownColumnError,
)
from tdataframe_spark.core.frame import Frame
from tdataframe_spark.core.proxy import Result
from tdataframe_spark.operators import asof_join, sessionize, top_per_group
from tdataframe_spark.ops import (
    cosine_topk,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from tdataframe_spark.session import get_spark
from tdataframe_spark.sources.parquet import read_parquet, read_testdata

__all__ = [
    "Frame",
    "Result",
    "DuplicateColumnError",
    "UnknownColumnError",
    "FrameError",
    "get_spark",
    "read_parquet",
    "read_testdata",
    "asof_join",
    "sessionize",
    "top_per_group",
    "exact_dedup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash64",
    "cosine_topk",
]

__version__ = "0.1.0"
