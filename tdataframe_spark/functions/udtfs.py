"""Python user-defined table functions (Spark 4 UDTF surface).

Completes the engine's UDF triad (scalar pandas UDFs on Frame.filter/define,
grouped UDAF via applyInPandas, table functions here). UDTFs run row-at-a-
time in Python — the slowest escape hatch; reach for built-in generators
(explode/posexplode/inline) or mapInPandas first. Provided as the extension
point for true one-row → many-rows Python logic (parsers, samplers).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, ngram string")
class CharNGrams:
    """Emit (position, character n-gram) rows for a string.

    SQL: ``SELECT d.doc_id, g.* FROM docs d, LATERAL char_ngrams(d.text, 3) g``
    after ``register_udtfs(spark)``.
    """

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None or n is None or n <= 0:
            return
        for i in range(len(text) - n + 1):
            yield i, text[i : i + n]


@udtf(returnType="idx int, value double")
class EnumerateArray:
    """Explode a numeric array with indexes (posexplode twin, as a UDTF)."""

    def eval(self, values):  # noqa: D102
        if values is None:
            return
        for i, v in enumerate(values):
            yield i, float(v) if v is not None else None


def register_udtfs(spark) -> None:
    """Register all engine UDTFs for SQL LATERAL use."""
    spark.udtf.register("char_ngrams", CharNGrams)
    spark.udtf.register("enumerate_array", EnumerateArray)
