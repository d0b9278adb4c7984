"""Vector math over ``array<float|double>`` columns, JVM-side.

Built on higher-order functions (``zip_with`` + ``aggregate``) so the hot
path stays inside whole-stage codegen — no Python, no UDF serialization —
and the element fold is a deterministic left-to-right sum (bit-stable, and
reproducible in DuckDB via ``list_reduce`` for oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered-fold dot product of two numeric arrays (double math)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: _d(x) * _d(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b) = dot / (|a|·|b|); NULL if either norm is 0."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
