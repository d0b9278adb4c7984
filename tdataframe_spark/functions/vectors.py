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


def int8_scale(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization scale: max|x| / 127 (0.0 for
    a zero vector). Max is order-independent, so the scale — and every
    code derived from it — is partitioning-stable."""
    a = F.col(a) if isinstance(a, str) else a
    absmax = F.aggregate(
        a, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(_d(x)))
    )
    return absmax / F.lit(127.0)


def int8_codes(a: Column | str, scale: Column) -> Column:
    """Quantize to ``array<tinyint>``: round(x/scale), in [-127, 127] by
    construction of ``int8_scale`` (ANSI cast raises rather than wraps if
    a foreign scale is too small). A 0 scale (zero vector) codes to zeros.
    4× smaller than float32 / 8× smaller than float64 at rest — the
    storage/scan shape for 100 TB embedding tables; pair with
    ``int8_dequantize`` (or rerank against raw vectors) at query time."""
    a = F.col(a) if isinstance(a, str) else a
    return F.when(
        scale > 0,
        F.transform(a, lambda x: F.round(_d(x) / scale).cast("tinyint")),
    ).otherwise(F.transform(a, lambda x: F.lit(0).cast("tinyint")))


def int8_dequantize(codes: Column | str, scale: Column) -> Column:
    """Reconstruct doubles: code · scale (max abs error scale/2)."""
    codes = F.col(codes) if isinstance(codes, str) else codes
    return F.transform(codes, lambda c: _d(c) * scale)
