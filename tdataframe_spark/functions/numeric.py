"""Numeric helpers with cross-engine-deterministic semantics.

Floating-point sums are order-dependent; Spark's partial aggregation order is
nondeterministic, so a raw SUM(double) can differ from any oracle in the last
ulps (and even between runs). ``dsum``/``dmean`` sum in DECIMAL — exact and
associative — then convert once to double, giving bit-stable results on any
partitioning AND the same value any other engine computes with the same
recipe. Use these for every externally-compared money/measure aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(c: Column | str) -> Column:
    """Deterministic double sum: exact decimal accumulation, one final
    rounding to double."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double")


def dmean(c: Column | str) -> Column:
    """Deterministic double mean: exact decimal sum / count."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def portable_hash64(c: Column | str) -> Column:
    """A 60-bit hash computable identically in Spark and ANSI-ish SQL
    engines: first 15 hex digits of md5, as a non-negative bigint.

    DuckDB equivalent: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT).
    Used to make MinHash/SimHash signatures oracle-checkable instead of
    depending on engine-private hash functions.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
