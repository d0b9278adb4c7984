"""Python DataSource (Spark 4 extensibility API): a deterministic
synthetic-events generator — scale tests and benchmarks can materialize
arbitrarily many rows with NO disk and NO driver-side generation.

    from tdataframe_spark.sources.synthetic import register_synthetic
    register_synthetic(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", 10_000_000).option("partitions", 64).load())

Scale shape: rows are a pure function of their GLOBAL index (splitmix64
mixing), so any partitioning yields the same multiset — generation is
embarrassingly parallel across `partitions` index ranges, each task
streaming its range without materializing it. Time-range filters on the
monotone `ts_us` column are PUSHED into the reader (`pushFilters`) and
become index-range cuts, so a day's slice of a year-long synthetic stream
generates only that day's rows — the same contract a parquet scan gets
from row-group pruning.

Reference parity note: the reference engine reads only its own tree files;
this source exists for the task sheet's scale-testing story, modeled on
Spark's own python datasource examples (public API, SPARK-44076).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_MASK = (1 << 64) - 1

EVENT_TYPES = ("view", "click", "purchase", "login", "logout")


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mixer (public splitmix64 constants) — the
    per-row randomness source; pure function of the global row index."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


class _Range(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.seed = int(options.get("seed", 42))
        self.start_us = int(options.get("start_us", 1_700_000_000_000_000))
        self.step_us = max(1, int(options.get("step_us", 1000)))
        self.n_users = max(1, int(options.get("users", 10_000)))
        # global index window [lo, hi); filter pushdown narrows it
        self.lo, self.hi = 0, self.rows

    # ts_us = start_us + i*step_us is MONOTONE in the global index, so
    # time-range predicates become index cuts — the generator never
    # produces rows a pushed filter would discard.
    def pushFilters(self, filters):
        # not a generator: the index-window clamp below must run even if
        # the engine never iterates the returned (unsupported) list
        rest = []
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "ts_us" and isinstance(
                f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)
            ):
                v = int(f.value)
                if isinstance(f, GreaterThan):
                    # smallest i with ts > v
                    self.lo = max(self.lo, (v - self.start_us) // self.step_us + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    # ceil division: smallest i with ts >= v
                    self.lo = max(
                        self.lo, -((self.start_us - v) // self.step_us)
                    )
                elif isinstance(f, LessThan):
                    # smallest i with ts >= v bounds the exclusive end
                    self.hi = min(
                        self.hi, -((self.start_us - v) // self.step_us)
                    )
                else:  # LessThanOrEqual: largest i with ts <= v, inclusive
                    self.hi = min(
                        self.hi, (v - self.start_us) // self.step_us + 1
                    )
                # fully handled — do NOT return it as unsupported
                continue
            rest.append(f)
        self.lo = max(0, min(self.lo, self.rows))
        self.hi = max(self.lo, min(self.hi, self.rows))
        return rest

    def partitions(self):
        lo, hi = self.lo, self.hi
        n = max(1, self.n_parts)
        span = max(1, -((lo - hi) // n))  # ceil((hi-lo)/n)
        return [
            _Range(a, min(a + span, hi)) for a in range(lo, hi, span)
        ] or [_Range(0, 0)]

    def read(self, partition):
        seed_base = _splitmix64(self.seed)
        for i in range(partition.lo, partition.hi):
            h = _splitmix64(seed_base ^ i)
            yield (
                i,
                h % self.n_users,
                EVENT_TYPES[(h >> 17) % len(EVENT_TYPES)],
                self.start_us + i * self.step_us,
                ((h >> 24) % 1_000_000) / 1000.0,
            )


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return (
            "event_id bigint, user_id bigint, event_type string, "
            "ts_us bigint, value double"
        )

    def reader(self, schema: StructType):
        return SyntheticEventsReader(self.options)


def register_synthetic(spark) -> None:
    """Register the source for this session; afterwards
    ``spark.read.format("synthetic_events")`` works anywhere.

    SESSION-GLOBAL side effect: unconditionally enables
    ``spark.sql.python.filterPushdown.enabled`` (python-source filter
    pushdown is opt-in in Spark 4.1, and a reader implementing
    ``pushFilters`` refuses to initialize without it) — which also turns
    pushdown ON for every OTHER Python data source in this session. It
    cannot be set "only if unset": RuntimeConfig reports the Spark
    default ("false") for unset keys, indistinguishable from an explicit
    user false — and with the flag off this source cannot run at all. A
    caller who needs it off must flip it back after registration and
    forgo this source."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsSource)
