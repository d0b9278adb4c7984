"""SparkSession factory tuned for this engine.

Defaults target the local[N] test/bench environment but every setting is the
one we would ship on a 1000-executor cluster: AQE on (runtime re-plan, skew
join handling, partition coalescing), Arrow for any Python<->JVM data
movement, UTC session timezone (determinism + oracle parity), and shuffle
partitions sized to the parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tdataframe-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, then to the machine's CPU count.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 4)
    cpus = int(cpus)
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime row-level join pruning: inject a bloom filter built from
        # the filtered small side into the big side's scan — on a selective
        # dim-fact join this cuts the fact shuffle before it happens (off by
        # default in Spark; a pure win at 100 TB, negligible below).
        # Do NOT also enable runtimeFilter.semiJoinReduction: on this Spark
        # build it sends bucketed-join planning into a loop (test hang).
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", "false")
        # many distinct codegen'd plans in one session exhaust the default
        # 240m code cache, silently disabling JIT and slowing late queries
        # 20-40x; reserve enough and allow flushing
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
