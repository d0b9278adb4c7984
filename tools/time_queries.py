#!/usr/bin/env python
"""Time individual registry queries with the bench methodology (noop
sink, min-of-N, cache cleared between runs). Usage:

    python tools/time_queries.py q1,q2,... [n_runs] [sf_dir] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tdataframe_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    spark = get_spark("time-queries", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # warmup
    queries["count_chain"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        runs = []
        for _ in range(n):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        print(f"{name}: min={min(runs)} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
