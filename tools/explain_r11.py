#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registry queries to
plans/r11/<query>_<suffix>.txt — the optimization round's before/after
plan evidence. Usage:

    python tools/explain_r11.py before q1_pricing_summary pq_ann ...
    python tools/explain_r11.py after  q1_pricing_summary pq_ann ...

Plans are captured at sf0.01 (small enough to build plans fast; plan
SHAPE is scale-independent for these queries — same operators, same
join strategies at the bench's sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tdataframe_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("explain-r11", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
