#!/usr/bin/env python
"""Regenerate PLANS.md: the formatted physical plan of every headline
query at sf0.001, as evidence of the plan properties the engine is
designed around (scan pushdown, column pruning, broadcast placement,
whole-stage codegen spans). Run from the repo root:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import HEADLINE  # noqa: E402
from tdataframe_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("dump-plans", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    out = [
        "# PLANS — headline-query physical plans (sf0.001, regenerate with "
        "`python tools/dump_plans.py`)",
        "",
        "What to look for: `PushedFilters`/`ReadSchema` on scans (pushdown +",
        "pruning), `BroadcastHashJoin` for dimension sides, `WholeStageCodegen`",
        "spans on hot paths, and no `CartesianProduct` anywhere. The few",
        "`BroadcastNestedLoopJoin`s are deliberate constant attaches — a",
        "broadcast QUERY SET (cosine_topk), centroid table (nearest_centroid),",
        "bloom bitset row (decontamination_bloom), vocab-size row",
        "(ccnet_buckets) — each a keyless join against a 1-row/tiny build side.",
        "",
    ]
    # headline bench queries plus the round-3 showcase operators whose plan
    # shape is the point (broadcast centroid argmax, bloom map-side filter,
    # inverted-index fuzzy join)
    showcase = [
        "nearest_centroid",
        "decontamination_bloom",
        "fuzzy_join",
        "global_rank",
        "ccnet_buckets",
        "dedup_keep_best",
        "pq_ann",
        # round-4 showcase: span dedup's island windows, DSIR's bounded
        # bucket broadcasts, the triangle wedge/closing joins, Q21's
        # semi+anti composition
        "dup_spans",
        "dsir_weights",
        "triangle_count",
        "q21_suppliers_waiting",
        # round-5 showcase: the two-level AUC cumulation (range partition,
        # no single-task window) and the amortized semdedup assign path
        # (broadcast centroid argmax + cluster-keyed rep join, no retrain)
        "roc_auc",
        "semdedup_assign",
        # round-10 showcase: partition evolution's read plan — the
        # manifest pruned the file list BEFORE Spark (few input files)
        # and the residual partition predicate is PUSHED into the scan
        # for the legacy files that record no partition value
        "partition_evolution",
    ]
    for name in HEADLINE + showcase:
        df = queries[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out.append(f"## {name}\n\n```\n{plan.rstrip()}\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINE) + len(showcase)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
