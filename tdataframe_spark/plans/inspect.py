"""Physical-plan inspection helpers.

The 100 TB contract is enforced here: tests assert that filters reach the
parquet scan (`PushedFilters`), that projections prune the read schema
(`ReadSchema`), that dimension joins broadcast, and that hot paths stay
inside whole-stage codegen. A query that silently loses one of these
properties would still be correct at sf0.01 and unusable at 100 TB — plan
assertions catch the regression at test time.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema blocks (one per scan) from the formatted plan."""
    text = explain_str(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", text)]


def has_broadcast_join(df: DataFrame) -> bool:
    # "simple" mode prints the full tree even under AQE (formatted mode
    # abbreviates non-final adaptive plans)
    text = explain_str(df, "simple")
    return "BroadcastHashJoin" in text or "BroadcastNestedLoopJoin" in text


def has_whole_stage_codegen(df: DataFrame) -> bool:
    return "WholeStageCodegen" in explain_str(df, "codegen")


# scale-killer patterns a healthy plan must not contain (see lint_plan)
_LINT_RULES = [
    (
        "cartesian",
        "CartesianProduct",
        "unkeyed cross product — undistributable at scale",
    ),
    (
        "python-row-udf",
        "BatchEvalPython",
        "row-at-a-time Python in the plan — use built-ins or Arrow",
    ),
    (
        "single-partition-exchange",
        "Exchange SinglePartition",
        "all data funneled through one task (global window/sort?)",
    ),
    (
        "bnlj",
        "BroadcastNestedLoopJoin",
        "nested-loop join — all-pairs unless the build side is a "
        "deliberate constant attach (1-row agg / centroid table / bloom "
        "bits / bounded query set)",
    ),
]


def _plan_node(line: str) -> str:
    """Strip tree art (``+-``, ``:  ``, codegen ``*(4)`` stars) down to
    the operator text."""
    s = re.sub(r"^[\s+:*-]*", "", line)
    return re.sub(r"^\(\d+\)\s*", "", s)


# operators that establish (or re-establish) their own output
# distribution: anything below them belongs to THEM, not to a Window
# above — walking past one would misattribute a deeper operator's
# exchange (e.g. a 1-row scalar agg's partial-row SinglePartition
# funnel under a join) to the window.
_DISTRIBUTION_STOPPERS = (
    "Window",
    "WindowGroupLimit",
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Union",
    "Expand",
    "Generate",
)


def count_global_windows(plan: str) -> int:
    """Number of Window operators fed by an ``Exchange SinglePartition``
    — the single-task cumulative-window trap (ALL rows under the window
    funnel through one task; a global ``.agg()``'s SinglePartition
    exchange is fine because only per-partition PARTIALS cross it, which
    is why plain substring matching can't enforce this).

    Walks the simple-mode plan tree by indentation: for each ``Window``
    node, descend its input chain and attribute only an Exchange met
    BEFORE any other distribution-establishing operator (another window,
    an aggregate, a join, a global sort). A window whose requirement is
    already satisfied (stacked windows, pre-partitioned input) has no
    exchange of its own — a deeper operator's SinglePartition exchange
    must not be pinned on it. Pass-through operators (Project, Filter,
    sort-within-partitions, scans) keep the walk going."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        m = re.match(r"^([\s+:*-]*)Window(Group)? ", line)
        if not m:
            continue
        depth = len(m.group(1))
        for below in lines[i + 1:]:
            stripped = re.match(r"^([\s+:*-]*)", below)
            if below.strip() and len(stripped.group(1)) <= depth:
                break  # popped out of this window's subtree
            node = _plan_node(below)
            if node.startswith(("Exchange", "ReusedExchange")):
                if "SinglePartition" in node:
                    hits += 1
                break
            if node.startswith("BroadcastExchange"):
                break  # not a shuffle this window could consume
            if node.startswith("Sort ") and ", true," in node:
                break  # global sort: its exchange is its own
            if node.startswith(_DISTRIBUTION_STOPPERS):
                break  # requirement already satisfied upstream of here
    return hits


def lint_plan(df: DataFrame) -> list[str]:
    """Scan a physical plan for the known scale-killers and return one
    '<rule>: <why>' line per hit (empty = clean). Rules: cartesian
    products, row-at-a-time Python (BatchEvalPython — Arrow paths like
    MapInPandas/ArrowEvalPython are fine), single-partition exchanges,
    and windows fed by a single-partition exchange (global cumulative
    windows — the whole dataset in one task). Used by the registry-wide
    audit in tests/test_plans.py; callers with a deliberate exception
    (e.g. a bounded-cardinality vocabulary ranking) whitelist by rule
    name."""
    plan = explain_str(df, "simple")
    out = [
        f"{name}: {why}"
        for name, needle, why in _LINT_RULES
        if needle in plan
    ]
    if count_global_windows(plan):
        out.append(
            "global-window: Window over an Exchange SinglePartition — "
            "every row under the window runs through ONE task; "
            "range-partition + per-partition partials + broadcast prefix "
            "offsets instead (cf. ops.classify.roc_auc, "
            "operators.windows.global_row_number)"
        )
    return out
