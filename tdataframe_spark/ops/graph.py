"""Distributed graph algorithms beyond connected components: fixed-iteration
PageRank. Companion to ``ops/dedup.py connected_components`` (same iterative
persist/unpersist discipline).

Scale shape: each iteration is one shuffle — contributions grouped by
destination (hash agg, partial+final). Node state (rank) and the static
degree table are persisted; superseded iterations are unpersisted so memory
stays O(V) regardless of iteration count. No driver-side state beyond the
loop counter; no collect anywhere.

Determinism: per-edge contributions are quantized to fixed point
(``floor(r/outdeg * 10^12)``) and summed as integers — exact and
associative, so the per-destination sum is identical on any partitioning
and in any engine (a DECIMAL accumulator is NOT portable: DuckDB's
double→decimal cast rounds through double arithmetic, observed drifting
2.8e-17 from Spark's). ``floor``, ``*`` and ``/`` on identical doubles are
identical IEEE ops, so a fixed iteration count yields bit-identical ranks
across engines — the property the SQL-unrolled oracle checks. The
quantization (≤1e-12 lost per edge per iteration) is part of the
operator's definition. Total contribution mass is ≤ 10^12 per node, so
the int64 sum cannot overflow at any graph size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # fixed-point quantum for contribution accumulation


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    dangling: bool = False,
) -> DataFrame:
    """PageRank over a directed edge list, fixed ``iters`` iterations from
    a uniform start:

        r'(v) = (1 - d)/N + d * (sum_{u->v} r(u) / outdeg(u) [+ D/N])

    Nodes are everything appearing as a source or destination. By default
    dangling nodes (no out-edges) receive rank but leak their own mass
    (the registered oracle query pins this simplified variant);
    ``dangling=True`` redistributes their mass D uniformly each iteration
    — the textbook formulation whose total rank stays 1. D is accumulated
    in the same 1e-12 fixed point as the edge contributions (one extra
    1-row aggregate broadcast per iteration), so both modes stay
    bit-deterministic under any partitioning.

    Returns (node, rank). Deterministic: see module docstring.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # also materializes the persist
    outdeg = (
        e.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("outdeg"))
    )
    # static across iterations: join edges to out-degrees once
    ed = e.join(outdeg, "src").persist()
    ed.count()

    base = (1.0 - damping) / n_nodes
    dang = nodes.join(
        outdeg.select(F.col("src").alias("node")), "node", "left_anti"
    ).persist() if dangling else None
    if dang is not None:
        dang.count()
    ranks = nodes.withColumn("rank", F.lit(1.0) / n_nodes).persist()
    ranks.count()
    for _ in range(iters):
        contrib = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("outdeg") * F.lit(float(PR_SCALE)))
                .cast("long")
                .alias("c"),
            )
            .groupBy("node")
            .agg((F.sum("c") / F.lit(float(PR_SCALE))).alias("__in"))
        )
        incoming = F.coalesce(F.col("__in"), F.lit(0.0))
        if dangling:
            # dangling mass, fixed-point-exact like the edge contributions;
            # a 1-row aggregate broadcast onto every node
            dmass = ranks.join(dang, "node", "left_semi").agg(
                (
                    F.coalesce(
                        F.sum(
                            F.floor(F.col("rank") * F.lit(float(PR_SCALE))).cast(
                                "long"
                            )
                        ),
                        F.lit(0).cast("long"),
                    )
                    / F.lit(float(PR_SCALE))
                ).alias("__dm")
            )
            incoming = incoming + F.col("__dm") / F.lit(float(n_nodes))
        nr = nodes.join(contrib, "node", "left")
        if dangling:
            nr = nr.crossJoin(F.broadcast(dmass))
        new_ranks = (
            nr.select(
                "node",
                (F.lit(base) + F.lit(damping) * incoming).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    nodes.unpersist()
    ed.unpersist()
    if dang is not None:
        dang.unpersist()
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact global triangle count via degree orientation — the standard
    distributed formulation (Suri & Vassilvitskii's MapReduce scheme):
    orient every undirected edge from its lower-(degree, id) endpoint to
    the higher one, build wedges by self-joining oriented edges on their
    source, and close each wedge against the oriented edge set. Degree
    orientation caps every node's out-degree at O(√m), so wedge fan-out —
    the quadratic danger in a naive formulation — is bounded even on
    power-law graphs where a hub's undirected degree is huge.

    Input may contain duplicates, self-loops, or both orientations of an
    edge; they are canonicalized first. Two shuffles build the oriented
    edge list, one self-join makes wedges, one semi-join closes them.

    Returns a single row (n_nodes, n_edges, n_triangles).
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ranked = e.join(du, "u").join(dv, "v")
    # orient low → high in (degree, id) order; ids break degree ties
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
    )
    o1 = oriented.select(F.col("a"), F.col("b").alias("x"))
    o2 = oriented.select(F.col("a"), F.col("b").alias("y"))
    wedges = o1.join(o2, "a").filter(F.col("x") < F.col("y"))
    # a wedge (a→x, a→y) closes if x—y is an oriented edge EITHER way
    closing = oriented.select(
        F.least("a", "b").alias("x"), F.greatest("a", "b").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"], "left_semi")
    return (
        tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )
