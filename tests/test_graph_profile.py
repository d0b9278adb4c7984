"""PageRank (ops/graph.py) and the deterministic numeric profiler
(core/aggregates.profile_numeric)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tdataframe_spark.core.aggregates import profile_numeric
from tdataframe_spark.ops.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_cycle_is_uniform(spark):
    # symmetric 3-cycle: all nodes equivalent -> equal ranks summing to ~1
    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2), (1, 3)])
    ranks = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    assert len(set(ranks.values())) == 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_pagerank_star_center_dominates(spark):
    # undirected star: center 0, leaves 1..5
    pairs = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    ranks = {r["node"]: r["rank"] for r in pagerank(_edges(spark, pairs), iters=3).collect()}
    assert ranks[0] > max(ranks[i] for i in range(1, 6)) * 2
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no dangling mass


def test_pagerank_deterministic_across_partitioning(spark):
    pairs = [(i, (i * 7) % 20) for i in range(20)] + [((i * 7) % 20, i) for i in range(20)]
    e = _edges(spark, pairs)
    r1 = sorted((r["node"], r["rank"]) for r in pagerank(e, iters=4).collect())
    r2 = sorted(
        (r["node"], r["rank"]) for r in pagerank(e.repartition(13), iters=4).collect()
    )
    assert r1 == r2  # fixed-point accumulation: bit-identical on any layout


def test_profile_numeric_matches_reference(spark):
    import random

    rnd = random.Random(7)
    vals = [rnd.uniform(0, 100) for _ in range(500)]
    rows = [(v,) for v in vals] + [(None,)] * 5
    df = spark.createDataFrame(rows, "x double")
    out = profile_numeric(df, ["x"]).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    var = sum((v - mean) ** 2 for v in vals) / (n - 1)
    assert out["n"] == n and out["n_null"] == 5
    assert out["vmin"] == min(vals) and out["vmax"] == max(vals)
    assert abs(out["mean"] - mean) < 1e-6   # decimal(25,6) quantization
    assert abs(out["std"] - math.sqrt(var)) < 1e-6
    # single-row frames: std is NULL (n-1 degrees of freedom undefined)
    one = profile_numeric(spark.createDataFrame([(3.0,)], "x double"), ["x"]).collect()[0]
    assert one["std"] is None and one["mean"] == 3.0


def test_profile_numeric_is_one_pass(spark):
    df = spark.createDataFrame([(float(i), float(i * 2)) for i in range(100)], "a double, b double")
    out = profile_numeric(df, ["a", "b"])
    # both columns' stats come from ONE aggregate (no per-column jobs):
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final (x2 for AQE shells)
    assert {r["column"] for r in out.collect()} == {"a", "b"}


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented counting equals the itertools brute force on random
    graphs (each triangle counted exactly once), tolerates duplicate /
    reversed / self-loop input edges, and a planted clique contributes
    exactly C(k,3)."""
    import itertools
    import random

    from pyspark.sql import Row

    from tdataframe_spark.ops.graph import triangle_count

    rng = random.Random(7)
    nodes = list(range(30))
    edges = {(a, b) for a in nodes for b in nodes if a < b and rng.random() < 0.15}
    edges |= set(itertools.combinations([40, 41, 42, 43, 44], 2))  # K5: 10 triangles
    adj = {n: set() for n in nodes + [40, 41, 42, 43, 44]}
    for a, b in edges:
        adj[a].add(b); adj[b].add(a)
    want = sum(
        1 for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    # feed the op messy input: both orientations, dups, a self-loop
    rows = [Row(src=a, dst=b) for a, b in edges]
    rows += [Row(src=b, dst=a) for a, b in list(edges)[:10]]
    rows += [Row(src=1, dst=1)]
    got = triangle_count(spark.createDataFrame(rows)).first()
    assert got["n_triangles"] == want and want >= 10
    assert got["n_edges"] == len(edges)


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    """dangling=True: total rank stays 1 (within the 1e-12 fixed-point
    quantization), matches a python reference iteration-for-iteration,
    and the default mode still leaks dangling mass (documented)."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.graph import pagerank

    # b and d are dangling (no out-edges)
    edges = [("a", "b"), ("a", "c"), ("c", "d"), ("e", "a")]
    df = spark.createDataFrame([Row(src=s_, dst=d_) for s_, d_ in edges])
    iters, d = 4, 0.85
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=iters, dangling=True).collect()}

    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for s_, _ in edges:
        out[s_] = out.get(s_, 0) + 1
    import math

    Q = 10**12
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        contrib = {v: 0 for v in nodes}
        for s_, t_ in edges:
            contrib[t_] += math.floor(r[s_] / out[s_] * float(Q))
        dm = sum(math.floor(r[v] * float(Q)) for v in nodes if v not in out)
        r = {
            v: (1 - d) / n + d * (contrib[v] / float(Q) + (dm / float(Q)) / float(n))
            for v in nodes
        }
    assert got == r  # bit-identical to the reference recurrence
    assert abs(sum(got.values()) - 1.0) < 1e-9
    leaky = {x["node"]: x["rank"] for x in pagerank(df, iters=iters).collect()}
    assert sum(leaky.values()) < 1.0 - 0.05  # default mode leaks, documented
