"""Data-quality expectations and snapshot diff: planted violations must be
counted exactly, and the CDC diff must classify added/removed/changed."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from tdataframe_spark.ops.quality import (
    dq_report,
    expect,
    expect_fk,
    expect_not_null,
    expect_unique,
    snapshot_diff,
)


def test_expectations_count_planted_violations(spark):
    rows = [
        Row(k=1, v=10.0, fk=1),
        Row(k=2, v=-1.0, fk=1),   # check violation
        Row(k=2, v=5.0, fk=2),    # duplicate key
        Row(k=3, v=None, fk=9),   # null v (counts for the check too) + bad fk
        Row(k=4, v=2.0, fk=9),    # bad fk
    ]
    df = spark.createDataFrame(rows)
    dim = spark.createDataFrame([Row(id=1), Row(id=2)])
    rep = {
        r["rule"]: r["violations"]
        for r in dq_report([
            expect(df, "v_positive", F.col("v") > 0),
            expect_not_null(df, "v_not_null", "v"),
            expect_unique(df, "k_unique", ["k"]),
            expect_fk(df, "fk_valid", "fk", dim, "id"),
        ]).collect()
    }
    assert rep == {
        "v_positive": 2,   # -1.0 and NULL
        "v_not_null": 1,
        "k_unique": 1,     # one extra row beyond the first for k=2
        "fk_valid": 2,
    }


def test_expectations_all_green_on_clean_data(spark):
    df = spark.createDataFrame([Row(k=i, v=float(i + 1)) for i in range(10)])
    rep = {
        r["rule"]: r["violations"]
        for r in dq_report([
            expect(df, "v_positive", F.col("v") > 0),
            expect_unique(df, "k_unique", ["k"]),
        ]).collect()
    }
    assert rep == {"v_positive": 0, "k_unique": 0}


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame([
        Row(k=1, a="x", b=1.0),
        Row(k=2, a="y", b=2.0),
        Row(k=3, a="z", b=3.0),
    ])
    new = spark.createDataFrame([
        Row(k=1, a="x", b=1.0),    # unchanged → absent from diff
        Row(k=2, a="y", b=99.0),   # changed
        Row(k=4, a="w", b=4.0),    # added
    ])
    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edits=st.dictionaries(
        st.integers(min_value=0, max_value=29),
        st.sampled_from(["drop", "change"]),
        max_size=12,
    ),
    n_added=st.integers(min_value=0, max_value=5),
)
def test_snapshot_diff_reconstructs_random_edits(spark, edits, n_added):
    """Apply a random edit script old→new; the diff must recover exactly
    the script (dropped→removed, changed→changed, new keys→added, and
    nothing else)."""
    base = [(k, f"val{k}", float(k)) for k in range(30)]
    old = spark.createDataFrame(base, "k long, a string, b double")
    new_rows = []
    for k, a, b in base:
        op = edits.get(k)
        if op == "drop":
            continue
        if op == "change":
            new_rows.append((k, a + "_x", b))
        else:
            new_rows.append((k, a, b))
    new_rows += [(100 + i, "new", 0.0) for i in range(n_added)]
    new = spark.createDataFrame(new_rows, "k long, a string, b double")

    got = {r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()}
    want = {k: ("removed" if op == "drop" else "changed") for k, op in edits.items()}
    want.update({100 + i: "added" for i in range(n_added)})
    assert got == want


def test_winsorize_clips_to_exact_percentiles(spark):
    from tdataframe_spark.ops.quality import winsorize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, x double"
    )
    out = winsorize(df, ["x"], lower=0.10, upper=0.90).toPandas()
    assert len(out) == 100
    # exact percentile of 1..100 at 0.1/0.9 (linear interp) = 10.9 / 90.1
    assert abs(out["x_w"].min() - 10.9) < 1e-9
    assert abs(out["x_w"].max() - 90.1) < 1e-9
    mid = out[(out["x"] > 20) & (out["x"] < 80)]
    assert (mid["x_w"] == mid["x"]).all()  # interior untouched


def test_winsorize_approx_bounds_within_rank_error(spark):
    """method='approx' clip bounds must land within the GK sketch's rank
    guarantee: each bound is an actual data value whose rank is within
    n/accuracy of the requested percentile's rank. With accuracy=10000
    and n=5000 the sketch is effectively exact — bounds must equal the
    requested ranks' values; a looser accuracy=100 run pins the ±n/100
    rank window, and interior rows pass through unclipped either way."""
    from tdataframe_spark.ops.quality import winsorize

    n = 5000
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, n + 1)], "id long, x double"
    )
    tight = winsorize(df, ["x"], 0.05, 0.95, method="approx").toPandas()
    # rank error ≤ n/accuracy = 0.5 rows at accuracy=10000: bounds are
    # ACTUAL data values (never interpolants) within one rank of the
    # requested percentile
    assert tight["x_w"].min() in (float(int(0.05 * n)), float(int(0.05 * n) + 1))
    assert tight["x_w"].max() in (float(int(0.95 * n)), float(int(0.95 * n) + 1))

    loose = winsorize(
        df, ["x"], 0.05, 0.95, method="approx", accuracy=100
    ).toPandas()
    eps = n / 100
    lo, hi = loose["x_w"].min(), loose["x_w"].max()
    assert 0.05 * n - eps <= lo <= 0.05 * n + eps, lo
    assert 0.95 * n - eps <= hi <= 0.95 * n + eps, hi
    mid = loose[(loose["x"] > 0.05 * n + eps) & (loose["x"] < 0.95 * n - eps)]
    assert (mid["x_w"] == mid["x"]).all()

    import pytest

    with pytest.raises(ValueError, match="method"):
        winsorize(df, ["x"], method="banana")


def test_winsorize_handles_nonidentifier_column_names(spark):
    """Bounds go through the typed percentile API, so a column name that
    would need backticks in SQL text must work unchanged."""
    from tdataframe_spark.ops.quality import winsorize

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], ["id", "x val-1"]
    )
    out = winsorize(df, ["x val-1"], lower=0.10, upper=0.90).toPandas()
    assert abs(out["x val-1_w"].min() - 10.9) < 1e-9
    assert abs(out["x val-1_w"].max() - 90.1) < 1e-9


def test_winsorize_preserves_nulls(spark):
    from tdataframe_spark.ops.quality import winsorize

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 100.0)], "id long, x double"
    )
    out = {r["id"]: r["x_w"] for r in winsorize(df, ["x"], 0.0, 1.0).collect()}
    assert out[2] is None
    assert out[1] == 1.0 and out[3] == 100.0


def test_snapshot_diff_detects_null_position_swap(spark):
    """concat_ws skips NULLs — without sentinel encoding, (v, NULL) and
    (NULL, v) hashed identically and a real change was missed."""
    from tdataframe_spark.ops.quality import snapshot_diff

    old = spark.createDataFrame([(1, "v", None)], "k int, a string, b string")
    new = spark.createDataFrame([(1, None, "v")], "k int, a string, b string")
    out = snapshot_diff(old, new, ["k"]).collect()
    assert [(r["k"], r["op"]) for r in out] == [(1, "changed")]


def test_expect_fk_null_keys_vacuously_pass(spark):
    from tdataframe_spark.ops.quality import expect_fk

    fact = spark.createDataFrame(
        [(1, 10), (2, None), (3, 99)], "id int, ref int"
    )
    dim = spark.createDataFrame([(10,)], "key int")
    out = expect_fk(fact, "fk", "ref", dim, "key").collect()[0]
    assert out["violations"] == 1  # only ref=99; NULL is not a violation


def test_robust_outliers_masks_nothing_and_handles_degenerate_mad(spark):
    """The MAD center ignores extreme values (a cluster of outliers can't
    mask itself like it does for the mean/sigma score), NULLs never flag,
    and a zero-MAD group flags exactly the off-median values."""
    from pyspark.sql import Row

    from tdataframe_spark.ops.quality import robust_outliers

    rows = [Row(g="a", x=float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11]]
    rows += [Row(g="a", x=1000.0), Row(g="a", x=1001.0), Row(g="a", x=None)]
    rows += [Row(g="b", x=5.0)] * 6 + [Row(g="b", x=9.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = robust_outliers(df, "x", keys=["g"]).collect()
    a = [r for r in out if r["g"] == "a"]
    assert {r["x"] for r in a if r["is_outlier"]} == {1000.0, 1001.0}
    assert all(not r["is_outlier"] for r in a if r["x"] is None)
    assert all(10.0 <= r["center"] <= 12.0 for r in a)  # center uncontaminated
    b = [r for r in out if r["g"] == "b"]
    # >50% identical values -> MAD 0: only the off-median value flags
    assert {r["x"] for r in b if r["is_outlier"]} == {9.0}
    assert all(r["robust_z"] == 0.0 for r in b if r["x"] == 5.0)


def test_corr_and_welch_match_numpy(spark):
    """The moment-based Pearson r and Welch t/df must agree with
    numpy/closed-form references on planted data (correlated + independent
    columns, unequal-variance groups)."""
    import math

    import numpy as np
    import pytest
    from pyspark.sql import Row

    from tdataframe_spark.queries import q_ab_test, q_corr_matrix  # noqa: F401

    rng = np.random.default_rng(3)
    x = rng.normal(10, 2, 400)
    y = 3 * x + rng.normal(0, 1, 400)        # strongly correlated
    z = rng.normal(0, 1, 400)                # independent
    df = spark.createDataFrame(
        [Row(l_quantity=float(a), l_extendedprice=float(b), l_discount=float(c))
         for a, b, c in zip(x, y, z)]
    )
    import tdataframe_spark.queries as Q

    orig = Q._t
    try:
        Q._t = lambda spark_, sf_, name_: df
        got = Q.q_corr_matrix(spark, "unused").first()
    finally:
        Q._t = orig
    assert got["n"] == 400
    assert got["r_qty_price"] == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-6)
    assert abs(got["r_qty_disc"]) < 0.2 and abs(got["r_price_disc"]) < 0.2
    # Welch: two groups with unequal variance
    a = rng.normal(5.0, 1.0, 300)
    b = rng.normal(5.5, 3.0, 200)
    ev = spark.createDataFrame(
        [Row(event_type="click", value=float(v)) for v in a]
        + [Row(event_type="purchase", value=float(v)) for v in b]
    )
    orig_ev = Q._events
    try:
        Q._events = lambda spark_, sf_: ev
        w = Q.q_ab_test(spark, "unused").first()
    finally:
        Q._events = orig_ev
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / 300 + vb / 200
    t_ref = (a.mean() - b.mean()) / math.sqrt(se2)
    df_ref = se2**2 / ((va / 300) ** 2 / 299 + (vb / 200) ** 2 / 199)
    # dsum stores moments in decimal(25,6): numpy agreement is bounded by
    # that 6-dp quantization of the sums, not by float error
    assert w["t_stat"] == pytest.approx(t_ref, rel=1e-5)
    assert w["welch_df"] == pytest.approx(df_ref, rel=1e-5)
    assert (w["n_a"], w["n_b"]) == (300, 200)


def test_roc_auc_matches_reference_with_ties(spark):
    """Grouped-score AUC equals the rank-statistic reference (average
    ranks for ties) on random scores with heavy ties; perfect and
    inverted separations hit 1 and 0; single-class data gives NULL."""
    import random

    from pyspark.sql import Row

    from tdataframe_spark.ops.classify import roc_auc

    rng = random.Random(11)
    rows = [
        Row(y=rng.randint(0, 1), s=float(rng.randint(0, 9)))  # heavy ties
        for _ in range(500)
    ] + [Row(y=1, s=None), Row(y=None, s=3.0)]
    df = spark.createDataFrame(rows, "y int, s double")
    got = roc_auc(df, "y", "s").first()

    data = [(r["y"], r["s"]) for r in rows if r["y"] is not None and r["s"] is not None]
    xs = sorted(data, key=lambda t: t[1])
    # average ranks per tied score group
    ranks, i = {}, 0
    while i < len(xs):
        j = i
        while j < len(xs) and xs[j][1] == xs[i][1]:
            j += 1
        avg = (i + 1 + j) / 2
        for k in range(i, j):
            ranks[k] = avg
        i = j
    pos = [k for k, (y, _) in enumerate(xs) if y == 1]
    P, N = len(pos), len(xs) - len(pos)
    auc_ref = (sum(ranks[k] for k in pos) - P * (P + 1) / 2) / (P * N)
    assert got["n_pos"] == P and got["n_neg"] == N
    assert abs(got["auc"] - auc_ref) < 1e-12

    perfect = spark.createDataFrame(
        [Row(y=0, s=1.0)] * 5 + [Row(y=1, s=2.0)] * 5, "y int, s double"
    )
    assert roc_auc(perfect, "y", "s").first()["auc"] == 1.0
    inv = spark.createDataFrame(
        [Row(y=1, s=1.0)] * 5 + [Row(y=0, s=2.0)] * 5, "y int, s double"
    )
    assert roc_auc(inv, "y", "s").first()["auc"] == 0.0
    onecls = spark.createDataFrame([Row(y=1, s=1.0)] * 3, "y int, s double")
    assert roc_auc(onecls, "y", "s").first()["auc"] is None


def test_confusion_stats_hand_computed(spark):
    from pyspark.sql import Row

    from tdataframe_spark.ops.classify import confusion_stats

    rows = [Row(y=1, s=0.9)] * 3 + [Row(y=1, s=0.1)] * 1          # 3 tp, 1 fn
    rows += [Row(y=0, s=0.8)] * 2 + [Row(y=0, s=0.2)] * 4          # 2 fp, 4 tn
    rows += [Row(y=None, s=0.9), Row(y=1, s=None)]                 # ignored
    got = confusion_stats(
        spark.createDataFrame(rows, "y int, s double"), "y", "s"
    ).first()
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (3, 2, 1, 4)
    assert got["precision"] == 3 / 5 and got["recall"] == 3 / 4
    assert got["f1"] == 6 / 9 and got["accuracy"] == 7 / 10
    # degenerate: nothing predicted positive -> precision NULL, not error
    neg = confusion_stats(
        spark.createDataFrame([Row(y=1, s=0.1)] * 3, "y int, s double"), "y", "s"
    ).first()
    assert neg["precision"] is None and neg["recall"] == 0.0


def test_bootstrap_ci_brackets_truth_and_is_deterministic(spark):
    """The hash-derived Poisson bootstrap: CI brackets the sample mean,
    narrows with sample size, is bit-identical across runs and
    partitionings, and replicate weights match the python reference."""
    import hashlib

    from pyspark.sql import Row

    from tdataframe_spark.ops.quality import _POIS1_CDF, bootstrap_mean_ci

    rows = [Row(i=i, x=float((i * 37) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "i long, x double")
    got = bootstrap_mean_ci(df, "x", "i", n_replicates=64).first()
    mean = sum(r.x for r in rows) / len(rows)
    assert got["n"] == 2000 and got["n_replicates"] == 64
    assert got["ci_lo"] < mean < got["ci_hi"]
    assert got["ci_hi"] - got["ci_lo"] < 10  # sane width for sd~29, n=2000
    again = bootstrap_mean_ci(df.repartition(13), "x", "i", n_replicates=64).first()
    assert (got["ci_lo"], got["ci_hi"]) == (again["ci_lo"], again["ci_hi"])

    # weight derivation parity with the reference recipe
    def ref_w(i, r):
        h = int(hashlib.md5(f"{i}|{r}|boot".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(2**60 + 1)
        for k, c in enumerate(_POIS1_CDF):
            if u < c:
                return k
        return len(_POIS1_CDF)

    small = spark.createDataFrame([Row(i=7, x=1.0), Row(i=8, x=2.0)])
    from pyspark.sql import functions as F
    from tdataframe_spark.functions.numeric import portable_hash64

    # reuse the op's own expression path via a 1-replicate run: the
    # replicate mean must equal the reference-weighted mean exactly
    one = bootstrap_mean_ci(small, "x", "i", n_replicates=2).first()
    w70, w80 = ref_w(7, 0), ref_w(8, 0)
    w71, w81 = ref_w(7, 1), ref_w(8, 1)
    ms = []
    for (wa, wb) in ((w70, w80), (w71, w81)):
        if wa + wb > 0:
            ms.append((wa * 1.0 + wb * 2.0) / (wa + wb))
    assert one["n_replicates"] == len(ms)
    # exact percentile interpolates between the two replicate means
    lo_ref = min(ms) + 0.025 * (max(ms) - min(ms))
    hi_ref = min(ms) + 0.975 * (max(ms) - min(ms))
    assert abs(one["ci_lo"] - lo_ref) < 1e-12 and abs(one["ci_hi"] - hi_ref) < 1e-12
    import pytest

    with pytest.raises(ValueError, match="n_replicates"):
        bootstrap_mean_ci(df, "x", "i", n_replicates=1)
