"""Tabular feature engineering for training pipelines: deterministic
categorical index encoding and (leave-one-out) target encoding.

Reference parity note: absent from the reference (its surface is the
physics chain, SURVEY.md §2.1); these belong to the task sheet's
training-data-pipeline extension alongside ops/textstats' text features.

Scale shapes: vocabularies and category statistics are per-category
aggregate rows — bounded by cardinality, broadcast back map-side; the
corpus is never shuffled on the category key for encoding. Every encoded
value is integer-derived or decimal-accumulated, so encodings are
bit-identical across engines and partitionings (the repo's oracle
conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tdataframe_spark.functions.numeric import dsum


def encode_categorical(
    df: DataFrame,
    col: str,
    out_col: str | None = None,
    max_vocab: int = 2_000_000,
) -> DataFrame:
    """StringIndexer-style dense id per category value, assigned
    DETERMINISTICALLY: ids 0..V-1 in (frequency desc, value asc) order —
    no RNG, no partition order dependence, reproducible in any engine.
    NULL category encodes as NULL id. The vocabulary is a V-row aggregate
    broadcast back; at 100 TB the only full-data work is one hash
    aggregate on the category column.

    The id assignment never funnels the vocabulary through one task: it
    rides ``operators.windows.global_row_number`` — range-partition the
    V aggregate rows on (frequency desc, value asc), number inside each
    partition, add broadcast prefix offsets (one bounded ≤-partitions-row
    job). Ids ≥ ``max_vocab`` still RAISE in-plan (the guard rides the id
    expression — a high-cardinality column can't silently produce a
    vocabulary too big to broadcast back; use ``hash_features`` for
    unbounded-cardinality columns).
    """
    from tdataframe_spark.operators.windows import global_row_number

    out = out_col or f"{col}_id"
    counted = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    numbered = global_row_number(
        counted, [F.col("__n").desc(), F.col(col).asc()], out_col="__rn"
    )
    rn = F.col("__rn") - 1
    guarded = F.when(rn < max_vocab, rn).otherwise(
        F.assert_true(
            rn < max_vocab,
            F.lit(
                f"encode_categorical: {col!r} has > {max_vocab} distinct "
                "values — not a broadcastable vocabulary; raise max_vocab "
                "only if the broadcast still fits, or use hash_features"
            ),
        ).cast("int")
    )
    vocab = numbered.select(col, guarded.cast("int").alias(out))
    return df.join(F.broadcast(vocab), col, "left")


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    alpha: float = 10.0,
    leave_one_out: bool = True,
    out_col: str | None = None,
) -> DataFrame:
    """Smoothed target encoding of a categorical column:

        enc = (sum_cat [− own y] + α·global_mean) / (n_cat [− 1] + α)

    with the leave-one-out correction on by default (each row's own
    target is excluded — the standard guard against the target leaking
    into its own feature). Rows with NULL target contribute nothing and
    receive the non-LOO encoding; NULL categories encode as the global
    mean (pure prior).

    Determinism: category sums and the global mean are decimal-
    accumulated; the per-row arithmetic afterwards is IEEE-exact — the
    encoding is reproducible bit-for-bit in any engine (oracle-checked).
    Category stats are bounded aggregate rows broadcast back; one hash
    aggregate over the corpus, no shuffle of the data on the category.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    out = out_col or f"{cat_col}_te"
    y = F.col(target_col).cast("double")
    g = df.agg(
        dsum(y).alias("__gs"), F.count(y).alias("__gn")
    ).select((F.col("__gs") / F.col("__gn")).alias("__gm"))
    stats = (
        df.filter(F.col(cat_col).isNotNull() & y.isNotNull())
        .groupBy(cat_col)
        .agg(dsum(y).alias("__cs"), F.count(F.lit(1)).alias("__cn"))
    )
    j = df.join(F.broadcast(stats), cat_col, "left").crossJoin(F.broadcast(g))
    cs = F.coalesce(F.col("__cs"), F.lit(0.0))
    cn = F.coalesce(F.col("__cn"), F.lit(0).cast("long"))
    if leave_one_out:
        # the LOO correction only applies when the row's own target was
        # counted in the category stats — i.e. the category EXISTS in
        # stats (non-NULL category with >=1 non-null target). A NULL or
        # unseen category must take the plain smoothed prior, not
        # subtract itself from an empty group.
        in_stats = F.col("__cn").isNotNull() & y.isNotNull()
        own = F.when(in_stats, y).otherwise(F.lit(0.0))
        k = F.when(in_stats, F.lit(1)).otherwise(F.lit(0)).cast("long")
        # try_divide: ANSI mode otherwise RAISES on the alpha=0 +
        # singleton-LOO zero denominator; NULL falls through to the prior
        enc = F.try_divide(
            cs - own + F.lit(alpha) * F.col("__gm"),
            (cn - k).cast("double") + F.lit(alpha),
        )
    else:
        enc = F.try_divide(
            cs + F.lit(alpha) * F.col("__gm"),
            cn.cast("double") + F.lit(alpha),
        )
    # zero denominator (alpha=0 + empty/singleton group) → NULL; fall
    # back to the global prior rather than emitting NULL features
    return j.withColumn(
        out, F.coalesce(enc, F.col("__gm"))
    ).drop("__cs", "__cn", "__gm")


def _hash_features_arrow(
    df: DataFrame, cat_cols: list[str], num_cols: list[str], dim: int,
    out_col: str,
) -> DataFrame:
    """Arrow scatter path of :func:`hash_features`: one ``mapInPandas``
    pass, O(#cols) per row. Buckets are the SAME md5-derived hashes as
    the JVM path (first 15 hex digits of md5 → bigint, mod dim), computed
    with stdlib hashlib — bit-identical outputs, pinned in tests.

    Categorical values are stringified JVM-SIDE (``CAST(col AS STRING)``
    on helper columns) before they reach Python: stringifying in Python
    is partition-DEPENDENT — pandas promotes an int column to float64
    whenever a NULL shares its Arrow batch, so the same value would hash
    as ``'7.0'`` in one partition and ``'7'`` in another (and booleans as
    ``'True'`` vs Spark's ``'true'``). The helper columns also make the
    hot loop dtype-stable."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    cats, nums = list(cat_cols), list(num_cols)
    helpers = {c: f"__hs_{i}" for i, c in enumerate(cats)}
    prep = df
    for c, hc in helpers.items():
        prep = prep.withColumn(hc, F.col(c).cast("string"))
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()))]
    )
    out_cols = [f.name for f in schema.fields]

    def run(batches):
        import hashlib

        import numpy as np

        def bucket(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % dim

        num_buckets = [bucket(c) for c in nums]
        for pdf in batches:
            n = len(pdf)
            out = np.zeros((n, dim), np.float64)
            for c in cats:
                vals = pdf[helpers[c]]  # Spark-cast strings (or None)
                for i, v in enumerate(vals):
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    out[i, bucket(f"{c}={v}")] += 1.0
            for c, b in zip(nums, num_buckets):
                v = pd.to_numeric(pdf[c], errors="coerce").to_numpy(np.float64)
                mask = ~np.isnan(v)
                out[mask, b] += v[mask]
            pdf = pdf.copy()
            pdf[out_col] = [row.tolist() for row in out]
            yield pdf[out_cols]

    return prep.mapInPandas(run, schema)


def hash_features(
    df: DataFrame,
    cat_cols: list[str],
    num_cols: list[str] | None = None,
    dim: int = 256,
    out_col: str = "features",
    method: str = "auto",
) -> DataFrame:
    """The hashing trick: map arbitrary categorical (and numeric) columns
    into a fixed ``dim``-dimensional dense double vector — the bridge
    from tabular rows to the vector consumers (``logreg_train``,
    ``cosine_topk``, PCA) without a fitted vocabulary. Each categorical
    value contributes 1.0 at bucket ``portable_hash64('col=value') % dim``
    (collisions sum, the standard trade); each numeric column contributes
    its value at the fixed bucket of its name. NULL and NaN values
    contribute nothing (identically in both physical paths).

    Stateless and vocabulary-free: unlike ``encode_categorical`` there is
    nothing to fit, broadcast, or drift — new categories at inference
    time hash to stable buckets.

    Two physical strategies, identical outputs (pinned equal in tests):

    * ``method="jvm"`` — pure JVM expressions; embarrassingly parallel;
      per-row cost O(dim × #cols): the output vector is assembled by
      scanning the #cols entry structs once per output index (Spark's
      expression language has no scatter primitive, and every
      alternative — fold-into-accumulator-array, map-then-element_at —
      re-walks one side per step, so this shape is as good as it gets
      JVM-side; at dim≈256 it beats an Arrow round-trip comfortably).
    * ``method="arrow"`` — one Arrow ``mapInPandas`` pass doing the true
      O(#cols) numpy scatter per row (same md5-derived buckets, computed
      in Python, bit-identical): removes the JVM shape's dim ceiling for
      wide vectors.
    * ``method="auto"`` (default) — JVM up to ``dim <= 512``, Arrow past
      it.
    """
    from tdataframe_spark.functions.numeric import portable_hash64

    if dim < 1:
        raise ValueError("dim must be >= 1")
    if not cat_cols and not num_cols:
        raise ValueError("need at least one feature column")
    if method not in ("auto", "jvm", "arrow"):
        raise ValueError(f"unknown method {method!r}")
    if method == "arrow" or (method == "auto" and dim > 512):
        return _hash_features_arrow(df, cat_cols, num_cols or [], dim, out_col)
    entries = []  # (bucket expr, value expr) contributions
    for c in cat_cols:
        b = F.pmod(
            portable_hash64(F.concat(F.lit(c + "="), F.col(c).cast("string"))),
            F.lit(dim),
        )
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(b.cast("int").alias("b"), F.lit(1.0).alias("v")),
            )
        )
    for c in num_cols or []:
        b = F.pmod(portable_hash64(F.lit(c)), F.lit(dim))
        # NaN contributes nothing, same as NULL — the Arrow path masks
        # NaN out (~isnan), and without this guard the JVM path would
        # add it and poison the whole bucket sum to NaN
        entries.append(
            F.when(
                F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double")),
                F.struct(
                    b.cast("int").alias("b"),
                    F.col(c).cast("double").alias("v"),
                ),
            )
        )
    ent = F.filter(F.array(*entries), lambda e: e.isNotNull())
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            F.filter(F.col("__ent"), lambda e: e["b"] == i),
            F.lit(0.0),
            lambda acc, e: acc + e["v"],
        ),
    )
    return (
        df.withColumn("__ent", ent)
        .withColumn(out_col, vec)
        .drop("__ent")
    )
