"""Nearest-class-centroid classification over an embedding column — the
minimal "train a model, evaluate it" pipeline as pure declarative ops.

The reference has no ML surface (its UDF actions are the extension point,
/root/reference/TDataFrame.hxx:805-839); this is north-star LLM-pipeline
capability: score / route / quality-gate 100 TB of embedded documents with
a model small enough to broadcast.

Scale design:
- "training" (per-class centroids) is ONE shuffle of (label, dim) keyed
  partial sums — map-side combine collapses each partition to
  ≤ classes×dim rows before the exchange, independent of row count.
- inference broadcasts the centroid table (classes×dim doubles — tiny) and
  scores map-side; the per-vector argmax folds 10 candidate rows into one
  via a partial max BEFORE any shuffle, so the exchange carries one row
  per vector, and the confusion matrix is a classes² aggregate.

Determinism (oracle-parity) design: embeddings are float32 with content in
every decimal digit, where Spark's and DuckDB's double→DECIMAL casts
disagree in the last place — so decimal accumulation is NOT usable here.
Instead each element is quantized to an integer (ROUND(x·10^6) — HALF_UP
rounds identically in both engines), centroid sums become EXACT int64
arithmetic, and every downstream double (centroid = sum/(scale·n), dot
fold) is derived from identical inputs by identical IEEE ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def quantize_vec(vec: Column, scale: int = QUANT_SCALE) -> Column:
    """array<float> → array<bigint> of ROUND(x·scale): portable exact
    representation (HALF_UP/away-from-zero agree across engines)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * scale, 0).cast("long")
    )


def class_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """(label, centroid: array<double>, n): per-class element-wise mean.

    posexplode → (label, pos) integer partial sums → ordered re-assembly.
    Exact integer accumulation ⇒ identical centroids on any partitioning.
    """
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(quantize_vec(F.col(vec_col), scale)).alias("pos", "q"),
    )
    per_dim = ex.groupBy("label", "pos").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.withColumn(
            "c", F.col("s").cast("double") / (F.lit(float(scale)) * F.col("n"))
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda t: t["c"],
            ).alias("centroid"),
            F.max("n").cast("long").alias("n"),
        )
    )


def dot_q(qvec: Column, cent: Column) -> Column:
    """Ordered left-fold dot product of a quantized (int) vector and a
    centroid (double) vector — same fold DuckDB's list_reduce computes."""
    return F.aggregate(
        F.zip_with(qvec, cent, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def nearest_centroid_confusion(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = QUANT_SCALE,
) -> DataFrame:
    """Leave-nothing-out nearest-centroid evaluation: centroids from the
    full table, every vector classified to its max-dot centroid (ties →
    smallest label), returned as a (true label, predicted label, count)
    confusion matrix. Labels must be integer-typed (the partial-aggregable
    argmax negates them for the tie-break; predictions are returned in the
    label column's own type, never narrowed)."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    ltype = df.schema[label_col].dataType
    if not isinstance(ltype, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"nearest_centroid_confusion needs an integer label column; "
            f"{label_col!r} is {ltype.simpleString()} — map labels to ids first"
        )
    cents = class_centroids(df, label_col, vec_col, scale).select(
        F.col("label").alias("__class"), "centroid"
    )
    e = df.select(
        F.col(id_col).alias("__vid"),
        F.col(label_col).alias("label"),
        quantize_vec(F.col(vec_col), scale).alias("__q"),
    )
    scored = e.join(F.broadcast(cents)).select(
        "__vid",
        "label",
        "__class",
        dot_q(F.col("__q"), F.col("centroid")).alias("__dot"),
    )
    # argmax by (dot desc, class asc) as a partial-aggregable max of
    # (dot, -class): one row per vector crosses the shuffle
    pred = scored.groupBy("__vid", "label").agg(
        (-F.max(F.struct(F.col("__dot").alias("d"),
                         (-F.col("__class")).alias("nc")))["nc"]).alias("pred")
    )
    return (
        pred.groupBy(
            "label", F.col("pred").cast(ltype.simpleString()).alias("pred")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


GRAD_QUANT = 10**9  # gradient-contribution quantization: each row's
# e·x_j term is HALF_UP-rounded to 1e-9 before summation so gradient
# accumulation is exact integer math — partitioning/batching-invariant
# (the PCA moment-pass discipline applied to a transcendental-valued
# per-row quantity that cannot be quantized input-side)


def logreg_train(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    positive=0,
    n_iter: int = 30,
    learning_rate: float = 1.0,
    l2: float = 0.0,
) -> dict:
    """Binary (one-vs-rest) logistic regression over an embedding column:
    returns ``{dim, n, weights, bias, positive}`` for ``logreg_score`` —
    the TRAINABLE quality-classifier stage of a curation pipeline
    (fastText-style routing: label a small seed set, score the corpus).

    Full-batch gradient descent: each iteration is ONE Arrow map pass
    folding every record batch to a (d+1)-int partial gradient (numpy
    sigmoid per batch, contributions quantized to ``1/GRAD_QUANT`` then
    summed as int64 with an overflow guard), one exact DECIMAL(38,0)
    reduce, and a driver-side update of d+1 doubles. Shuffle volume per
    iteration is #batches tiny rows; nothing data-proportional ever
    reaches the driver. At 100 TB you would subsample to a training split
    first (``group_split``/``weighted_sample``) — the full corpus is for
    SCORING, which is a single map-side pass.

    Determinism: quantized integer gradients commute exactly, so the
    trained model is bit-identical under any partitioning or Arrow batch
    boundary (tested); per-iteration float updates on the driver are
    plain IEEE on identical inputs.
    """
    from collections.abc import Iterator

    import numpy as np

    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    first = df.select(F.size(F.col(vec_col)).alias("__d")).filter(
        F.col("__d") >= 0
    ).first()
    if first is None:
        raise ValueError("logreg_train: empty input")
    d = first["__d"]

    src = df.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
        (F.col(label_col) == F.lit(positive)).cast("double").alias("__y"),
    )
    n_total = src.count()  # constant across iterations — computed once

    w = np.zeros(d)
    b = 0.0
    for _ in range(n_iter):
        w_c, b_c = w.copy(), b  # bind per-iteration constants

        def fold(batches: Iterator, w_c=w_c, b_c=b_c) -> Iterator:
            import numpy as np
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vals = pdf["__v"].to_numpy()
                bad = sum(1 for v in vals if v is None or len(v) != d)
                if bad:
                    raise ValueError(
                        f"logreg_train: {bad} rows with NULL or non-{d}-dim "
                        "vectors"
                    )
                a = np.stack(vals).astype(np.float64)
                y = pdf["__y"].to_numpy().astype(np.float64)
                # NaN/NULL features or labels would corrupt silently:
                # NaN fails every comparison (bypassing the overflow
                # guard) and astype(int64) turns it into INT64_MIN
                if not np.isfinite(a).all() or not np.isfinite(y).all():
                    raise ValueError(
                        "logreg_train: non-finite feature or NULL/NaN label "
                        "in batch — clean or filter the training rows first"
                    )
                z = a @ w_c + b_c
                p = 1.0 / (1.0 + np.exp(-z))
                e = p - y  # in (-1, 1)
                # d feature contributions + the bias term as column d:
                # ONE partial array, one downstream aggregation job
                contrib = np.concatenate([e[:, None] * a, e[:, None]], axis=1)
                q = np.sign(contrib) * np.floor(
                    np.abs(contrib) * GRAD_QUANT + 0.5
                )
                maxq = float(np.abs(q).max()) if q.size else 0.0
                if maxq and len(a) * maxq >= 2**63:
                    raise ValueError(
                        "logreg_train: batch gradient exceeds int64 headroom;"
                        " lower arrow batch size or rescale features"
                    )
                yield pd.DataFrame(
                    {"g": [q.astype(np.int64).sum(axis=0).tolist()]}
                )

        grows = (
            src.mapInPandas(fold, schema="g array<long>")
            .select(F.posexplode("g").alias("__i", "__v"))
            .groupBy("__i")
            .agg(F.sum(F.col("__v").cast("decimal(38,0)")).alias("__s"))
            .collect()
        )
        if not grows:
            raise ValueError("logreg_train: empty input")
        g = np.zeros(d + 1)
        for r in grows:
            g[r["__i"]] = float(int(r["__s"]))
        g /= GRAD_QUANT * n_total
        w = w - learning_rate * (g[:d] + l2 * w)
        b = b - learning_rate * g[d]
    return {
        "dim": int(d),
        "n": int(n_total),
        "weights": w.tolist(),
        "bias": float(b),
        "positive": positive,
    }


def logreg_score(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "prob",
) -> DataFrame:
    """Score every row with the trained model: (id, ``out_col`` =
    sigmoid(x·w + b)) — a pure map-side JVM fold against a broadcast
    1-row weight table; the single corpus pass that gates/routes 100 TB.
    """
    from tdataframe_spark.core.partitioning import ensure_min_partitions
    from tdataframe_spark.functions.vectors import dot

    if len(model["weights"]) != model["dim"]:
        raise ValueError("model weights do not match model dim")
    spark = df.sparkSession
    mrow = spark.createDataFrame(
        [(model["weights"], float(model["bias"]))],
        "__w array<double>, __b double",
    )
    z = dot(F.col(vec_col), F.col("__w")) + F.col("__b")
    # a shorter/longer vector would zip_with-pad to NULL → silent NULL
    # prob a downstream `prob >= t` gate drops invisibly — raise instead
    # (the pca_project dim-guard pattern: the assert rides the otherwise
    # branch so the NULL short-circuit can't skip it)
    probe = F.assert_true(
        F.size(F.col(vec_col)) == model["dim"],
        F.lit(f"logreg_score: vector dim != model dim {model['dim']}"),
    )
    return (
        ensure_min_partitions(df)
        .crossJoin(F.broadcast(mrow))
        .select(
            id_col,
            F.when(
                F.size(F.col(vec_col)) == model["dim"],
                F.lit(1.0) / (F.lit(1.0) + F.exp(-z)),
            )
            .otherwise(probe.cast("double"))
            .alias(out_col),
        )
    )


def _auc_partitioned_scores(
    df,
    label_col: str,
    score_col: str,
    num_partitions: int | None = None,
):
    """The pre-checkpoint stage of ``roc_auc``: distinct-score (n_pos,
    n_neg) counts, RANGE-partitioned on the score and stamped with the
    partition id. Split out so the plan pin can assert the range exchange
    directly (the checkpoint in ``roc_auc`` truncates it out of the
    downstream plan). Returns (DataFrame, num_partitions)."""
    from pyspark.sql import functions as F

    y = F.col(label_col).cast("int")
    s = F.col(score_col).cast("double")
    g = (
        df.filter(y.isNotNull() & s.isNotNull())
        .groupBy(s.alias("__s"))
        .agg(
            F.sum(y).cast("long").alias("__p"),
            F.sum(1 - y).cast("long").alias("__n"),
        )
    )
    spark = df.sparkSession
    nparts = int(
        num_partitions
        or spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    staged = g.repartitionByRange(nparts, "__s").withColumn(
        "__pid", F.spark_partition_id()
    )
    return staged, nparts


def roc_auc(
    df,
    label_col: str,
    score_col: str,
    num_partitions: int | None = None,
):
    """Exact ROC AUC with proper tie handling, computed WITHOUT a global
    row sort OR a single-task cumulative window: rows collapse to
    per-distinct-score (n_pos, n_neg) counts first, then the running
    negative count below each score is built with TWO-LEVEL cumulation —

    1. range-partition the distinct-score table on the score (every
       partition holds a contiguous score range);
    2. per-partition running sums via a window PARTITIONED by the range
       partition id (bounded per-task work on any score distribution —
       continuous scores with distinct ≈ n rows stay distributed);
    3. one bounded job collects ≤ num_partitions per-partition negative
       totals, whose prefix sums re-enter as a broadcast map literal.

    The tie-crediting formula is unchanged:

        AUC = Σ_s n_pos(s) · (cum_neg_below(s) + n_neg(s)/2) / (P·N)

    Rows with NULL label or score are ignored. Integer counts make every
    term exact (so the result is bit-identical under any partitioning or
    range-boundary placement); the final division is one IEEE op —
    engine-reproducible.

    The range-partitioned score table is localCheckpoint-ed, not merely
    persisted: the range exchange SAMPLES its boundaries, so losing the
    cached partitions AND their shuffle files would re-place rows on
    recompute and silently stale the collected per-partition offsets.
    Checkpointing truncates the lineage — row placement can never be
    recomputed differently; loss is a loud error, and no cache entry
    leaks across repeated calls.

    Returns a 1-row DataFrame (n_pos, n_neg, auc); AUC is NULL when
    either class is empty (undefined).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    staged, nparts = _auc_partitioned_scores(
        df, label_col, score_col, num_partitions
    )
    # the totals job below materializes the lazy checkpoint
    part = staged.localCheckpoint(eager=False)
    totals = {
        r["__pid"]: r["t"]
        for r in part.groupBy("__pid")
        .agg(F.sum("__n").alias("t"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in range(nparts):
        offsets[pid] = acc
        acc += int(totals.get(pid) or 0)
    omap = F.create_map(
        *[
            x
            for pid in range(nparts)
            for x in (F.lit(pid), F.lit(offsets[pid]).cast("long"))
        ]
    )
    # decimal(38,0) accumulation: cum_neg·n_pos terms (and their sum)
    # exceed int64 beyond ~6e9 balanced rows — exactly the target scale;
    # ANSI mode would raise, non-ANSI would wrap to a garbage AUC
    dec = "decimal(38,0)"
    w = (
        Window.partitionBy("__pid")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_below = (
        F.element_at(omap, F.col("__pid")).cast(dec)
        + F.coalesce(F.sum("__n").over(w), F.lit(0)).cast(dec)
    )
    terms = part.select(
        "__p",
        "__n",
        (cum_below * F.col("__p").cast(dec)).alias("__full"),
        (F.col("__p").cast(dec) * F.col("__n").cast(dec)).alias("__half"),
    )
    agg = terms.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        F.sum("__n").cast("long").alias("n_neg"),
        F.sum("__full").alias("__f"),
        F.sum("__half").alias("__h"),
    )
    # 2f+h stays integral in decimal (no /2 rounding); denominators go to
    # double BEFORE multiplying so P·N cannot overflow either
    return agg.select(
        "n_pos",
        "n_neg",
        F.try_divide(
            (F.lit(2).cast(dec) * F.col("__f") + F.col("__h")).cast("double"),
            F.lit(2.0) * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"),
        ).alias("auc"),
    )


def confusion_stats(
    df,
    label_col: str,
    score_col: str,
    threshold: float = 0.5,
):
    """Thresholded binary-classification report in ONE aggregate pass:
    (tp, fp, fn, tn, precision, recall, f1, accuracy). Counts are exact
    integers; the derived ratios are single IEEE divisions (try_divide —
    an empty denominator yields NULL, not an error). Rows with NULL label
    or score are ignored."""
    from pyspark.sql import functions as F

    y = F.col(label_col).cast("int")
    pred = (F.col(score_col).cast("double") >= F.lit(threshold)).cast("int")
    d = df.filter(y.isNotNull() & F.col(score_col).isNotNull())
    c = d.agg(
        F.sum(y * pred).cast("long").alias("tp"),
        F.sum((1 - y) * pred).cast("long").alias("fp"),
        F.sum(y * (1 - pred)).cast("long").alias("fn"),
        F.sum((1 - y) * (1 - pred)).cast("long").alias("tn"),
    )
    prec = F.try_divide(
        F.col("tp").cast("double"), (F.col("tp") + F.col("fp")).cast("double")
    )
    rec = F.try_divide(
        F.col("tp").cast("double"), (F.col("tp") + F.col("fn")).cast("double")
    )
    return c.select(
        "tp", "fp", "fn", "tn",
        prec.alias("precision"),
        rec.alias("recall"),
        F.try_divide(
            2 * F.col("tp").cast("double"),
            (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
        ).alias("f1"),
        (
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")).cast("double")
        ).alias("accuracy"),
    )
