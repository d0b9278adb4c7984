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
