"""Distributed PCA over embedding columns (``array<float|double>``) —
dimension reduction for similarity search / clustering / dedup pipelines
(project 1024-dim embeddings to 64 before IVF/PQ indexing and the whole
downstream pipeline gets dim-proportionally cheaper).

Scale shape: ONE Arrow ``mapInPandas`` pass folds each record batch into a
single constant-size partial — (count, per-dim sum vector, d×d Gram
matrix) via one numpy matmul per batch — so only #batches tiny rows ever
shuffle (map-side combine to O(d²) state, the classic distributed
covariance shape; Spark MLlib's RowMatrix.computeCovariance does the
same reduction). The global reduce sums partials exactly in
DECIMAL(38,0); what reaches the driver is d + d² scalars — model-sized,
never data-sized. The d×d eigendecomposition runs on the driver
(numpy.linalg.eigh over a matrix that fits in L2 cache); projecting the
corpus back is JVM-side fold arithmetic against a broadcast 1-row
component table (large constants ride as DATA, not plan literals).

Determinism: vectors are quantized to integers (HALF_UP round of x·10⁶)
BEFORE any summation, so partial sums commute exactly and the covariance
matrix — hence the eigh result on a given platform — is bit-identical
under any partitioning or cluster size. Eigenvector sign is
canonicalized (the largest-|entry| component made positive). Eigh itself
is not SQL-expressible, so the registry entry is rows-only; model
properties (orthonormality, variance accounting, partitioning
invariance, isometry at full rank) are pinned in tests/test_pca.py.

Guardrails: per-batch int64 accumulation is overflow-checked against the
batch's actual magnitudes and raises rather than wrapping (numpy int64
wraps silently — the one place ANSI SQL can't catch it for us).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tdataframe_spark.core.partitioning import ensure_min_partitions
from tdataframe_spark.functions.vectors import dot

PCA_QUANT = 10**6  # quantization scale: embeddings carry ~7 significant
# digits (float32); 1e6 keeps them all while bounding batch sums


def _quantized(df: DataFrame, vec_col: str) -> DataFrame:
    """(``__q`` array<long>) — HALF_UP integer quantization, JVM-side."""
    return ensure_min_partitions(df).select(
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * PCA_QUANT).cast("long"),
        ).alias("__q")
    )


def _partial_moments(df_q: DataFrame, d: int) -> DataFrame:
    """One row per Arrow batch: (cnt, sum vector, row-major Gram matrix),
    all in quantized integer units. NULL or non-``d``-dim rows raise from
    inside the fold (a silent skip would bias the moments) — validation
    rides the single moments pass instead of costing its own corpus scan.
    """

    def fold(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf["__q"].to_numpy()
            bad = sum(1 for v in vals if v is None or len(v) != d)
            if bad:
                raise ValueError(
                    f"pca_train: {bad} rows with NULL or non-{d}-dim vectors"
                )
            a = np.stack(vals).astype(np.int64)
            n, _d = a.shape
            maxq = int(np.abs(a).max()) if a.size else 0
            # worst-case single Gram entry: n * maxq^2 must fit in int64
            if maxq and n * maxq * maxq >= 2**63:
                raise ValueError(
                    f"pca partial overflow risk: batch of {n} rows with "
                    f"|q|max={maxq} exceeds int64 Gram headroom; lower "
                    "spark.sql.execution.arrow.maxRecordsPerBatch or the "
                    "quantization scale"
                )
            yield pd.DataFrame(
                {
                    "cnt": [n],
                    "s": [a.sum(axis=0).tolist()],
                    "g": [(a.T @ a).reshape(-1).tolist()],
                }
            )

    return df_q.mapInPandas(fold, schema="cnt long, s array<long>, g array<long>")


def pca_train(
    df: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 8,
) -> dict:
    """Fit PCA on ``df[vec_col]``; returns a plain model dict:
    ``{dim, n, mean, components, explained_variance}`` with ``components``
    as ``n_components`` rows of length ``dim`` (population-covariance
    eigenvectors, descending eigenvalue, sign-canonicalized).

    Rows whose vector is NULL or of deviating length are rejected loudly
    from inside the single moments pass (a silent skip would bias the
    moments; a dedicated validation scan would double the corpus I/O).
    """
    import numpy as np

    first = df.select(F.size(F.col(vec_col)).alias("__d")).filter(
        F.col("__d") >= 0
    ).first()
    if first is None:
        raise ValueError("pca_train: empty input")
    d = first["__d"]
    if not (0 < n_components <= d):
        raise ValueError(f"n_components must be in [1, {d}]")

    parts = _partial_moments(_quantized(df, vec_col), d).persist()
    try:
        n = parts.agg(F.sum("cnt").cast("long").alias("n")).first()["n"]
        srows = (
            parts.select(F.posexplode("s").alias("__i", "__v"))
            .groupBy("__i")
            .agg(F.sum(F.col("__v").cast("decimal(38,0)")).alias("__s"))
            .collect()
        )
        grows = (
            parts.select(F.posexplode("g").alias("__i", "__v"))
            .groupBy("__i")
            .agg(F.sum(F.col("__v").cast("decimal(38,0)")).alias("__s"))
            .collect()
        )
    finally:
        parts.unpersist()
    s = np.zeros(d)
    for r in srows:
        s[r["__i"]] = float(int(r["__s"]))
    g = np.zeros(d * d)
    for r in grows:
        g[r["__i"]] = float(int(r["__s"]))
    g = g.reshape(d, d)

    q = float(PCA_QUANT)
    mean_q = s / n  # still in quantized units
    cov = (g / n - np.outer(mean_q, mean_q)) / (q * q)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(w)[::-1][:n_components]
    comps = v[:, order].T.copy()
    for row in comps:  # sign canonicalization: largest-|entry| positive
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    return {
        "dim": int(d),
        "n": int(n),
        "mean": (mean_q / q).tolist(),
        "components": [row.tolist() for row in comps],
        "explained_variance": [float(w[i]) for i in order],
    }


def pca_project(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project every vector onto the model's components:
    ``out[j] = x · component_j − mean · component_j`` — (id, ``out_col``
    array<double> of length n_components). The mean offsets are k driver
    constants (computed with the same left-fold order as the JVM dot), so
    each row does exactly one d-element fold per component over the RAW
    vector attribute — centering inside the lambda would re-materialize a
    d-element centered array per component (HOFs re-evaluate their body's
    subexpressions per call; there is no CSE across lambda invocations).
    The model rides as a broadcast 1-row table, never as plan literals.
    """
    if any(len(c) != model["dim"] for c in model["components"]):
        raise ValueError("model components do not match model dim")

    def _fold_dot(a: list, b: list) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    offsets = [_fold_dot(model["mean"], c) for c in model["components"]]
    spark = df.sparkSession
    mrow = spark.createDataFrame(
        [(model["components"], offsets)],
        "__comps array<array<double>>, __offs array<double>",
    )
    probe = F.assert_true(
        F.size(F.col(vec_col)) == model["dim"],
        F.lit(f"pca_project: vector dim != model dim {model['dim']}"),
    )
    return (
        ensure_min_partitions(df)
        .crossJoin(F.broadcast(mrow))
        .select(
            id_col,
            F.when(
                F.size(F.col(vec_col)) == model["dim"],
                F.zip_with(
                    F.transform(
                        F.col("__comps"), lambda c: dot(F.col(vec_col), c)
                    ),
                    F.col("__offs"),
                    lambda p, o: p - o,
                ),
            )
            .otherwise(F.transform(F.col("__comps"), lambda c: probe.cast("double")))
            .alias(out_col),
        )
    )
