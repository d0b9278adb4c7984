"""CSV / JSON / in-memory sources and file sinks.

The reference reads exactly one format (TTree files); an engine replacing it
for pipeline work needs the common interchange formats. These are thin typed
wrappers over Spark's readers/writers — schema-explicit by default, since
schema inference is a full extra pass over the data at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from tdataframe_spark.core.frame import Frame


def read_csv(
    spark: SparkSession,
    *paths: str,
    schema: StructType | str | None = None,
    header: bool = True,
    delimiter: str = ",",
    default_columns: Sequence[str] = (),
) -> Frame:
    reader = spark.read.option("header", header).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # extra pass; test-scale only
    return Frame(reader.csv(list(paths)), default_columns=default_columns)


def read_json(
    spark: SparkSession,
    *paths: str,
    schema: StructType | str | None = None,
    multiline: bool = False,
    default_columns: Sequence[str] = (),
) -> Frame:
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return Frame(reader.json(list(paths)), default_columns=default_columns)


def from_rows(
    spark: SparkSession, rows, schema: StructType | str | None = None
) -> Frame:
    """In-memory source (the reference's 'in-memory tree' ctor,
    /root/reference/TDataFrame.hxx:725)."""
    return Frame(spark.createDataFrame(rows, schema=schema))


def read_orc(
    spark: SparkSession,
    *paths: str,
    default_columns: Sequence[str] = (),
) -> Frame:
    """ORC source (schema is self-describing, like parquet; Spark's reader
    is vectorized and supports predicate pushdown + column pruning)."""
    return Frame(spark.read.orc(list(paths)), default_columns=default_columns)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def _robust_split(
    schema: StructType | str, corrupt_col: str, load
) -> tuple[DataFrame, DataFrame]:
    """Shared PERMISSIVE-quarantine plumbing for the robust readers:
    augment the schema with the corrupt-record column (on a COPY — never
    mutating the caller's StructType), parse via ``load``, and split into
    (good, bad).

    The parsed relation is cached: Spark disallows referencing ONLY the
    corrupt column of a lazy json/csv scan (SPARK-21610). The cache lives
    until session LRU eviction — per-batch callers should unpersist via
    ``spark.catalog.clearCache()`` (or persist `good`/`bad` themselves)
    between ingests.
    """
    from pyspark.sql.types import StringType, StructField

    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    full = StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType())]
    )
    df = load(full).cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return good, bad


def read_json_robust(
    spark: SparkSession,
    *paths: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSON ingestion that QUARANTINES instead of dropping or
    dying: returns (good, bad) where ``bad`` carries the raw unparseable
    line. At 100 TB some records are always malformed — silently losing
    them (DROPMALFORMED) breaks row accounting and FAILFAST kills the job
    a billion rows in; the quarantine table is what gets re-parsed or
    audited. Schema is required (schema inference is itself a full pass
    and guesses wrong on dirty data). Cache note: see ``_robust_split``.
    """
    return _robust_split(
        schema,
        corrupt_col,
        lambda full: (
            spark.read.schema(full)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .json(list(paths))
        ),
    )


def read_csv_robust(
    spark: SparkSession,
    *paths: str,
    schema: StructType | str,
    header: bool = True,
    delimiter: str = ",",
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """CSV twin of :func:`read_json_robust`: PERMISSIVE parse with the
    malformed raw line quarantined instead of silently nulled or fatally
    failed. Returns (good, bad). Cache note: see ``_robust_split``."""
    return _robust_split(
        schema,
        corrupt_col,
        lambda full: (
            spark.read.schema(full)
            .option("header", header)
            .option("sep", delimiter)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", corrupt_col)
            .csv(list(paths))
        ),
    )


def read_media_files(
    spark,
    path: str,
    kind: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Ingest raw media files as typed payload rows via Spark's built-in
    ``binaryFile`` source — the real-pipeline entry point to the
    multimodal ops (``attach_payload`` is the in-memory demo twin).
    Returns (media_id, kind, payload, n_bytes, path, mod_time) ready for
    ``decode_images`` / ``decode_audio`` / ``probe_metadata`` /
    ``extract_features``.

    Scale shape: listing and reading are ordinary distributed file-scan
    work (split by ``spark.sql.files.maxPartitionBytes``); payload bytes
    go executor→executor only, never through the driver. ``glob`` becomes
    ``pathGlobFilter`` so extension pruning happens during listing, before
    any byte is read. ``media_id`` is the xxhash64 of the file path —
    deterministic and join-stable across runs over the same layout.
    """
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    r = r.option("recursiveFileLookup", "true" if recursive else "false")
    df = r.load(path)
    return df.select(
        F.xxhash64("path").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("content").alias("payload"),
        F.col("length").cast("long").alias("n_bytes"),
        "path",
        F.col("modificationTime").alias("mod_time"),
    )
