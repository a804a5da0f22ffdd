"""Malformed-record-aware CSV / JSON readers (SURVEY.md §2.9
scans/sources row).

The reference has no I/O layer, but its three invalid-value handler
strategies (`filters/handlers.py::ExceptionHandler / LogHandler /
MemoryHandler`) map ONE-TO-ONE onto Spark's reader parse modes —
that correspondence is the design of this module:

* ``MemoryHandler`` (accumulate errors, keep going) → ``PERMISSIVE``
  + ``columnNameOfCorruptRecord``: malformed lines land in a corrupt
  column on the same row; :func:`split_corrupt` yields the
  (clean, dead-letter) pair, exactly like ``ValidationResult``.
* ``LogHandler`` (drop + log) → ``DROPMALFORMED``.
* ``ExceptionHandler`` (fail fast) → ``FAILFAST``.

Scale notes:

* The schema is REQUIRED.  ``inferSchema``/schema-of-json sampling is
  an extra full pass over 100 TB of text and non-deterministic under
  sampling — parse errors must be data, not job structure.
* Text formats don't push filters or prune columns; the pattern at
  scale is read-validate-write-parquet ONCE, query the parquet.
* The corrupt column must be queried via a materialized split
  (``.cache()``/write) or declared in the schema — Spark removes it
  from pure column pruning paths otherwise (SPARK-38523 semantics:
  referencing only the corrupt column is disallowed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "CORRUPT_COL",
    "read_avro",
    "write_avro",
    "read_csv",
    "read_json",
    "read_orc",
    "write_orc",
    "read_xml",
    "write_xml",
    "read_tar_shards",
    "read_text_docs",
    "read_media_dir",
    "read_evolving",
    "split_corrupt",
]

from .avroio import read_avro, write_avro  # noqa: F401  (format family)

CORRUPT_COL = "_corrupt_record"

_MODES = {"PERMISSIVE", "DROPMALFORMED", "FAILFAST"}


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """Schema + the corrupt-record column (declared explicitly so the
    reader retains raw text for malformed rows under column pruning)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType,
             mode: str = "PERMISSIVE", header: bool = True,
             **options: str) -> DataFrame:
    """CSV with explicit schema and handler-style parse mode.  In
    PERMISSIVE mode the returned frame carries ``_corrupt_record``
    (null = parsed clean); feed it to :func:`split_corrupt`."""
    mode = mode.upper()
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}")
    reader = (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .option("mode", mode)
        .options(**options)
    )
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        return reader.schema(_with_corrupt(schema)).load(path)
    return reader.schema(schema).load(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType,
              mode: str = "PERMISSIVE", **options: str) -> DataFrame:
    """JSON-lines with explicit schema and handler-style parse mode
    (same contract as :func:`read_csv`)."""
    mode = mode.upper()
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}")
    reader = spark.read.format("json").option("mode", mode).options(**options)
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
        return reader.schema(_with_corrupt(schema)).load(path)
    return reader.schema(schema).load(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None,
             **options: str) -> DataFrame:
    """ORC with schema-on-read (the other columnar warehouse format
    beside parquet — Hive-lineage lakes are full of it).  ORC is a
    binary columnar container: there is no PERMISSIVE corrupt-record
    concept (a damaged stripe is an error, not a row), so the handler
    contract here is the explicit schema — missing columns null out
    and extra columns are never read, exactly the
    :func:`read_evolving` promise.  Predicate pushdown and column
    pruning work like parquet (Spark's native vectorized ORC
    reader)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite",
              partition_by: list | None = None,
              compression: str = "zlib") -> None:
    """ORC sink twin of :func:`read_orc` (zlib is ORC's ubiquitous
    default; snappy/zstd accepted)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_xml(spark: SparkSession, path: str, row_tag: str,
             schema: T.StructType | None = None,
             **options: str) -> DataFrame:
    """XML ingestion via Spark 4's NATIVE xml source (the feed/config/
    export format legacy pipelines still emit): one row per
    ``row_tag`` element, attributes surfaced as ``_``-prefixed
    columns (``attributePrefix`` default), nested elements as
    structs, entity escaping handled by the parser.  Schema-on-read
    carries the :func:`read_evolving` contract (missing columns null
    out, extra elements unread); without a schema Spark infers by
    sampling (a second pass — always pass a schema in production).
    PERMISSIVE mode + ``columnNameOfCorruptRecord`` work like JSON/CSV
    for malformed records (:func:`split_corrupt` composes).

    Scale note: row-tag record splitting lets tasks scan slices of
    large uncompressed files, but XML parsing is row-at-a-time
    (no vectorized reader) — convert to parquet/ORC at the ingestion
    boundary; gzip-compressed XML is additionally non-splittable
    (one task per file)."""
    reader = spark.read.option("rowTag", row_tag).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("xml").load(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row",
              root_tag: str = "rows", mode: str = "overwrite",
              **options: str) -> None:
    """XML sink twin of :func:`read_xml` (one ``row_tag`` element per
    row under one ``root_tag`` document per file; ``_``-prefixed
    columns become attributes, struct columns nested elements, and
    the writer escapes markup characters so a roundtrip is lossless
    — ``rel_xml_roundtrip`` hash-gates escaping + attributes +
    nesting + evolution end to end)."""
    (df.write.mode(mode).option("rowTag", row_tag)
       .option("rootTag", root_tag).options(**options)
       .format("xml").save(path))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, dead_letter) from a PERMISSIVE read — the reader-level
    twin of ``ValidationResult.clean`` / ``.rejected``.  Clean rows
    drop the corrupt column; dead-letter rows keep only it (the raw
    line is the whole payload for replay)."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"no {CORRUPT_COL!r} column — was this read in PERMISSIVE mode?"
        )
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad


def read_text_docs(spark: SparkSession, path: str,
                   whole_file: bool = False,
                   min_length: int = 1) -> DataFrame:
    """Raw-text corpus ingestion → (doc_id, path, text).

    ``whole_file=False`` (default): one document per LINE
    (``spark.read.text`` — splittable, each task reads a slice of
    each file; the 100 TB shape for jsonl-adjacent line corpora).
    ``whole_file=True``: one document per FILE (``wholetext`` —
    NON-splittable, one task per file; only for corpora already
    sharded into many small files).

    ``doc_id`` is the xxhash64 of (path, text) — content-derived, so
    it is stable across re-reads, re-partitioning, and file moves
    within the same relative layout, unlike
    ``monotonically_increasing_id`` (which re-rolls with the
    partition layout and silently breaks incremental dedup joins).
    Identical lines in the same file collapse to one id — exactly
    what an exact-dedup stage would do anyway; disambiguate upstream
    if duplicates must survive.  Blank/short lines are dropped by
    ``min_length``.
    """
    df = (
        spark.read.text(path, wholetext=whole_file)
        .select(F.input_file_name().alias("path"),
                F.col("value").alias("text"))
        .where(F.length("text") >= min_length)
    )
    return df.select(
        F.xxhash64("path", "text").alias("doc_id"), "path", "text")


def read_media_dir(spark: SparkSession, path: str,
                   pattern: str | None = None,
                   max_bytes: int | None = None) -> DataFrame:
    """Binary media ingestion via Spark's built-in ``binaryFile``
    source → (path, modificationTime, length, content) with the
    payload as an opaque BinaryType column — the entry point for
    ``functions.multimodal`` (its media-struct convention wraps
    these columns).

    Scale notes: binaryFile is NOT splittable (one task per file) and
    caps single payloads at ``spark.sql.sources.binaryFile.maxLength``
    (int32 ~2 GB); ``pattern`` (e.g. ``*.jpg``) prunes at LISTING
    time, before any read; ``max_bytes`` pushes a length predicate
    that skips oversized payloads WITHOUT reading their bytes (the
    filter is served from file status metadata).  After ingestion,
    re-partition by sampled payload bytes
    (``multimodal.repartition_for_media``) — file counts are the
    wrong partitioning unit when sizes span 10 KB–1 GB.
    """
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.where(F.col("length") <= max_bytes)
    return df


def read_evolving(spark: SparkSession, path: str,
                  target_schema: T.StructType,
                  fmt: str = "parquet") -> DataFrame:
    """Read a corpus written ACROSS SCHEMA VERSIONS, reconciled to
    one target schema — the long-lived-dataset reality: month-1
    files lack columns month-6 files carry, an id column was widened
    int → bigint along the way, and a deprecated column lingers in
    old fragments.

    Design: SCHEMA-ON-READ, not mergeSchema.  The target schema is
    handed to the reader, so

    * a column absent from a fragment materializes as typed NULLs
      (Spark's missing-column contract),
    * deprecated columns are never even READ (column pruning at the
      footer level — they cost nothing),
    * numeric widening (int32 fragment → bigint target, float →
      double) rides the parquet reader's type promotion,
    * and NO footer merge happens — ``mergeSchema`` both costs a
      listing pass per query AND refuses exactly the int→bigint
      drift this helper exists for
      (``cannotMergeIncompatibleDataTypesError``, measured).

    Incompatible drift (int → string rebrands) fails loudly at read
    time — the ingest-edge contract: corrupt reconciliation must
    never be silent.  Scale shape: pure scan-side, zero shuffles,
    pruning intact at any corpus size.
    """
    return (spark.read.format(fmt)
            .schema(target_schema).load(path)
            .select(*[f.name for f in target_schema.fields]))


def read_tar_shards(spark: SparkSession, path: str,
                    member_filter: str | None = None) -> DataFrame:
    """Webdataset-style tar-shard ingestion — THE layout multimodal
    training corpora ship in (shards of ~100-500 MB tar files, one
    member per sample component): ``binaryFile`` reads each shard
    whole (shards are sized to fit an executor by the format's own
    convention), and an Arrow-batched map unpacks members with
    stdlib ``tarfile`` → one row per member
    (shard_path, member_name, payload binary, member_bytes).

    Scale shape: parallelism = number of shards (the format exists
    precisely so object stores serve few large sequential reads
    instead of millions of tiny ones); payload bytes cross to Python
    once and come back as an opaque binary column — feed
    ``multimodal.attach_meta`` downstream.  ``member_filter`` is a
    substring filter applied INSIDE the unpacker (e.g. '.jpg'), so
    unwanted members never materialize as rows."""
    import pyspark.sql.types as T

    bf = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.tar").load(path)
          .select("path", "content"))
    out_schema = T.StructType([
        T.StructField("shard_path", T.StringType()),
        T.StructField("member_name", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("member_bytes", T.LongType()),
    ])

    def unpack(batches):
        import io
        import tarfile

        import pandas as pd

        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content)),
                                  mode="r") as tf:
                    for m in tf.getmembers():
                        if not m.isfile():
                            continue
                        if member_filter and member_filter not in m.name:
                            continue
                        data = tf.extractfile(m).read()
                        rows.append((p, m.name, data, len(data)))
            yield pd.DataFrame(rows, columns=["shard_path", "member_name",
                                              "payload", "member_bytes"])

    return bf.mapInPandas(unpack, out_schema)
