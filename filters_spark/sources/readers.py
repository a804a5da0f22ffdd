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
    "read_csv",
    "read_json",
    "split_corrupt",
]

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
