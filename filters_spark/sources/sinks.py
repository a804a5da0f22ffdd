"""Sinks (SURVEY.md §2.9 sinks row): clean/dead-letter writers,
partitioned + bucketed outputs.

The reference's only "sink" is the MemoryHandler error dict; at
engine scale the equivalents are:

* clean rows → partitioned parquet (analysis-ready),
* rejected rows + error payloads → a dead-letter table keyed by
  (field, code) for replay and triage,
* error-code rollups → a small metrics table.

Scale notes: partition columns must be low-cardinality (date, source)
— never high-cardinality keys; bucketed writes pre-shuffle ONCE so
downstream joins on the bucket key skip their exchange entirely
(requires saveAsTable — bucket metadata lives in the catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schema import ERRORS_COL, ValidationResult

__all__ = [
    "write_clean",
    "write_dead_letter",
    "write_error_metrics",
    "write_bucketed",
]


def write_clean(result: ValidationResult, path: str,
                partition_by: list[str] | None = None,
                fmt: str = "parquet", mode: str = "append") -> None:
    w = result.clean.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def write_dead_letter(result: ValidationResult, path: str,
                      fmt: str = "parquet", mode: str = "append") -> None:
    """Rejected rows with their error payloads, partitioned by the
    first error's code so triage reads only the failure class it
    cares about (partition pruning on the dead-letter table)."""
    (
        result.rejected
        .withColumn("_first_code", F.element_at(F.col(ERRORS_COL), 1)["code"])
        .write.format(fmt).mode(mode)
        .partitionBy("_first_code")
        .save(path)
    )


def write_error_metrics(result: ValidationResult, path: str,
                        fmt: str = "parquet", mode: str = "append") -> None:
    result.error_code_counts().write.format(fmt).mode(mode).save(path)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 32, sort_col: str | None = None,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Bucketed managed table: pays the shuffle once at write; every
    later join/agg on ``bucket_col`` reads co-located buckets with no
    exchange.  The 100 TB pattern for repeatedly-joined fact tables."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
