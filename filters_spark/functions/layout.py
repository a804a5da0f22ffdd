"""Data-layout operators: Z-order (Morton) clustering keys for
multi-column file/row-group pruning.

A sort on one column gives parquet min/max pruning on that column
only; an N-column query pattern needs the file layout to cluster ALL
N columns at once.  The standard answer (Delta ``OPTIMIZE ZORDER``,
Hudi clustering) is a space-filling curve: bucket each column,
interleave the bucket bits into one integer key, range-partition +
sort by that key — every output file then covers a narrow range of
EVERY keyed column, so min/max stats prune files for predicates on
any of them (and any combination).

Spark-first shape: bucket boundaries are the column's global
min/max (ONE 1-row aggregate, broadcast back — linear bucketing is
engine-replayable, unlike approx-quantile boundaries whose sketch
merges are partition-order-sensitive); bucketing + bit interleave
are pure integer expressions inside whole-stage codegen; the write
is one ``repartitionByRange`` shuffle — exactly the cost of any
clustered write.

Reference scope note: the reference library (eflglobal/filters) has
no storage surface; this module is part of the large-scale pipeline
layer (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "write_zordered",
]


def zorder_key(df: DataFrame, cols: list[str],
               bits: int = 8) -> tuple[Column, DataFrame]:
    """Morton key over ``cols``: each column linear-bucketed into
    ``2**bits`` buckets between its global min and max (constant
    columns and NULLs land in bucket 0), bucket bits interleaved
    column-major.  Requires ``len(cols) * bits <= 63``.

    Returns ``(key, stats)``: the BIGINT key expression plus the
    1-row min/max aggregate frame it references — cross-join the
    stats as a broadcast before selecting the key
    (``df.crossJoin(F.broadcast(stats)).withColumn("k", key)``; see
    :func:`write_zordered`).  No driver collect, no second pass.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed 64-bit key")
    stats = df.agg(*[f for c in cols for f in
                     (F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}"))])
    buckets = []
    top = (1 << bits) - 1
    for c in cols:
        lo = F.col(f"_lo_{c}").cast("double")
        hi = F.col(f"_hi_{c}").cast("double")
        x = F.col(c).cast("double")
        span = hi - lo
        b = F.when(x.isNull() | (span <= 0), F.lit(0)).otherwise(
            F.least(F.lit(top),
                    F.floor((x - lo) / span * (1 << bits)).cast("int")))
        buckets.append(b)
    key = F.lit(0).cast("bigint")
    for bit in range(bits):
        for i, b in enumerate(buckets):
            key = key + (
                F.shiftleft(F.shiftright(b.cast("bigint"), bit) % 2,
                            bit * n + i))
    return key, stats


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 8, n_files: int = 32,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Write ``df`` clustered on the Z-order key of ``cols``:
    range-partition into ``n_files`` splits of the key space and sort
    within each, so every file's parquet min/max stats are tight on
    EVERY keyed column.  One shuffle; reads need nothing special —
    plain predicate pushdown prunes."""
    key, stats = zorder_key(df, cols, bits)
    keyed = df.crossJoin(F.broadcast(stats)).withColumn("_zkey", key)
    (keyed.repartitionByRange(n_files, "_zkey")
     .sortWithinPartitions("_zkey")
     .drop("_zkey", *[f"_{p}_{c}" for p in ("lo", "hi") for c in cols])
     .write.format(fmt).mode(mode).save(path))
