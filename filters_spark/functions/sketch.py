"""Frequency sketches: count-min tables and heavy-hitter estimation.

Why a sketch when ``groupBy(col).count()`` is one shuffle anyway: the
exact rollup's STATE is one row per distinct value — unbounded on a
100 TB key column — while a count-min table is a fixed d×w counter
grid.  Map-side partial aggregation collapses every task's
contribution to at most d·w rows before the shuffle, so the shuffle
and the result are both O(d·w) regardless of data size or
cardinality; point estimates then cost a broadcast probe.  The
classic Cormode–Muthukrishnan guarantee: estimates never
undercount, and overcount by more than εN with probability at most δ
for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Engine-replayable discipline: bucket hashes are md5-derived (the
``sampling.hash_uniform`` trick), so a SQL oracle replays the whole
table and the min-over-rows estimate byte for byte — estimator
CALIBRATION (estimate vs exact, certified in-result) follows the
``ds_minhash_estimate`` pattern.

Reference scope note: the reference library has no sketch surface;
this is the large-scale pipeline layer (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_bucket",
    "cms_table",
    "cms_estimate",
    "cms_merge",
]


def cms_bucket(col: Column, seed: Column, width: int) -> Column:
    """Row-r bucket for a value: first 8 md5 hex chars of
    ``seed|value`` as an integer, mod width — uniform, deterministic,
    and replayable as ANSI SQL."""
    h = F.md5(F.concat(seed.cast("string"), F.lit("|"), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width)


def cms_table(df: DataFrame, col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """The d×w counter grid: (row, bucket, n).  ONE exploded
    aggregation — each input row emits ``depth`` (row, bucket) pairs,
    map-side combine collapses them to ≤ d·w rows per task, and the
    shuffle moves counters, not data.  NULLs are excluded (a NULL
    key has no frequency)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    ex = (df.where(F.col(col).isNotNull())
          .select(seeds.alias("_row"), F.col(col).alias("_v")))
    return (ex.groupBy(
        "_row", cms_bucket(F.col("_v"), F.col("_row"), width).alias("_bucket"))
        .agg(F.count(F.lit(1)).alias("n")))


def cms_estimate(table: DataFrame, items: DataFrame, col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Point estimates for ``items[col]``: probe each of the d rows'
    buckets and take the MIN counter — never an undercount.  The
    (small, by contract) item set cross-joins the d seeds and
    broadcasts onto the d×w table; returns (col, est) with est = 0
    for never-seen items (their buckets may be absent from the
    table)."""
    seeds = F.explode(F.array(*[F.lit(i) for i in range(depth)]))
    probes = (items.select(F.col(col).alias("_v"))
              .distinct()
              .select("_v", seeds.alias("_row"))
              .withColumn("_bucket",
                          cms_bucket(F.col("_v"), F.col("_row"), width)))
    joined = probes.join(table, ["_row", "_bucket"], "left").select(
        "_v", F.coalesce("n", F.lit(0)).alias("_n"))
    return (joined.groupBy("_v")
            .agg(F.min("_n").alias("est"))
            .select(F.col("_v").alias(col), "est"))


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Merge count-min tables built with the SAME (depth, width):
    counters add cell-wise.  This linearity is the operational point
    of sketching — per-shard / per-day tables combine into a global
    one without touching the data again (estimate(merged) ==
    estimate(concatenated inputs), exactly, because both sides sum
    the same counters).  One union + one d·w-bounded rollup."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("_row", "_bucket").agg(F.sum("n").alias("n"))
