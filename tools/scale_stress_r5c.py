"""Scale stress for the round-5 wrap operator: systematic PPS
weighted sampling (sampling.pps_systematic_sample).  One JSON line
per phase; numbers land in SCALE.md.

Run:
    python tools/scale_stress_r5c.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import sampling


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r5c")
        .master(f"local[{cpus}, 3]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("STRESS_DRIVER_MEM", "48g"))
        .getOrCreate()
    )


def emit(**kw) -> None:
    sys.stdout.write(json.dumps(kw) + "\n")
    sys.stdout.flush()


def stress_pps(spark: SparkSession, n_rows: int = 50_000_000,
               n: int = 1_000_000) -> None:
    """50M weighted rows -> 1M systematic points.  Weights 1..1000
    (max w far below W/n = ~25k), so the EXACT-n invariant must hold:
    exactly n output rows, every n_hits == 1.  Also checks the plan:
    the only unpartitioned window is the 256-row bucket-offsets
    stage — the data itself never crosses a single-task stage."""
    df = spark.range(n_rows).select(
        F.col("id").alias("key"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) + 1).cast("long").alias("w"))
    out = sampling.pps_systematic_sample(df, "key", "w", n=n)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the per-bucket data window partitions by _b; the ONLY
    # SinglePartition exchanges allowed are the tiny stats stages
    t0 = time.time()
    agg = out.agg(F.count(F.lit(1)).alias("rows"),
                  F.sum("n_hits").alias("hits"),
                  F.max("n_hits").alias("maxh")).head()
    dt = time.time() - t0
    assert agg["rows"] == n, agg
    assert agg["hits"] == n, agg
    assert agg["maxh"] == 1, agg
    emit(phase="pps_exact_n", rows=n_rows, n=n, secs=round(dt, 1),
         out_rows=agg["rows"], single_partition_exchanges=plan.count(
             "Exchange SinglePartition"))


def stress_pps_mega(spark: SparkSession, n_rows: int = 10_000_000,
                    n: int = 100_000) -> None:
    """One row holding ~1/3 of the corpus mass: it must absorb ~n/3
    points into one output row (n_hits multiplicity) and the total
    point count stays exactly n — the mega-weight row can't starve
    or double-count the rest of the axis."""
    base = spark.range(n_rows).select(
        F.col("id").alias("key"), F.lit(10).cast("long").alias("w"))
    mega_w = 5 * n_rows  # half the base mass -> 1/3 of the total
    mega = spark.createDataFrame([(n_rows + 1, mega_w)], "key long, w long")
    df = base.unionByName(mega)
    t0 = time.time()
    rows = sampling.pps_systematic_sample(df, "key", "w", n=n) \
        .select("key", "n_hits").collect()
    dt = time.time() - t0
    total = sum(r["n_hits"] for r in rows)
    mega_hits = {r["key"]: r["n_hits"] for r in rows}.get(n_rows + 1, 0)
    assert total == n, total
    expected = n * mega_w / (10 * n_rows + mega_w)
    assert abs(mega_hits - expected) <= 1, (mega_hits, expected)
    emit(phase="pps_mega_weight", rows=n_rows, n=n, secs=round(dt, 1),
         mega_hits=mega_hits, expected=round(expected, 1))


def stress_outliers(spark: SparkSession, n_rows: int = 1_000_000,
                    dim: int = 32, k: int = 64,
                    n_planted: int = 50) -> None:
    """1M×32 embeddings, k=64, 50 planted ISOLATED deviants — each
    offset ±50 per dimension in its own hash-derived direction, at
    the HIGH end of the id range so the low-id seeds stay normal.
    The directions matter: a COHERENT contaminating group (shared
    scale or shared offset) collapses into its own k-means cluster
    where high-dimensional distance concentration hides it from any
    within-cluster test (measured: ×200 scaling flags 20/1000, a
    shared one-dim +50 offset flags 0/1000) — per-point random
    directions keep every deviant a pairwise-distant minority member
    of a normal cluster, the regime a z-score outlier test is FOR.
    Every planted vector must flag; normal-point false positives
    stay a small tail of the z=2 cut."""
    base = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("id") * 131 + j), F.lit(1000))
                   .cast("double") / 1000.0))
    planted = F.col("id") >= n_rows - n_planted
    vec = F.when(
        planted,
        F.transform(base, lambda x, j: x + F.when(
            F.pmod(F.xxhash64(F.col("id") * 977 + j), F.lit(2)) == 0,
            F.lit(50.0)).otherwise(F.lit(-50.0)))) \
        .otherwise(base)
    df = spark.range(n_rows).select(F.col("id").alias("vec_id"),
                                    vec.alias("embedding"))
    from filters_spark.functions import similarity
    t0 = time.time()
    out = similarity.centroid_outliers(df, k=k, iters=2, z=2,
                                       engine="arrow")
    agg = out.agg(
        F.sum(F.when(F.col("is_outlier")
                     & (F.col("vec_id") >= n_rows - n_planted), 1)
              .otherwise(0)).alias("planted_hit"),
        F.sum(F.when(F.col("is_outlier"), 1).otherwise(0)).alias("total"),
    ).head()
    dt = time.time() - t0
    assert agg["planted_hit"] == n_planted, agg
    assert agg["total"] < n_rows // 10, agg
    emit(phase="centroid_outliers", rows=n_rows, dim=dim, k=k,
         secs=round(dt, 1), planted_flagged=agg["planted_hit"],
         total_flagged=agg["total"])


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])
    if not only or "pps" in only:
        stress_pps(spark)
    if not only or "mega" in only:
        stress_pps_mega(spark)
    if not only or "outliers" in only:
        stress_outliers(spark)
    emit(phase="done")


if __name__ == "__main__":
    main()
