"""Scale stress for the round-6 late operators: corpus-wide
frequent-line removal at 2M docs and one-pass ridge training at
2M x 32.  One JSON line per phase; numbers land in SCALE.md.

Run:
    python tools/scale_stress_r6b.py [lines ridge]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r6b")
        .master(f"local[{cpus}, 3]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("STRESS_DRIVER_MEM", "48g"))
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.ui.explainMode", "simple")
        .getOrCreate()
    )


def emit(**kw) -> None:
    sys.stdout.write(json.dumps(kw) + "\n")
    sys.stdout.flush()


def stress_lines(spark: SparkSession, n_docs: int = 2_000_000) -> None:
    """2M docs x 8 lines: every doc gets 7 globally-unique content
    lines; every 3rd doc additionally carries the SAME boilerplate
    line (a ~667k-occurrence mega-key — the skew case the grouped-agg
    design exists for).  Invariants exact: the boilerplate survives
    exactly once corpus-wide (in the smallest doc_id carrying it),
    unique lines are never touched, and removal counts add up."""
    from filters_spark.functions import dedup

    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(6)),
        lambda j: F.concat(F.lit("line "),
                           F.xxhash64(F.col("id") * 7 + j).cast("string")))
    lines = F.when(F.col("id") % 3 == 0,
                   F.concat(F.array(F.lit("accept all cookies to continue")),
                            uniq)).otherwise(uniq)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(lines, "\n").alias("text"))

    t0 = time.time()
    out = dedup.remove_frequent_lines(docs, min_count=3, keep="first")
    agg = out.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_removed").alias("removed"),
        F.sum("n_kept").alias("kept"),
        F.sum(F.col("text").contains("accept all cookies").cast("int"))
        .alias("bp_docs"),
        F.min(F.when(F.col("text").contains("accept all cookies"),
                     F.col("doc_id"))).alias("bp_holder")).first()
    wall = time.time() - t0
    n_bp = (n_docs + 2) // 3
    assert agg["docs"] == n_docs, agg
    assert agg["removed"] == n_bp - 1, agg
    assert agg["kept"] == n_docs * 7 + 1, agg
    assert agg["bp_docs"] == 1 and agg["bp_holder"] == 0, agg
    emit(phase="line_dedup_2m", docs=n_docs, planted=n_bp,
         wall_s=round(wall, 1), removed=int(agg["removed"]))


def stress_ridge(spark: SparkSession, n_rows: int = 2_000_000,
                 dim: int = 32) -> None:
    """One-pass ridge training at 2M x 32: deterministic features
    (uniform from xxhash64), labels from a known integer weight
    vector + intercept; reg=0 must recover both to the micro-
    quantization bound.  The wall clock is the ONE distributed Gram
    pass + a driver solve over 33x33 numbers."""
    import numpy as np

    from filters_spark.functions import projection as P

    w_true = [((i * 37) % 21 - 10) / 10.0 for i in range(dim)]
    b_true = 0.75
    feat = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("id") * dim + j), F.lit(4001))
                   - 2000) / 1000.0)
    wlit = F.array(*[F.lit(w) for w in w_true])
    label = F.aggregate(
        F.zip_with(F.col("vec"), wlit, lambda x, w: x * w),
        F.lit(0.0), lambda a, x: a + x) + F.lit(b_true)
    df = (spark.range(n_rows).select("id", feat.alias("vec"))
          .select("id", "vec", label.alias("label")))

    t0 = time.time()
    fit = P.ridge_fit(df, "vec", "label", dim=dim, reg=0.0,
                      engine="arrow")
    wall = time.time() - t0
    err = max(max(abs(a - b) for a, b in zip(fit["weights"], w_true)),
              abs(fit["intercept"] - b_true))
    assert fit["n"] == n_rows
    assert err < 1e-4, err
    emit(phase="ridge_2m_d32", rows=n_rows, dim=dim,
         wall_s=round(wall, 1), max_err=float(f"{err:.2e}"))


def stress_pq(spark: SparkSession, n_rows: int = 2_000_000,
              dim: int = 16, cells: int = 64) -> None:
    """IVF-PQ index at 2M x 16 over 64 cells: materialize (arrow
    train+encode), then a 32-query pruned ADC probe.  Invariants:
    probe reads only the probed cell directories (inputFiles bound)
    and returns exactly 32 x 10 ranked rows."""
    import tempfile

    from filters_spark.functions import similarity as S

    feat = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (F.pmod(F.xxhash64(F.col("id") * dim + j), F.lit(2001))
                   - 1000) / 1000.0)
    df = spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.pmod(F.xxhash64("id"), F.lit(cells)).alias("label"),
        feat.alias("embedding"))
    path = tempfile.mkdtemp(prefix="fs_pqstress_") + "/t"
    t0 = time.time()
    S.materialize_pq_index(df, path, cell_col="label", m=4, k=16,
                           iters=1, dim=dim, engine="arrow")
    build_s = time.time() - t0
    q = (df.where(F.col("vec_id") % 62_501 == 0)
         .select(F.col("vec_id").alias("query_id"), "embedding"))
    t0 = time.time()
    top = S.pq_topk_from_index(spark, path, q, k=10, nprobe=2,
                               id_col="query_id")
    rows = top.count()
    probe_s = time.time() - t0
    n_files = len(top.inputFiles())
    assert rows == 32 * 10, rows
    # 32 queries x nprobe=2 -> <=64 of 64 cells, typically far fewer;
    # the bound proves the scan is path-pruned, not a full listing
    assert n_files <= cells, n_files
    emit(phase="pq_index_2m", rows=n_rows, dim=dim, cells=cells,
         build_s=round(build_s, 1), probe_s=round(probe_s, 1),
         probe_files=n_files)


PHASES = {
    "lines": stress_lines,
    "ridge": stress_ridge,
    "pq": stress_pq,
}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wanted = sys.argv[1:] or list(PHASES)
    for name in wanted:
        PHASES[name](spark)


if __name__ == "__main__":
    main()
