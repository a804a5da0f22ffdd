"""Scale stress for the late round-5 quality/sketch operators: the
Gopher rule screen, the bigram-LM perplexity scorer, and the HDR
quantile sketch.  Each phase prints one JSON line; numbers land in
SCALE.md.

Run:
    python tools/scale_stress_r5b.py           # all phases
    python tools/scale_stress_r5b.py lm hdr    # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import sketch, text


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r5b")
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


def _corpus(spark: SparkSession, n_docs: int):
    """~30-word docs over a ~1k-word zipf-ish vocabulary (id-derived,
    deterministic): enough token mass and vocabulary reuse that the
    bigram model and the quality rules both see realistic counts."""
    words = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda j: F.concat(F.lit("w"),
                           F.pmod(F.xxhash64(F.col("id") * 31 + j), F.lit(997))))
    return (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.concat(F.lit("the of "),
                             F.concat_ws(" ", words)).alias("text")))


def stress_gopher(spark: SparkSession, n_docs: int = 5_000_000) -> None:
    """5M docs through the fused 7-rule projection + rollup.  Exact
    invariants: every doc has 32 words (< 50) so word_count fails for
    ALL rows; every doc carries 'the of' so stopwords fails for NONE;
    no symbols/bullets/digits anywhere."""
    docs = _corpus(spark, n_docs)
    flags = text.gopher_flags(F.col("text"))
    t0 = time.time()
    row = docs.select(*[v.alias(k) for k, v in flags.items()]).agg(
        F.sum("word_count").cast("bigint").alias("wc"),
        F.sum("stopwords").cast("bigint").alias("sw"),
        F.sum("symbol_ratio").cast("bigint").alias("sym"),
        F.sum("alpha_words").cast("bigint").alias("alpha"),
    ).head()
    wall = time.time() - t0
    assert row["wc"] == n_docs, row
    assert row["sw"] == 0 and row["sym"] == 0 and row["alpha"] == 0, row
    emit(phase="gopher_rules", docs=n_docs, wall_s=round(wall, 1),
         invariants="exact")


def stress_lm(spark: SparkSession, n_docs: int = 2_000_000) -> None:
    """Bigram LM over 2M docs (~62M tokens, ~1M distinct bigrams).
    Invariants: every doc scored (all have ≥ 2 tokens), every
    cross-entropy positive and finite (smoothed probabilities are in
    (0,1)), token accounting exact (31 bigrams per 32-word doc)."""
    docs = _corpus(spark, n_docs)
    t0 = time.time()
    scored = text.bigram_lm_scores(docs)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bigrams").cast("bigint").alias("nb"),
        F.sum(F.when(F.col("ce") > 0, 1).otherwise(0))
        .cast("bigint").alias("pos"),
    ).head()
    wall = time.time() - t0
    assert agg["n"] == n_docs, agg
    assert agg["nb"] == n_docs * 31, agg
    assert agg["pos"] == n_docs, agg
    emit(phase="bigram_lm", docs=n_docs, bigram_instances=agg["nb"],
         wall_s=round(wall, 1), invariants="exact")


def stress_hdr(spark: SparkSession, n_rows: int = 50_000_000) -> None:
    """HDR sketch over 50M skewed positive values (100k distinct).
    Invariants: bucket-table state bounded (≤ 64·8 rows); the five
    estimates all satisfy the 12.5% guarantee against EXACT rank
    quantiles (computable here because the value domain is bounded);
    sketch-of-two-halves merge == whole-corpus sketch, row for row."""
    v = (F.pmod(F.xxhash64(F.col("id")), F.lit(100_000)) + 1) * \
        (F.pmod(F.col("id"), F.lit(7)) + 1)
    rows = spark.range(n_rows).select(v.alias("x"))
    qs = [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]
    t0 = time.time()
    tbl = sketch.hdr_table(rows, "x")
    n_buckets = tbl.count()
    wall_build = time.time() - t0
    assert n_buckets <= 64 * 8, n_buckets
    t0 = time.time()
    est = {(r["q_num"], r["q_den"]): r["est"]
           for r in sketch.hdr_quantiles(tbl, qs).collect()}
    wall_q = time.time() - t0
    dv = rows.groupBy(F.col("x").alias("lb")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"))
    exact = {(r["q_num"], r["q_den"]): r["est"]
             for r in sketch.hdr_quantiles(dv, qs).collect()}
    for q in est:
        lb, ex = est[q], exact[q]
        assert lb <= ex and (ex - lb) * 8 <= lb, (q, lb, ex)
    halves = sketch.hdr_merge(
        sketch.hdr_table(rows.where(F.col("x") % 2 == 0), "x"),
        sketch.hdr_table(rows.where(F.col("x") % 2 == 1), "x"))
    merged = sorted(map(tuple, halves.collect()))
    whole = sorted(map(tuple, tbl.collect()))
    assert merged == whole
    emit(phase="hdr_quantiles", rows=n_rows, buckets=n_buckets,
         wall_build_s=round(wall_build, 1), wall_query_s=round(wall_q, 1),
         invariants="exact")


PHASES = {
    "gopher": stress_gopher,
    "lm": stress_lm,
    "hdr": stress_hdr,
}


def main() -> None:
    wanted = sys.argv[1:] or list(PHASES)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for name in wanted:
        PHASES[name](spark)


if __name__ == "__main__":
    main()
