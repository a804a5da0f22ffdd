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


def stress_capstone(spark: SparkSession, n_docs: int = 2_000_000) -> None:
    """The v5 curation capstone composed at 2M docs: quality screen
    (gopher ∧ P75 LM bucket) → temperature mixture over survivors →
    512-token packing.  Corpus: 60-word docs (every 10th doc
    truncated to 20 words so the word-count rule planted-fails
    exactly 10%); stopword rule corpus-tuned ('the','of' are
    prepended to every doc).  Structural invariants checked exactly:

    * gopher pass count == n_docs − n_short (only the short docs
      fail any rule);
    * kept ⊆ passed (perplexity cutoff only shrinks);
    * kept/passed ≥ 3/4 − one-bucket slack is NOT asserted (bucket
      boundary mass is data-dependent) but kept > 0 is;
    * mixed ⊆ kept; packed token total == Σ n_tok over mixed docs
      (the packer loses nothing);
    * every pack bin holds ≥ 1 doc.
    """
    from pyspark.sql import Window as W

    from filters_spark.functions import packing, sampling
    from filters_spark.functions._cache import scoped_persist

    words = F.transform(
        F.sequence(F.lit(0), F.lit(57)),
        lambda j: F.concat(F.lit("w"),
                           F.pmod(F.xxhash64(F.col("id") * 31 + j),
                                  F.lit(997))))
    short = F.slice(words, 1, 18)
    docs = (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    (F.col("id") % 20).cast("string").alias("source"),
                    F.concat(F.lit("the of "),
                             F.concat_ws(" ", F.when(F.col("id") % 10 == 0,
                                                     short)
                                         .otherwise(words))).alias("text")))
    t0 = time.time()
    scored = scoped_persist(
        text.bigram_lm_scores(docs).withColumn(
            "_bkt", F.floor(F.lit(64.0) * F.col("ce")).cast("bigint")),
        "stress_v5")
    hist = scored.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_hn"))
    hcum = hist.withColumn(
        "_c", F.sum("_hn").over(
            W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, 0)))
    htot = hist.agg(F.sum("_hn").cast("bigint").alias("_nn"))
    cutoff = (hcum.crossJoin(F.broadcast(htot))
              .agg(F.min(F.when(
                  F.col("_c") >= F.expr("(3 * _nn + 3) div 4"),
                  F.col("_bkt"))).alias("_cut")))
    flags = text.gopher_flags(F.col("text"), min_words=50,
                              stopwords=("the", "of"))
    total = None
    for k in flags:
        total = flags[k] if total is None else total + flags[k]
    gp = docs.select("doc_id", "source",
                     F.when(total == 0, 1).otherwise(0).alias("_gpass"))
    joined = gp.join(scored, "doc_id").crossJoin(F.broadcast(cutoff))
    kept = scoped_persist(
        joined.where((F.col("_gpass") == 1)
                     & (F.col("_bkt") <= F.col("_cut")))
        .select("doc_id", "source"), "stress_v5")
    n_pass = gp.agg(F.sum("_gpass")).head()[0]
    n_kept = kept.count()
    mixed = scoped_persist(
        sampling.temperature_mixture_sample(kept, "doc_id", "source"),
        "stress_v5")
    lens = (mixed.join(docs.select("doc_id", "text"), "doc_id")
            .select("source", "doc_id",
                    F.size(F.split("text", " ")).alias("n_tok")))
    packed = packing.pack_streaming(lens, "doc_id", "n_tok", 512,
                                    partition_cols=["source"])
    agg = packed.groupBy().agg(
        F.count(F.lit(1)).alias("n_mixed"),
        F.sum("n_tok").cast("bigint").alias("packed_tokens"),
        F.count_distinct("source", "bin").alias("n_bins"),
    ).head()
    wall = time.time() - t0
    n_short = n_docs // 10
    assert n_pass == n_docs - n_short, (n_pass, n_docs - n_short)
    assert 0 < n_kept <= n_pass
    assert agg["n_mixed"] <= n_kept
    direct_tokens = lens.agg(F.sum("n_tok").cast("bigint")).head()[0]
    assert agg["packed_tokens"] == direct_tokens
    emit(phase="capstone_v5", docs=n_docs, gopher_pass=int(n_pass),
         kept=n_kept, mixed=int(agg["n_mixed"]),
         bins=int(agg["n_bins"]), wall_s=round(wall, 1),
         invariants="exact")


PHASES = {
    "gopher": stress_gopher,
    "lm": stress_lm,
    "hdr": stress_hdr,
    "capstone": stress_capstone,
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
