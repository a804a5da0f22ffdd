"""Scale stress for the dedup/clustering path (VERDICT r2 item #3).

Synthesizes a multi-million-document corpus ENTIRELY as Spark
expressions (deterministic — hash-derived words, no RNG, so runs are
reproducible and engine-replayable), writes it to parquet, then runs
the production dedup pipeline end to end and records wall, shuffle
volume, candidate-pair counts and connected-components rounds.

Corpus shape (the three regimes a web-scale crawl actually has):

* **mass-dup clusters**: ``--big-clusters`` clusters of ``--big-size``
  EXACT duplicates (boilerplate pages) — the LSH bucket-explosion
  stressor: every band of such a cluster is one bucket of size B
  emitting B(B-1)/2 candidate pairs unless star-capped.
* **small near-dup clusters**: ~30% of docs in clusters of 3 with a
  ~1/12 per-word mutation (Jaccard of 3-shingles ≈ 0.6 — above the
  0.5 verify threshold).
* **singletons**: the rest, unique text.

Usage:
    python tools/scale_stress.py --n-docs 2000000 --big-size 2000
    python tools/scale_stress.py --n-docs 2000000 --big-size 5000 --star-cap 64

Writes one JSON line per phase plus a summary; shuffle bytes come
from the Spark UI REST API (this tool enables the UI on its own
session precisely for that).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import dedup

UI_PORT = 4050


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress")
        .master(f"local[{cpus}, 3]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("STRESS_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .getOrCreate()
    )


def shuffle_totals() -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    completed stages, from the UI REST API."""
    base = f"http://localhost:{UI_PORT}/api/v1"
    try:
        apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/applications/{app_id}/stages?status=complete",
                                   timeout=30))
        rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
        wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        return rd, wr
    except Exception:
        return 0, 0


MAX_WORDS = 80


def gen_corpus(spark: SparkSession, n_docs: int, big_clusters: int,
               big_size: int, small_frac: float, out: str) -> None:
    """Deterministic expression-only corpus; one pass, no driver data.

    The text is built as MAX_WORDS per-position column expressions
    fused by concat_ws (NULL positions beyond the doc length drop
    out) — pure whole-stage codegen.  The explode+collect_list
    formulation was measured ~10× slower (SortAggregate over the
    word stream), and a transform() lambda would be interpreted.
    """
    big_end = big_clusters * big_size
    small_end = big_end + int(n_docs * small_frac)
    doc = F.col("id")
    cluster = (
        F.when(doc < big_end, F.lit(10**9) + (doc / big_size).cast("long"))
        .when(doc < small_end, F.lit(2 * 10**9) + ((doc - big_end) / 3).cast("long"))
        .otherwise(doc)
    )
    member = (
        F.when(doc < big_end, F.lit(0))  # big clusters: EXACT dups
        .when(doc < small_end, ((doc - big_end) % 3).cast("int"))
        .otherwise(F.lit(0))
    )
    doc_len = (F.pmod(F.xxhash64(F.col("_cluster")), F.lit(MAX_WORDS - 40 + 1))
               + 40).cast("int")

    def word_at(i: int):
        c, m = F.col("_cluster"), F.col("_member")
        base = F.concat(
            F.lit("w"), F.pmod(F.xxhash64(c, F.lit(i)), F.lit(30000)).cast("string"))
        mut = F.concat(
            F.lit("m"),
            F.pmod(F.xxhash64(c, F.lit(i), m), F.lit(30000)).cast("string"))
        w = F.when(
            (m > 0)
            & (F.pmod(F.xxhash64(c, F.lit(i), m, F.lit(7)), F.lit(12)) == 0),
            mut).otherwise(base)
        return F.when(F.lit(i) <= F.col("_len"), w)  # NULL past the end

    par = spark.sparkContext.defaultParallelism * 2
    docs = (
        spark.range(n_docs, numPartitions=par)
        .withColumn("_cluster", cluster).withColumn("_member", member)
        .withColumn("_len", doc_len)
        .select(F.col("id").alias("doc_id"),
                F.concat_ws(" ", *[word_at(i) for i in range(1, MAX_WORDS + 1)])
                .alias("text"))
    )
    docs.write.mode("overwrite").parquet(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=2_000_000)
    ap.add_argument("--big-clusters", type=int, default=8)
    ap.add_argument("--big-size", type=int, default=2000)
    ap.add_argument("--small-frac", type=float, default=0.3)
    ap.add_argument("--star-cap", type=int, default=None)
    ap.add_argument("--hash-fn", choices=["md5", "xx64"], default="xx64",
                    help="signature hash engine; md5 is the oracle-parity "
                         "default in the library, xx64 the throughput engine")
    ap.add_argument("--skip-gen", action="store_true",
                    help="reuse an existing corpus at --dir")
    ap.add_argument("--cc", choices=["star", "prop", "both"], default="star")
    ap.add_argument("--dir", default="/tmp/scale_stress")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    out = lambda **kw: sys.stdout.write(json.dumps(kw) + "\n") or sys.stdout.flush()

    corpus_dir = os.path.join(args.dir, "docs")
    pairs_dir = os.path.join(args.dir, "pairs")

    if not args.skip_gen:
        t0 = time.time()
        gen_corpus(spark, args.n_docs, args.big_clusters, args.big_size,
                   args.small_frac, corpus_dir)
        out(phase="generate", wall_s=round(time.time() - t0, 1),
            n_docs=args.n_docs, big=f"{args.big_clusters}x{args.big_size}")

    docs = spark.read.parquet(corpus_dir)

    # bucket-size profile: how bad would the uncapped self-join be?
    t0 = time.time()
    prepped = dedup.minhash_signatures(docs, "doc_id", "text", 3, 16,
                                       hash_fn=args.hash_fn)
    banded = prepped.withColumn(
        "_bands", dedup.minhash_bands(F.col("_sig"), 4, 4, hash_fn=args.hash_fn))
    sizes = (
        banded.select(F.explode("_bands").alias("bk"))
        .groupBy("bk.band", "bk.key").count()
    )
    prof = sizes.agg(
        F.max("count").alias("max_bucket"),
        F.sum(F.when(F.col("count") > 64, (F.col("count") * (F.col("count") - 1) / 2)
                     ).otherwise(0)).alias("pairs_from_big_buckets"),
        F.sum(F.when(F.col("count") > 64, 1).otherwise(0)).alias("buckets_over_64"),
    ).collect()[0]
    out(phase="bucket_profile", wall_s=round(time.time() - t0, 1),
        max_bucket=prof["max_bucket"],
        buckets_over_64=int(prof["buckets_over_64"]),
        uncapped_pairs_from_big_buckets=int(prof["pairs_from_big_buckets"]))

    rd0, wr0 = shuffle_totals()
    t0 = time.time()
    pairs = dedup.minhash_dedup_pairs(
        docs, "doc_id", "text", shingle_k=3, n_hashes=16, n_bands=4,
        threshold=0.5, star_buckets_over=args.star_cap, hash_fn=args.hash_fn)
    pairs.write.mode("overwrite").parquet(pairs_dir)
    wall = time.time() - t0
    rd1, wr1 = shuffle_totals()
    n_pairs = spark.read.parquet(pairs_dir).count()
    out(phase="minhash_dedup_pairs", wall_s=round(wall, 1), n_pairs=n_pairs,
        star_cap=args.star_cap, hash_fn=args.hash_fn,
        shuffle_read_gb=round((rd1 - rd0) / 2**30, 2),
        shuffle_write_gb=round((wr1 - wr0) / 2**30, 2))

    pairs = spark.read.parquet(pairs_dir)
    variants = {"star": ["star"], "prop": ["prop"], "both": ["star", "prop"]}[args.cc]
    for v in variants:
        stats: dict = {}
        rd0, wr0 = shuffle_totals()
        t0 = time.time()
        fn = (dedup.connected_components_star if v == "star"
              else dedup.connected_components)
        comps = fn(pairs, max_iter=30, stats=stats)
        n_comp = comps.agg(F.countDistinct("comp")).collect()[0][0]
        n_nodes = comps.count()
        wall = time.time() - t0
        rd1, wr1 = shuffle_totals()
        out(phase=f"connected_components_{v}", wall_s=round(wall, 1),
            rounds=stats.get("rounds"), components=n_comp, nodes=n_nodes,
            shuffle_read_gb=round((rd1 - rd0) / 2**30, 2),
            shuffle_write_gb=round((wr1 - wr0) / 2**30, 2))

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
