"""Scale stress for the round-3b families: deterministic global
shuffle, SCD2 dimension build, PageRank, SemDeDup (Arrow engine),
and BM25 retrieval — all on multi-million-row synthetic inputs built
as pure Spark expressions (hash-derived, no RNG: reruns are
bit-identical).

Usage:
    python tools/scale_stress_r3b.py                 # all phases
    python tools/scale_stress_r3b.py shuffle scd2    # a subset

Each phase prints one JSON line {phase, rows, wall_s, ...}; the
numbers land in SCALE.md §18.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import dedup, graph, retrieval, sampling
from filters_spark.plans.joins import scd2


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r3b")
        .master(f"local[{cpus}, 3]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("STRESS_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .getOrCreate()
    )


def emit(**kw) -> None:
    sys.stdout.write(json.dumps(kw) + "\n")
    sys.stdout.flush()


def phase_shuffle(spark: SparkSession) -> None:
    """50M keys → 1024 shards + in-shard positions.  One shuffle; the
    gated observable shape (count + order checksum per shard) forces
    full materialization of every position."""
    n = 50_000_000
    df = spark.range(n, numPartitions=spark.sparkContext.defaultParallelism * 2)
    t0 = time.time()
    res = (
        sampling.global_shuffle(df.select(F.col("id")), "id", 1024)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("id") * F.col("pos")).alias("chk"))
        .agg(F.count(F.lit(1)).alias("shards"), F.sum("n").alias("rows"))
        .head()
    )
    emit(phase="global_shuffle", rows=n, shards=1024,
         out_rows=res["rows"], wall_s=round(time.time() - t0, 1))


def phase_scd2(spark: SparkSession) -> None:
    """50M change events over 5M dimension keys (10 events/key, ~1/3
    real changes).  ONE key-partitioned sort carries detect+stitch."""
    n = 50_000_000
    ev = (
        spark.range(n, numPartitions=spark.sparkContext.defaultParallelism * 2)
        .select(
            (F.col("id") % 5_000_000).alias("k"),
            F.timestamp_seconds(F.lit(1_500_000_000)
                                + (F.col("id") / 5_000_000).cast("long") * 86400
                                ).alias("ts"),
            F.pmod(F.xxhash64("id"), F.lit(3)).cast("int").alias("status"),
        )
    )
    t0 = time.time()
    hist = scd2(ev, "k", "ts", ["status"])
    out = hist.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.when(F.col("is_current"), 1).otherwise(0))
                   .alias("current")).head()
    emit(phase="scd2", rows=n, keys=5_000_000, history_rows=out["n"],
         current_rows=out["current"], wall_s=round(time.time() - t0, 1))


def phase_pagerank(spark: SparkSession) -> None:
    """20M-edge hash graph: 2M distinct sources, dst concentrated on
    200k hubs (10× in-degree skew) + dangling tail — exercises the
    dangling-mass path and per-iteration checkpoint discipline."""
    n = 20_000_000
    e = (
        spark.range(n, numPartitions=spark.sparkContext.defaultParallelism * 2)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(2_000_000)).alias("src"),
            (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(200_000))
             + 2_000_000).alias("dst"),  # hubs are OUT of the src range
        )
    )
    t0 = time.time()
    pr = graph.pagerank(e, iters=3, round_dp=12, dangling=True)
    out = pr.agg(F.count(F.lit(1)).alias("nodes"),
                 F.round(F.sum("rank"), 6).alias("mass")).head()
    emit(phase="pagerank", edges=n, iters=3, nodes=out["nodes"],
         rank_mass=float(out["mass"]), wall_s=round(time.time() - t0, 1))


def phase_semdedup(spark: SparkSession) -> None:
    """1M × 64-dim hash-derived vectors in 2048 cells (~490/cell),
    5% planted near-dups; Arrow engine = one numpy matmul per cell."""
    n, dim, cells = 1_000_000, 64, 2048
    base = (F.col("id") - F.pmod(F.col("id"), F.lit(20)))
    is_dup = F.pmod(F.col("id"), F.lit(20)) == 1  # id 20k+1 duplicates 20k
    seed = F.when(is_dup, base).otherwise(F.col("id"))
    vec = F.array(*[
        (F.pmod(F.xxhash64(seed, F.lit(d)), F.lit(2_000_001)) / 1_000_000.0
         - 1.0).cast("float")
        for d in range(dim)
    ])
    v = (
        spark.range(n, numPartitions=spark.sparkContext.defaultParallelism * 2)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"),
                F.pmod(F.xxhash64(seed), F.lit(cells)).cast("int").alias("label"))
    )
    t0 = time.time()
    kept = dedup.semantic_dedup(v, threshold=0.99, engine="arrow")
    out = kept.agg(F.count(F.lit(1)).alias("n")).head()
    emit(phase="semdedup_arrow", rows=n, dim=dim, cells=cells,
         kept=out["n"], dropped=n - out["n"],
         wall_s=round(time.time() - t0, 1))


def phase_bm25(spark: SparkSession) -> None:
    """BM25 over a 2M-doc corpus (reuses scale_stress.gen_corpus
    singleton regime, ~120M token postings) for a 20-query × 8-term
    query set."""
    from scale_stress import gen_corpus  # noqa: same tools dir

    out_dir = os.environ.get("STRESS_DIR", "/tmp/fs_stress_r3b") + "/docs"
    if not os.path.exists(out_dir):
        gen_corpus(spark, 2_000_000, big_clusters=0, big_size=1,
                   small_frac=0.0, out=out_dir)
    docs = spark.read.parquet(out_dir)
    qrows = [(q, f"w{(q * 997 + t * 131) % 30000}")
             for q in range(20) for t in range(8)]
    queries = spark.createDataFrame(qrows, "query_id bigint, term string")
    t0 = time.time()
    res = retrieval.bm25_topk(docs, queries, k=10)
    n = res.count()
    emit(phase="bm25", docs=2_000_000, queries=20, terms_per_query=8,
         topk_rows=n, wall_s=round(time.time() - t0, 1))


def _hash_vectors(spark: SparkSession, n: int, dim: int):
    vec = F.array(*[
        (F.pmod(F.xxhash64("id", F.lit(d)), F.lit(2_000_001)) / 1_000_000.0
         - 1.0).cast("float")
        for d in range(dim)
    ])
    return (
        spark.range(n, numPartitions=spark.sparkContext.defaultParallelism * 2)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
    )


def phase_kmeans(spark: SparkSession) -> None:
    """1M × 32-dim vectors, k=64, 2 Lloyd steps — assignment is a
    broadcast cross join (64 rounded distances/row), recompute is one
    exploded aggregation (32M rows) per step."""
    from filters_spark.functions import similarity

    n, dim, k = 1_000_000, 32, 64
    v = _hash_vectors(spark, n, dim)
    for engine in (os.environ.get("KMEANS_ENGINES") or "arrow").split(","):
        t0 = time.time()
        a = similarity.kmeans(v, k=k, iters=2, engine=engine)
        out = a.groupBy("cluster").agg(F.count(F.lit(1)).alias("n")) \
            .agg(F.count(F.lit(1)).alias("clusters"),
                 F.sum("n").alias("rows")).head()
        emit(phase="kmeans", engine=engine, rows=n, dim=dim, k=k, iters=2,
             clusters=out["clusters"], assigned=out["rows"],
             wall_s=round(time.time() - t0, 1))


def phase_knn(spark: SparkSession) -> None:
    """kNN graph over 500k × 32-dim vectors in 4096 cells (~122/cell):
    within-cell pair space ~61M scored pairs for top-5 edges."""
    from filters_spark.functions import similarity

    n, dim, cells = 500_000, 32, 4096
    v = _hash_vectors(spark, n, dim).withColumn(
        "label", F.pmod(F.xxhash64("vec_id"), F.lit(cells)).cast("int"))
    t0 = time.time()
    g = similarity.knn_graph(v, k=5, block_col="label")
    m = g.count()
    emit(phase="knn_graph", rows=n, dim=dim, cells=cells, edges=m,
         wall_s=round(time.time() - t0, 1))


def phase_capstone(spark: SparkSession) -> None:
    """The ds_corpus_pipeline_v3 composition at 2M docs: reuses the
    bm25 phase's corpus, joins hash-derived 32-dim embeddings (5%
    planted near-dup pairs in 4096 cells), then repetition gate →
    exact text dedup → SemDeDup (ARROW engine — the scale path) →
    epoch shuffle into 256 shards."""
    from filters_spark.functions import text

    out_dir = os.environ.get("STRESS_DIR", "/tmp/fs_stress_r3b") + "/docs"
    if not os.path.exists(out_dir):
        from scale_stress import gen_corpus

        gen_corpus(spark, 2_000_000, big_clusters=0, big_size=1,
                   small_frac=0.0, out=out_dir)
    docs = spark.read.parquet(out_dir)
    n, dim, cells = 2_000_000, 32, 4096
    base = (F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(20)))
    seed = F.when(F.pmod(F.col("doc_id"), F.lit(20)) == 1, base) \
        .otherwise(F.col("doc_id"))
    vec = F.array(*[
        (F.pmod(F.xxhash64(seed, F.lit(d)), F.lit(2_000_001)) / 1_000_000.0
         - 1.0).cast("float")
        for d in range(dim)
    ])
    j = docs.select(
        "doc_id", "text", vec.alias("embedding"),
        F.pmod(F.xxhash64(seed), F.lit(cells)).cast("int").alias("label"))

    t0 = time.time()
    q = text.repetition_gate(j, "doc_id", "text", max_dup_line_frac=0.85)
    ded = dedup.exact_text_dedup(q, "doc_id", "text").select(
        "doc_id", "text", "embedding", "label")
    kept = dedup.semantic_dedup(ded, "doc_id", "embedding", "label",
                                threshold=0.99, engine="arrow")
    kept = kept.localCheckpoint(eager=False)
    sh = sampling.global_shuffle(
        kept.select("doc_id",
                    F.size(F.split("text", " ")).alias("n_tok")),
        "doc_id", 256)
    res = (
        sh.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("tok"))
        .agg(F.count(F.lit(1)).alias("shards"), F.sum("n").alias("docs"),
             F.sum("tok").alias("tokens"))
        .head()
    )
    emit(phase="capstone_v3", in_docs=n, shards=res["shards"],
         out_docs=res["docs"], tokens=res["tokens"],
         wall_s=round(time.time() - t0, 1))


PHASES = {
    "shuffle": phase_shuffle,
    "scd2": phase_scd2,
    "pagerank": phase_pagerank,
    "semdedup": phase_semdedup,
    "bm25": phase_bm25,
    "kmeans": phase_kmeans,
    "knn": phase_knn,
    "capstone": phase_capstone,
}


def main() -> int:
    names = sys.argv[1:] or list(PHASES)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        PHASES[name](spark)
    return 0


if __name__ == "__main__":
    sys.exit(main())
