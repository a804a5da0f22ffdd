"""Scale stress for the round-5 work: the two-phase exact-n
stratified sampler at 50M rows / 5 strata (the VERDICT r4
scale-killer fix — the old plan funneled 10M rows per stratum
through ONE window task), and ExactSubstr span REMOVAL over a
planted multi-million-doc corpus.

Inputs are pure Spark expressions (hash-derived, no RNG — reruns are
bit-identical).  Each phase prints one JSON line; numbers land in
SCALE.md §23.

Usage:
    python tools/scale_stress_r5.py              # all phases
    python tools/scale_stress_r5.py stratified   # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import dedup, sampling


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r5")
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


def stress_stratified(spark: SparkSession, n_rows: int = 50_000_000,
                      n_strata: int = 5, n_keep: int = 1000) -> None:
    """50M rows, 5 strata (10M rows/stratum), keep 1000 per stratum.

    Checks: (a) wall clock for the two-phase plan vs the salt=1
    single-window plan; (b) the physical plan's phase-1 window
    partitions by (stratum, salt) — parallelism strata×salt, never
    one task per stratum over the raw input; (c) both plans select
    the IDENTICAL row set (checksum equality — the provable-identity
    contract at scale)."""
    df = (spark.range(n_rows)
          .select(F.col("id").alias("k"),
                  (F.col("id") % n_strata).cast("string").alias("g")))

    def run(salt):
        kept = sampling.stratified_fixed_n(df, "k", "g", n_keep, salt=salt)
        t0 = time.time()
        row = kept.agg(F.count(F.lit(1)).alias("n"),
                       F.sum("k").cast("bigint").alias("chk")).head()
        return time.time() - t0, row["n"], row["chk"]

    plan = (sampling.stratified_fixed_n(df, "k", "g", n_keep)
            ._jdf.queryExecution().executedPlan().toString())
    # phase-1 window must carry the salt key
    assert "_salt" in plan, "two-phase plan lost its salt partition"
    wall2, n2, chk2 = run(32)
    wall1, n1, chk1 = run(1)
    assert (n1, chk1) == (n2, chk2), "two-phase selected different rows"
    assert n2 == n_strata * n_keep
    emit(phase="stratified_fixed_n", rows=n_rows, strata=n_strata,
         n_keep=n_keep, wall_two_phase_s=round(wall2, 1),
         wall_single_window_s=round(wall1, 1), checksum=chk2,
         identical=True)


def stress_span_removal(spark: SparkSession, n_docs: int = 2_000_000,
                        bp_every: int = 10) -> None:
    """Span REMOVAL over the r4 stress corpus shape: n_docs of 40
    unique tokens, every bp_every-th doc appending a FIXED 40-token
    boilerplate (window=20 → each boilerplate doc duplicates exactly
    the 21 windows covering tokens 41..80).  Exact invariants:

    * canonical holder = smallest doc id among planted docs; every
      OTHER planted doc loses exactly 40 tokens (the merged range
      [41, 80]);
    * clean docs keep all 40 tokens untouched;
    * total tokens removed = (n_planted - 1) * 40.
    """
    bp = " ".join(f"bp{j}" for j in range(40))
    uniq = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(39)),
                         lambda j: F.concat(F.lit("u"), F.col("id"),
                                            F.lit("x"), j)))
    docs = (spark.range(n_docs)
            .select(F.col("id").alias("doc_id"),
                    F.when(F.col("id") % bp_every == 0,
                           F.concat(uniq, F.lit(" " + bp)))
                    .otherwise(uniq).alias("text")))
    par = spark.sparkContext.defaultParallelism
    t0 = time.time()
    out = dedup.remove_duplicate_spans(docs, window=20,
                                       explode_partitions=par * 4)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_removed").cast("bigint").alias("removed"),
        F.sum(F.when(F.col("n_tokens_removed") == 40, 1).otherwise(0))
        .cast("bigint").alias("docs_cut_40"),
        F.sum(F.when(F.col("n_tokens_removed") == 0, 1).otherwise(0))
        .cast("bigint").alias("docs_untouched"),
    ).head()
    wall = time.time() - t0
    n_planted = (n_docs + bp_every - 1) // bp_every
    assert agg["n_docs"] == n_docs
    assert agg["removed"] == (n_planted - 1) * 40, agg
    assert agg["docs_cut_40"] == n_planted - 1
    assert agg["docs_untouched"] == n_docs - n_planted + 1
    emit(phase="span_removal", docs=n_docs, planted=n_planted,
         wall_s=round(wall, 1), tokens_removed=agg["removed"],
         invariants="exact")


def stress_append(spark: SparkSession, n_base: int = 2_000_000,
                  n_delta: int = 200_000) -> None:
    """Append-vs-rebuild cost for the materialized BM25 index
    (VERDICT r4 task 5's SCALE.md row): 2M-doc base corpus, a 10%
    daily delta.  Checks the appended index's stats are bit-identical
    to a full rebuild's and reports the wall-clock ratio — the
    O(delta)-vs-O(corpus) claim, measured."""
    import shutil

    from filters_spark.functions import retrieval

    def corpus(lo, hi):
        body = F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), F.lit(39)),
                             lambda j: F.concat(F.lit("w"),
                                                F.pmod(F.xxhash64(
                                                    F.col("id") * 40 + j),
                                                    F.lit(50_000)))))
        return (spark.range(lo, hi)
                .select(F.col("id").alias("doc_id"), body.alias("text")))

    base, delta = corpus(0, n_base), corpus(n_base, n_base + n_delta)
    p_app, p_reb = "/tmp/fs_stress_append", "/tmp/fs_stress_rebuild"
    shutil.rmtree(p_app, ignore_errors=True)
    shutil.rmtree(p_reb, ignore_errors=True)
    t0 = time.time()
    retrieval.materialize_postings(base, p_app)
    build_s = time.time() - t0
    t0 = time.time()
    retrieval.append_postings(spark, p_app, delta)
    append_s = time.time() - t0
    t0 = time.time()
    retrieval.materialize_postings(base.unionByName(delta), p_reb)
    rebuild_s = time.time() - t0
    sa = spark.read.parquet(f"{p_app}/stats").head()
    sr = spark.read.parquet(f"{p_reb}/stats").head()
    assert tuple(sa) == tuple(sr), (sa, sr)
    emit(phase="postings_append", base_docs=n_base, delta_docs=n_delta,
         build_s=round(build_s, 1), append_s=round(append_s, 1),
         rebuild_s=round(rebuild_s, 1),
         speedup=round(rebuild_s / max(append_s, 1e-9), 1),
         stats_bit_identical=True)
    shutil.rmtree(p_app, ignore_errors=True)
    shutil.rmtree(p_reb, ignore_errors=True)


def stress_incremental_dedup(spark: SparkSession,
                             n_base: int = 2_000_000,
                             n_delta: int = 100_000) -> None:
    """Signature-store incremental dedup at 2M base docs + a 5%
    delta with PLANTED cross-batch duplicates: every 20th delta doc
    copies a base doc's text.  Exact invariant: the threshold-1.0
    pair count equals the planted count (each planted delta doc is
    byte-identical to exactly one base doc; unique filler text is
    collision-free by construction)."""
    import shutil

    from filters_spark.functions import dedup

    def text_of(prefix):
        return F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), F.lit(24)),
                             lambda j: F.concat(F.lit(prefix),
                                                F.col("id"), F.lit("x"), j)))

    base = spark.range(n_base).select(
        F.col("id").alias("doc_id"), text_of("u").alias("text"))
    # delta ids disjoint; every 20th delta doc clones base doc
    # (id - n_base)'s text by re-generating that doc's expression
    clone = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(24)),
        lambda j: F.concat(F.lit("u"), F.col("id") - n_base,
                           F.lit("x"), j)))
    delta = spark.range(n_base, n_base + n_delta).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") - n_base) % 20 == 0, clone)
        .otherwise(text_of("d")).alias("text"))
    path = "/tmp/fs_stress_sigstore"
    shutil.rmtree(path, ignore_errors=True)
    t0 = time.time()
    dedup.materialize_signatures(base, path, shingle_k=3,
                                 n_hashes=16, n_bands=8, hash_fn="xx64")
    build_s = time.time() - t0
    t0 = time.time()
    pairs = dedup.dedup_pairs_against(spark, path, delta, threshold=1.0,
                                      star_buckets_over=64,
                                      broadcast_delta=True)
    n_pairs = pairs.count()
    probe_s = time.time() - t0
    planted = (n_delta + 19) // 20
    assert n_pairs == planted, (n_pairs, planted)
    emit(phase="incremental_dedup", base_docs=n_base, delta_docs=n_delta,
         build_s=round(build_s, 1), probe_s=round(probe_s, 1),
         planted_pairs=planted, found_pairs=n_pairs)
    shutil.rmtree(path, ignore_errors=True)


def stress_bpe(spark: SparkSession, n_docs: int = 2_000_000,
               n_merges: int = 8) -> None:
    """BPE training at 2M docs: the corpus folds to a vocabulary in
    one pass and every merge iteration is vocab-sized — wall clock
    should be dominated by the single corpus rollup."""
    body = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(29)),
                         lambda j: F.concat(
                             F.lit("w"),
                             F.pmod(F.xxhash64(F.col("id") * 30 + j),
                                    F.lit(20_000)))))
    docs = spark.range(n_docs).select(body.alias("text"))
    from filters_spark.functions import text as T
    t0 = time.time()
    merges = T.bpe_train(docs, n_merges=n_merges)
    wall = time.time() - t0
    assert len(merges) == n_merges
    emit(phase="bpe_train", docs=n_docs, merges=n_merges,
         wall_s=round(wall, 1),
         top_merge=f"{merges[0][1]}+{merges[0][2]}@{merges[0][3]}")


def stress_clusters(spark: SparkSession, n_base: int = 5_000_000,
                    n_batch: int = 50_000) -> None:
    """append_clusters at 5M stored docs: the batch's pairs include
    MERGE events (new docs uniting two existing clusters).  The
    O(batch + merges) claim, measured: the append's CC runs over the
    contracted batch-induced graph (~n_batch nodes), never the 5M
    stored assignments; read_canonical resolves the merge remaps.

    Exact invariants: base = 2.5M two-doc clusters (2k, 2k+1);
    every batch doc 5M+i links clusters 4i and 4i+2 — each batch doc
    merges two adjacent base clusters, so afterwards those 4 base
    docs + the batch doc share canonical 4i."""
    import shutil

    from filters_spark.functions import dedup

    path = "/tmp/fs_stress_clusters"
    shutil.rmtree(path, ignore_errors=True)
    ids = spark.range(n_base).select(F.col("id").alias("doc_id"))
    base_pairs = (spark.range(n_base // 2)
                  .select((F.col("id") * 2).alias("a_id"),
                          (F.col("id") * 2 + 1).alias("b_id")))
    t0 = time.time()
    dedup.materialize_clusters(spark, path, ids, base_pairs)
    build_s = time.time() - t0
    new_ids = spark.range(n_base, n_base + n_batch).select(
        F.col("id").alias("doc_id"))
    i = F.col("id") - n_base
    new_pairs = (spark.range(n_base, n_base + n_batch)
                 .select((i * 4).alias("a_id"), F.col("id").alias("b_id"))
                 .unionByName(
                     spark.range(n_base, n_base + n_batch)
                     .select((i * 4 + 2).alias("a_id"),
                             F.col("id").alias("b_id"))))
    t0 = time.time()
    dedup.append_clusters(spark, path, new_ids, new_pairs)
    append_s = time.time() - t0
    t0 = time.time()
    canon = dedup.read_canonical(spark, path)
    agg = canon.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("canon_id").alias("k"),
        F.sum(F.when(F.col("doc_id") >= n_base,
                     F.col("canon_id")).otherwise(0))
        .cast("bigint").alias("batch_canon_sum"),
    ).head()
    read_s = time.time() - t0
    assert agg["n"] == n_base + n_batch
    # merged: each batch doc collapses clusters {4i,4i+1} and
    # {4i+2,4i+3} into one -> total clusters = 2.5M - n_batch
    assert agg["k"] == n_base // 2 - n_batch, agg["k"]
    # every batch doc's canonical = 4i
    expected = sum(4 * i for i in range(n_batch))
    assert agg["batch_canon_sum"] == expected
    emit(phase="cluster_append", base_docs=n_base, batch_docs=n_batch,
         build_s=round(build_s, 1), append_s=round(append_s, 1),
         read_s=round(read_s, 1), clusters=agg["k"], invariants="exact")
    shutil.rmtree(path, ignore_errors=True)


PHASES = {
    "stratified": stress_stratified,
    "span_removal": stress_span_removal,
    "append": stress_append,
    "incremental_dedup": stress_incremental_dedup,
    "bpe": stress_bpe,
    "clusters": stress_clusters,
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
