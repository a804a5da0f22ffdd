"""Scale stress for the round-4 additions: substring duplicate-span
detection over a multi-million-doc corpus with PLANTED boilerplate
(so the output is verifiable, not just timed), and the materialized
BM25 postings probe path.

Inputs are pure Spark expressions (hash-derived, no RNG — reruns are
bit-identical).  Each phase prints one JSON line; numbers land in
SCALE.md §21.

Usage:
    python tools/scale_stress_r4.py              # all phases
    python tools/scale_stress_r4.py spans        # subset
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import dedup, retrieval


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r4")
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


def _corpus(spark: SparkSession, n_docs: int, bp_every: int = 10):
    """n_docs synthetic docs: 40 unique md5-derived tokens each;
    every ``bp_every``-th doc appends a FIXED 40-token boilerplate.
    With window=20 each boilerplate doc carries exactly 21 duplicated
    windows (starts 41..61 of its 80 tokens) in one run — a 40-token
    exactly-repeated span — and no other window repeats."""
    bp = " ".join(f"bp{j}" for j in range(40))
    # unique tokens are unique BY CONSTRUCTION (u<id>x<j>) — a first
    # cut used 6-hex md5 prefixes and planted ~600 REAL extra dup
    # windows via birthday collisions on the token adjoining the
    # boilerplate (the detector correctly found them; the invariants
    # need a collision-free corpus to be exact)
    uniq = F.concat_ws(
        " ",
        F.transform(F.sequence(F.lit(0), F.lit(39)),
                    lambda j: F.concat(F.lit("u"),
                                       F.col("id").cast("string"),
                                       F.lit("x"), j.cast("string"))))
    par = spark.sparkContext.defaultParallelism * 2
    return (
        spark.range(n_docs, numPartitions=par)
        .select(F.col("id").alias("doc_id"),
                F.when(F.col("id") % bp_every == 0,
                       F.concat(uniq, F.lit(" " + bp)))
                .otherwise(uniq).alias("text"))
    )


def phase_spans(spark: SparkSession) -> None:
    for n in (1_000_000, 2_000_000):
        docs = _corpus(spark, n)
        t0 = time.time()
        spans = dedup.duplicate_spans(
            docs, "doc_id", "text", window=20,
            explode_partitions=spark.sparkContext.defaultParallelism * 2)
        res = spans.agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.when(F.col("max_dup_span_tokens") > 0, 1).otherwise(0))
            .alias("docs_with_span"),
            F.max("max_dup_span_tokens").alias("max_span"),
            F.sum("n_dup_windows").alias("dup_windows"),
        ).head()
        wall = round(time.time() - t0, 1)
        expected_docs = n // 10
        ok = (res["docs"] == n
              and res["docs_with_span"] == expected_docs
              and res["max_span"] == 40
              and res["dup_windows"] == expected_docs * 21)
        emit(phase="duplicate_spans", docs=n, wall_s=wall,
             docs_with_span=res["docs_with_span"], max_span=res["max_span"],
             dup_windows=res["dup_windows"], invariants_ok=bool(ok))
        if not ok:
            raise SystemExit(f"invariant failure: {res}")


def phase_bm25_index(spark: SparkSession) -> None:
    """Materialize postings for 2M docs once, then probe with two
    query sets — the index-reuse path vs the one-shot bm25_topk."""
    import shutil
    import tempfile

    n = 2_000_000
    docs = _corpus(spark, n, bp_every=7)
    path = tempfile.mkdtemp(prefix="bm25_idx_")
    try:
        t0 = time.time()
        retrieval.materialize_postings(docs, path, term_partitions=64)
        build_s = round(time.time() - t0, 1)
        q = spark.createDataFrame(
            [(1, "bp0"), (1, "bp7"), (2, "bp11"), (2, "bp39")],
            "query_id bigint, term string")
        t1 = time.time()
        rows = retrieval.bm25_topk_from_postings(spark, path, q, k=10).count()
        probe_s = round(time.time() - t1, 1)
        t2 = time.time()
        rows2 = retrieval.bm25_topk_from_postings(spark, path, q, k=10).count()
        probe2_s = round(time.time() - t2, 1)
        emit(phase="bm25_materialized", docs=n, build_s=build_s,
             probe_s=probe_s, probe2_s=probe2_s, topk_rows=rows,
             stable=bool(rows == rows2))
    finally:
        shutil.rmtree(path, ignore_errors=True)


def phase_cms(spark: SparkSession) -> None:
    """50M rows, skewed keys: the count-min table must stay d·w rows
    (the bounded-state contract) and the hot keys' estimates must
    never undercount their exact counts."""
    from filters_spark.functions import sketch

    n = 50_000_000
    par = spark.sparkContext.defaultParallelism * 2
    # key = id % 997 for the bulk, but ids ≡ 0 (mod 5) collapse onto
    # key 7 — a ~20% hot key plus a uniform tail, all deterministic
    df = spark.range(n, numPartitions=par).select(
        F.when(F.col("id") % 5 == 0, F.lit(7))
        .otherwise(F.col("id") % 997).alias("k"))
    t0 = time.time()
    table = sketch.cms_table(df, "k", depth=4, width=4096)
    table_rows = table.count()
    build_s = round(time.time() - t0, 1)
    hot = spark.createDataFrame([(7,), (1,), (996,)], "k bigint")
    t1 = time.time()
    est = {r["k"]: r["est"] for r in
           sketch.cms_estimate(table, hot, "k", depth=4,
                               width=4096).collect()}
    probe_s = round(time.time() - t1, 1)
    exact = {r["k"]: r["n"] for r in
             df.join(F.broadcast(hot), "k", "left_semi")
             .groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    ok = (table_rows <= 4 * 4096
          and all(est[k] >= exact[k] for k in exact))
    emit(phase="cms", rows=n, table_rows=table_rows, build_s=build_s,
         probe_s=probe_s,
         hot_exact=exact[7], hot_est=est[7], invariants_ok=bool(ok))
    if not ok:
        raise SystemExit(f"invariant failure: {est} vs {exact}")


def phase_zorder(spark: SparkSession) -> None:
    """20M rows × 2 independent dims → z-ordered write; a 10%×10% box
    predicate must prune most files."""
    import shutil
    import tempfile

    from filters_spark.functions import layout

    n = 20_000_000
    par = spark.sparkContext.defaultParallelism * 2
    hx = (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8),
                 16, 10).cast("double") / float(16 ** 8) * 1000)
    hy = (F.conv(F.substring(F.md5(F.concat(F.lit("y"),
                                            F.col("id").cast("string"))),
                             1, 8), 16, 10).cast("double")
          / float(16 ** 8) * 1000)
    df = spark.range(n, numPartitions=par).select(
        hx.alias("x"), hy.alias("y"))
    path = tempfile.mkdtemp(prefix="zorder_")
    try:
        t0 = time.time()
        layout.write_zordered(df, f"{path}/z", ["x", "y"],
                              bits=8, n_files=64)
        write_s = round(time.time() - t0, 1)
        z = spark.read.parquet(f"{path}/z")
        total = z.select(F.input_file_name()).distinct().count()
        t1 = time.time()
        hits = (z.where((F.col("x") < 100) & (F.col("y") < 100))
                .select(F.input_file_name()).distinct().count())
        probe_s = round(time.time() - t1, 1)
        ok = hits <= total // 4
        emit(phase="zorder", rows=n, write_s=write_s, files=total,
             box_files=hits, probe_s=probe_s, invariants_ok=bool(ok))
        if not ok:
            raise SystemExit(f"pruning failure: {hits}/{total}")
    finally:
        shutil.rmtree(path, ignore_errors=True)


def phase_ivf_index(spark: SparkSession) -> None:
    """1M×32 vectors into a cell-partitioned IVF index (4096 LSH
    cells); probe 10 queries at nprobe=8 — the pruned read touches
    ~8/4096 of the corpus per query."""
    import shutil
    import tempfile

    from filters_spark.functions import similarity

    n, dim = 1_000_000, 32
    par = spark.sparkContext.defaultParallelism * 2
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (F.conv(F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit("|"),
                           d.cast("string"))), 1, 8), 16, 10)
            .cast("double") / float(16 ** 8) * 2 - 1))
    df = spark.range(n, numPartitions=par).select(
        F.col("id").alias("vec_id"), vec.alias("embedding"))
    path = tempfile.mkdtemp(prefix="ivf_idx_")
    try:
        t0 = time.time()
        similarity.materialize_ivf_index(df, path, n_cells=4096)
        build_s = round(time.time() - t0, 1)
        q = df.where(F.col("vec_id") < 10)
        t1 = time.time()
        hits = similarity.ivf_topk_from_index(spark, path, q, k=10,
                                              nprobe=8).count()
        probe_s = round(time.time() - t1, 1)
        t2 = time.time()
        hits2 = similarity.ivf_topk_from_index(spark, path, q, k=10,
                                               nprobe=8).count()
        probe2_s = round(time.time() - t2, 1)
        emit(phase="ivf_index", vecs=n, dim=dim, build_s=build_s,
             probe_s=probe_s, probe2_s=probe2_s, topk_rows=hits,
             stable=bool(hits == hits2))
    finally:
        shutil.rmtree(path, ignore_errors=True)


PHASES = {"spans": phase_spans, "bm25_index": phase_bm25_index,
          "cms": phase_cms, "zorder": phase_zorder,
          "ivf_index": phase_ivf_index}


def main(only: list[str]) -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in PHASES.items():
        if only and name not in only:
            continue
        fn(spark)


if __name__ == "__main__":
    main(sys.argv[1:])
