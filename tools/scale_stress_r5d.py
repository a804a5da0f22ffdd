"""Scale stress for the round-5 projection family: JL random
projection (functions.projection.random_projection) and the exact
distributed covariance (covariance_pairs, both engines).  One JSON
line per phase; numbers land in SCALE.md.

Run:
    python tools/scale_stress_r5d.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import projection as P


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r5d")
        .master(f"local[{cpus}, 3]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("STRESS_DRIVER_MEM", "48g"))
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )


def emit(**kw) -> None:
    sys.stdout.write(json.dumps(kw) + "\n")
    sys.stdout.flush()


def synth_vectors(spark: SparkSession, n: int, dim: int, parts: int):
    """n deterministic dim-dim vectors in [-1, 1): xxhash64-derived,
    no RNG, reproducible across runs — correlated enough (shared id
    seed) that covariance is non-trivial."""
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            ((F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(2_000_000))
              - 1_000_000) / 1_000_000.0).cast("float")
            for d in range(dim)
        ]).alias("embedding"))


def stress_projection(spark: SparkSession, n: int = 2_000_000,
                      dim: int = 64, out_dim: int = 16) -> None:
    """2M × 64-dim vectors -> 16 exact micro-unit coordinates each.
    Invariants: a planted duplicate pair (ids 7 and n-1 share content
    via the deterministic synth of id 7) projects identically, and
    the plan stays shuffle-free up to the final count."""
    v = synth_vectors(spark, n, dim, 64)
    dup = synth_vectors(spark, 8, dim, 1).where(F.col("vec_id") == 7) \
        .select((F.lit(n + 1)).alias("vec_id"), "embedding")
    df = v.unionByName(dup)
    out = P.random_projection(df, out_dim=out_dim, seed=0, dim=dim)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "projection must not shuffle"
    t0 = time.time()
    chk = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.element_at("projected_q", 1)).alias("c1"),
    ).head()
    dt = time.time() - t0
    pair = (out.where(F.col("vec_id").isin(7, n + 1))
            .select("projected_q").collect())
    assert len(pair) == 2 and list(pair[0][0]) == list(pair[1][0]), \
        "planted duplicate must project identically"
    emit(phase="random_projection", n_rows=n + 1, dim=dim,
         out_dim=out_dim, wall_s=round(dt, 1),
         checksum=int(chk["c1"]), zero_shuffle=True)


def stress_covariance(spark: SparkSession, n: int = 2_000_000,
                      dim: int = 64, n_expr: int = 200_000) -> None:
    """Exact covariance at scale: arrow (the production path) at
    2M × 64, plus an engine-identity check — arrow vs expr at
    200k × 64 must be INTEGER-IDENTICAL, the whole point of the
    micro-unit discipline (the expr engine is the SQL-replayable
    gate shape; its O(n·d²) interpreter work makes 2M × 64 a
    multi-hundred-second run, so the identity check uses the 200k
    slice — exactness is scale-independent).  Also pins the O(d²)
    result contract: exactly d(d+1)/2 rows out regardless of n."""
    v = synth_vectors(spark, n, dim, 64)
    t0 = time.time()
    a = {(r["i"], r["j"]): (r["n"], int(r["sxy"]), int(r["cov_num"]))
         for r in P.covariance_pairs(v, dim=dim, engine="arrow").collect()}
    dt_a = time.time() - t0
    assert len(a) == dim * (dim + 1) // 2, len(a)
    sub = v.where(F.col("vec_id") < n_expr)
    t0 = time.time()
    e = {(r["i"], r["j"]): (r["n"], int(r["sxy"]), int(r["cov_num"]))
         for r in P.covariance_pairs(sub, dim=dim, engine="expr").collect()}
    dt_e = time.time() - t0
    t0 = time.time()
    a2 = {(r["i"], r["j"]): (r["n"], int(r["sxy"]), int(r["cov_num"]))
          for r in P.covariance_pairs(sub, dim=dim, engine="arrow").collect()}
    dt_a2 = time.time() - t0
    assert a2 == e, "arrow and expr covariance must be integer-identical"
    comps, eig = P.pca_components(
        P.covariance_pairs(v, dim=dim, engine="arrow"), dim=dim, k=8)
    assert eig == sorted(eig, reverse=True) and eig[-1] >= -1e-12
    emit(phase="covariance", n_rows=n, dim=dim, pair_rows=len(a),
         arrow_2m_s=round(dt_a, 1), expr_200k_s=round(dt_e, 1),
         arrow_200k_s=round(dt_a2, 1),
         engines_identical=True, top_eig=round(eig[0], 8))




def synth_docs(spark: SparkSession, n: int, parts: int):
    """n deterministic 30-token docs over a 100k-word vocabulary
    (xxhash64-derived, zipf-free but collision-rich at 2M docs)."""
    from filters_spark.functions import text as _  # noqa: F401

    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("w"), F.pmod(
                F.xxhash64(F.col("id"), F.lit(t)),
                F.lit(100_000)).cast("string"))
            for t in range(30)]).alias("text"))


def stress_hashing(spark: SparkSession, n: int = 2_000_000,
                   dim: int = 256) -> None:
    """2M docs × 30 tokens through the hashing featurizer.
    Invariants: a planted byte-identical duplicate doc produces an
    IDENTICAL dense vector (featurize-then-dedup safety), and the
    sparse plan carries exactly the one (doc, bucket) aggregate
    exchange — vocabulary size never appears in the plan."""
    from filters_spark.functions import text

    docs = synth_docs(spark, n, 64)
    dup = (synth_docs(spark, 8, 1).where(F.col("doc_id") == 7)
           .select(F.lit(n + 1).alias("doc_id"), "text"))
    df = docs.unionByName(dup)
    sparse = text.hashing_vectorize(df, dim=dim)
    plan = sparse._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange")
    assert n_ex <= 1, f"sparse featurizer must shuffle once, saw {n_ex}"
    t0 = time.time()
    agg = sparse.agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum(F.col("weight") * F.col("bucket")).alias("chk")).head()
    dt = time.time() - t0
    pair = (text.hashing_vectors_dense(
        df.where(F.col("doc_id").isin(7, n + 1)), dim=dim)
        .select("embedding").collect())
    assert len(pair) == 2 and list(pair[0][0]) == list(pair[1][0]), \
        "planted duplicate must featurize identically"
    emit(phase="hashing_vectorize", n_docs=n + 1, dim=dim,
         wall_s=round(dt, 1), nnz_rows=int(agg["nnz"]),
         checksum=int(agg["chk"]), one_shuffle=True)


def stress_text_clusters(spark: SparkSession, n: int = 2_000_000,
                         dim: int = 32, k: int = 8) -> None:
    """The model-free clustering capstone at 2M docs: hashing
    featurizer -> dense vectors -> k-means (arrow assignment — the
    expr HOF distance loop is the measured 295-s-at-1M cliff).
    Invariants: every doc is assigned (counts sum to n+1) and the
    planted byte-identical duplicate doc lands in ITS twin's cluster
    (identical vectors must assign identically)."""
    from filters_spark.functions import similarity, text
    from filters_spark.functions._cache import scoped_persist

    docs = synth_docs(spark, n, 64)
    dup = (synth_docs(spark, 8, 1).where(F.col("doc_id") == 7)
           .select(F.lit(n + 1).alias("doc_id"), "text"))
    df = docs.unionByName(dup)
    dense = scoped_persist(
        text.hashing_vectors_dense(df, dim=dim), "stress_text_clusters")
    t0 = time.time()
    a = similarity.kmeans(dense, k=k, iters=2, id_col="doc_id",
                          engine="arrow")
    counts = a.groupBy("cluster").count().collect()
    dt = time.time() - t0
    total = sum(r["count"] for r in counts)
    assert total == n + 1, total
    pair = a.where(F.col("doc_id").isin(7, n + 1))         .select("cluster").collect()
    assert len(pair) == 2 and pair[0][0] == pair[1][0],         "identical docs must cluster together"
    emit(phase="text_clusters", n_docs=n + 1, dim=dim, k=k,
         wall_s=round(dt, 1), n_clusters=len(counts),
         sizes=sorted(r["count"] for r in counts)[-3:])


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    stress_projection(spark)
    stress_covariance(spark)
    stress_hashing(spark)
    stress_text_clusters(spark)
    spark.stop()


if __name__ == "__main__":
    main()
