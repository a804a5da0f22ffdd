"""Similarity search over embedding columns (BASELINE.json north
star): brute-force cosine top-k baseline + LSH-bucketed ANN scale
path.

Scale design:

* **Brute-force top-k** is correct and embarrassingly parallel: the
  query set is broadcast (it must be small — that is the contract of
  "top-k for these queries"), each partition scores its local vectors
  and a window/rank (or per-partition top-k then global merge via
  AQE) cuts to k.  Cost is O(n·q·d) FLOPs JVM-side — at 100 TB this
  is the exhaustive re-rank stage, not the first pass.
* **Random-hyperplane LSH** buckets vectors by sign bits of
  pseudo-random projections (planes derived deterministically from
  md5, so plan + oracle are reproducible without shipping plane
  matrices).  Probing = same-bucket join, then exact re-rank.  The
  shuffle key is the bucket id; collision counts are tunable via
  n_planes.
* Dot products use ``F.zip_with`` + ``F.aggregate`` — pure codegen,
  no Python.  A pandas-UDF numpy variant exists for very wide
  vectors where JVM expression depth becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "norm",
    "cosine",
    "cosine_topk",
    "lsh_buckets",
    "lsh_topk",
]


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector.

    ``queries`` is broadcast — brute force scores every (query,
    vector) pair map-side with zero shuffle; only the rank cut
    shuffles, keyed by query id (cardinality = |queries|).
    Returns (query_id, neighbor_id, score, rank); ties broken by
    neighbor id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("_qv"), F.col("_nv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _plane_weight(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1),
    derived from md5 so any engine reproduces the same planes."""
    import hashlib

    h = hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 31) - 1.0


def lsh_buckets(df: DataFrame, n_planes: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding",
                dim: int | None = None) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign bits of ``n_planes``
    projections.  Plane weights are literals baked into the plan —
    no side data to ship."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col))).first()
        dim = first[0]
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        weights = [_plane_weight(p, d) for d in range(dim)]
        proj = None
        arr = F.col(vec_col)
        # dot(vec, plane) with literal weights, unrolled
        proj = F.aggregate(
            F.zip_with(
                arr,
                F.array(*[F.lit(w) for w in weights]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(0).cast("long")
    return df.withColumn("_bucket", bucket)


def lsh_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
             n_planes: int = 6, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only same-bucket pairs, then rank.  Recall is
    tuned by lowering n_planes (bigger buckets) or multi-probing;
    exactness is traded for a |bucket|/n scan fraction."""
    vb = lsh_buckets(vectors, n_planes, id_col, vec_col)
    qb = lsh_buckets(queries, n_planes, id_col, vec_col)
    q = qb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        F.col("_bucket").alias("_qb"),
    )
    v = vb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv"),
        F.col("_bucket"),
    )
    scored = (
        v.join(F.broadcast(q),
               (F.col("_qb") == F.col("_bucket"))
               & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id",
                cosine(F.col("_qv"), F.col("_nv")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
