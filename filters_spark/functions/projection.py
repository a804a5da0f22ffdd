"""Embedding projections: Johnson–Lindenstrauss random projection,
exact distributed covariance, and PCA over ``array<float>`` columns.

Large-scale embedding pipelines reduce dimension BEFORE the expensive
steps (clustering, kNN graphs, SemDeDup cells): a 100 TB corpus with
768-dim vectors pays 768 multiplies per vector per centroid per
k-means round, while a JL sign projection to 64 dims preserves
pairwise distances within (1±ε) (Achlioptas 2001, "Database-friendly
random projections": entries drawn from {+1, −1} satisfy the JL lemma
with the same guarantee as Gaussian matrices) at 1/12 the cost — and
the projection itself is a PURE MAP: literal ±1 weights baked into the
plan, zero shuffles, zero side data.

Exactness discipline (the module-wide hash-gate contract): inputs are
quantized to micro-units BIGINT (``round(x·1e6)``) and every
distributed sum is integer arithmetic — integer addition commutes
exactly, so results are independent of partitioning, accumulation
order, and engine ulps.  The float conveniences (``projected``,
PCA component matrices) are derived AFTER the exact reductions.

PCA splits along the distribution boundary on purpose:
``covariance_pairs`` is the distributed piece (one scan, map-side
combined, O(d²) result rows regardless of corpus size) and is
SQL-replayable / hash-gated; the eigendecomposition is O(d³) on d²
numbers — driver-side numpy by design, NOT a distributed step, so it
is pinned by pytest invariants (orthonormality, descending
eigenvalues, variance accounting) rather than a DuckDB oracle.

Reference scope note: the reference library (PyPI ``filters``) has no
vector surface; this is the large-scale pipeline layer (SURVEY.md
§2.9), sibling to ``functions.similarity``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "rp_sign",
    "quantize_micro",
    "random_projection",
    "covariance_pairs",
    "pca_components",
    "pca_project",
]

MICRO = 1_000_000


def rp_sign(seed: int, row: int, col: int) -> int:
    """Deterministic ±1 projection-matrix entry from md5 — any engine
    (Spark, DuckDB, numpy test replays) reproduces the same matrix
    with no side data, the ``similarity._plane_weight`` convention."""
    h = hashlib.md5(f"rp:{seed}:{row}:{col}".encode()).hexdigest()
    return 1 if int(h[0], 16) % 2 == 0 else -1


def quantize_micro(vec: Column) -> Column:
    """array<float> → array<long> micro-units (``round(x·1e6)``),
    the exact-integer input every reduction in this module runs on.
    Precondition: |x| < 9e12 (micro value fits long) — real embedding
    components are O(1)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * MICRO, 0).cast("long"))


def random_projection(df: DataFrame, out_dim: int = 16, seed: int = 0,
                      vec_col: str = "embedding",
                      dim: int | None = None) -> DataFrame:
    """JL sign projection: appends ``projected_q`` (array<long>,
    exact micro-units — the gate observable) and ``projected``
    (array<double>, ``projected_q``/1e6 — the downstream input).

    ``projected[j] = Σ_i round(x_i·1e6)·s_ji`` with s ∈ {+1,−1} from
    :func:`rp_sign`.  No 1/√k scaling is applied: cosine and relative
    distances are scale-invariant, and callers that need calibrated
    norms divide by √out_dim once.

    Scale shape: a pure projection — the ±1 weights are literals in
    the plan (no broadcast, no side table), each output dim is one
    ``zip_with``+``aggregate`` over the quantized array, and the plan
    adds ZERO shuffles and ZERO driver round-trips.  At 100 TB this
    pipelines into whatever scan already reads the vectors.
    Exact-integer sums: |Σ| ≤ dim·max|x|·1e6 — overflow-free for any
    real embedding (dim ≤ 10⁴, |x| ≤ 10⁶).

    Precondition: all vectors have length ``dim`` (inferred from the
    first row when omitted); shorter vectors raise at zip_with,
    the ``similarity.lsh_buckets`` contract.
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col))).first()
        dim = first[0] if first is not None and first[0] is not None else 1
    qv = quantize_micro(F.col(vec_col))
    out = df.withColumn("_qv", qv)
    cols = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(rp_sign(seed, j, i)).cast("long")
                          for i in range(dim)])
        cols.append(F.aggregate(
            F.zip_with(F.col("_qv"), signs, lambda x, s: x * s),
            F.lit(0).cast("long"), lambda acc, x: acc + x))
    return (out.withColumn("projected_q", F.array(*cols))
            .withColumn("projected",
                        F.transform(F.col("projected_q"),
                                    lambda x: x.cast("double") / MICRO))
            .drop("_qv"))


def covariance_pairs(df: DataFrame, vec_col: str = "embedding",
                     dim: int | None = None,
                     engine: str = "expr") -> DataFrame:
    """EXACT covariance statistics for every dimension pair i ≤ j:
    one row (i, j, n, sxy, sxi, sxj, cov_num) where sums are over
    micro-unit integers and ``cov_num = n·Σxy − Σx·Σy`` is the
    covariance numerator (the cross-multiplied form: cov = cov_num /
    (n²·1e12), but the INTEGER numerator is what gates compare — the
    ``centroid_outliers`` no-division discipline).

    Scale shape: ONE scan, no matter the engine —

    - ``expr``: per row, the d(d+1)/2 upper-triangle products are
      built as an in-plan struct array and exploded into the grouped
      aggregate; hash-aggregate map-side combine collapses every task
      to ≤ d(d+1)/2 partial rows BEFORE the shuffle, so the shuffle
      and result are O(d²) regardless of corpus size (the
      ``sketch.cms_table`` shape).  Row amplification (×d²/2) runs
      inside one codegen stage and never materializes.
    - ``arrow``: per-partition numpy int64 Gram (Xᵀ·X on the
      quantized matrix — BLAS-speed) emitting the same ≤ d(d+1)/2
      partial rows per partition, summed by the identical grouped
      aggregate.  Exact while |partial| < 2⁶³: rows-per-partition ×
      (1e6·max|x|)² — at |x| ≤ 1 that is 9.2e6 rows per partition
      per unit product, and maxPartitionBytes bounds rows; the
      documented precondition is rows_per_partition·(max|x|·1e6)² <
      9.2e18.

    Global sums are decimal(38,0) (corpus-size-proof); the two
    engines are exactly equal (integer arithmetic, pytest-pinned).
    ``dim`` caps expression size on the expr engine: d = 64 → 2 080
    pair expressions (fine); for d ≥ 256 use ``arrow``.
    """
    if dim is None:
        first = df.select(F.size(F.col(vec_col))).first()
        dim = first[0] if first is not None and first[0] is not None else 1
    if engine == "arrow":
        return _covariance_pairs_arrow(df, vec_col, dim)
    if engine != "expr":
        raise ValueError(f"engine must be 'expr' or 'arrow', got {engine!r}")
    q = df.select(quantize_micro(F.col(vec_col)).alias("_qv"))
    # products as decimal(18,0)·decimal(18,0) → decimal(37,0): exact
    # for micro values up to 1e18, no long-multiply overflow cliff
    e = lambda k: F.element_at("_qv", k + 1).cast("decimal(18,0)")  # noqa: E731
    prods = F.array(*[
        F.struct(F.lit(i).alias("i"), F.lit(j).alias("j"),
                 (e(i) * e(j)).alias("xy"),
                 e(i).alias("xi"), e(j).alias("xj"))
        for i in range(dim) for j in range(i, dim)
    ])
    flat = q.select(F.explode(prods).alias("p")).select("p.*")
    g = flat.groupBy("i", "j").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xy").cast("decimal(38,0)").alias("sxy"),
        F.sum("xi").cast("decimal(38,0)").alias("sxi"),
        F.sum("xj").cast("decimal(38,0)").alias("sxj"),
    )
    return g.withColumn(
        "cov_num",
        (F.col("n") * F.col("sxy") - F.col("sxi") * F.col("sxj"))
        .cast("decimal(38,0)"))


def _covariance_pairs_arrow(df: DataFrame, vec_col: str,
                            dim: int) -> DataFrame:
    """Arrow engine: per-partition int64 Gram via numpy matmul, then
    the same exact grouped decimal sum over O(d²) partials."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    iu = [(i, j) for i in range(dim) for j in range(i, dim)]
    ii = np.array([p[0] for p in iu], dtype="int32")
    jj = np.array([p[1] for p in iu], dtype="int32")
    schema = T.StructType([
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("pn", T.LongType()),
        T.StructField("pxy", T.LongType()),
        T.StructField("px", T.LongType()),
    ])

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.round(
                np.array(list(pdf[vec_col]), dtype="float64") * MICRO
            ).astype("int64")
            G = X.T @ X                       # d×d int64, exact per bound
            S = X.sum(axis=0)                 # per-dim micro sums
            yield pd.DataFrame({
                "i": ii, "j": jj,
                "pn": np.full(len(iu), len(pdf), dtype="int64"),
                "pxy": G[ii, jj],
                "px": S[ii],                  # carried on i; j's sum is
            })                                # the (j, j) row's px

    parts = df.select(vec_col).mapInPandas(part, schema=schema)
    g = parts.groupBy("i", "j").agg(
        F.sum("pn").alias("n"),
        F.sum(F.col("pxy").cast("decimal(38,0)")).alias("sxy"),
        F.sum(F.col("px").cast("decimal(38,0)")).alias("sxi"),
    )
    diag = g.where(F.col("i") == F.col("j")).select(
        F.col("j").alias("_j"), F.col("sxi").alias("sxj"))
    return (g.join(F.broadcast(diag), g["j"] == diag["_j"])
            .drop("_j")
            .select("i", "j", "n", "sxy", "sxi", "sxj",
                    (F.col("n") * F.col("sxy")
                     - F.col("sxi") * F.col("sxj"))
                    .cast("decimal(38,0)").alias("cov_num")))


def pca_components(cov: DataFrame, dim: int, k: int):
    """Driver-side eigendecomposition of the exact covariance pairs
    (the O(d³)-on-d²-numbers step that is deliberately NOT
    distributed — d ≤ a few thousand means the matrix is KBs).

    Returns ``(components, eigenvalues)``: components is a k×dim list
    of unit-norm principal axes (descending eigenvalue order),
    eigenvalues the matching explained variances in ORIGINAL float
    units (cov_num / (n²·1e12)).  Deterministic sign convention: each
    component's largest-|entry| coordinate is positive (eigh's sign
    is otherwise arbitrary, and a flipped sign would flip every
    projected value downstream).
    """
    import numpy as np

    rows = cov.select("i", "j", "n", "cov_num").collect()
    if not rows:
        raise ValueError("covariance_pairs produced no rows (empty input)")
    n = int(rows[0]["n"])
    C = np.zeros((dim, dim), dtype="float64")
    for r in rows:
        v = float(int(r["cov_num"])) / (n * n * float(MICRO) ** 2)
        C[r["i"], r["j"]] = v
        C[r["j"], r["i"]] = v
    w, V = np.linalg.eigh(C)                  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        vec = V[:, idx]
        if vec[int(np.argmax(np.abs(vec)))] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
    return comps, [float(w[idx]) for idx in order]


def pca_project(df: DataFrame, components: list[list[float]],
                vec_col: str = "embedding",
                out_col: str = "pca") -> DataFrame:
    """Project vectors onto precomputed principal axes: appends
    ``out_col`` = array<double> of ⟨x, component_j⟩.

    Scale shape: like :func:`random_projection`, a pure map — the
    k×dim component matrix rides in the plan as literals (k·dim
    doubles — KBs), zero shuffles, zero side data; the projection
    fuses into the reading scan at 100 TB.  Mean-centering is left to
    the caller on purpose (⟨x−μ, c⟩ = ⟨x, c⟩ − ⟨μ, c⟩ — a per-query
    constant, not a per-row cost).
    """
    cols = []
    for comp in components:
        lits = F.array(*[F.lit(float(c)) for c in comp])
        cols.append(F.aggregate(
            F.zip_with(F.col(vec_col), lits,
                       lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, x: acc + x))
    return df.withColumn(out_col, F.array(*cols))
