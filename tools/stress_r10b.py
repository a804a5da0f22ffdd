"""Round-10 (late) 10x-scale stress: the session's new operators
under skew/scale, with hard invariants.  Results -> SCALE.md section 31."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from filters_spark.sources import get_spark, load_table  # noqa: E402


def _inv(ok, what):
    if not ok:
        raise AssertionError(f"INVARIANT FAILED: {what}")


def hilbert_vs_zorder(spark, n=2_000_000):
    from filters_spark.functions import layout
    import tempfile
    df = (spark.range(n).select(
        (F.xxhash64("id") % 1_000_000).alias("x"),
        (F.xxhash64(F.lit(7), F.col("id")) % 1_000_000).alias("y"))
        .repartition(32))
    root = tempfile.mkdtemp(prefix="str_hil_")
    t0 = time.time(); layout.write_hilbert(df, root + "/h", ["x", "y"], bits=8, n_files=64); th = time.time() - t0
    t0 = time.time(); layout.write_zordered(df, root + "/z", ["x", "y"], bits=8, n_files=64); tz = time.time() - t0
    def span(path, col):
        d = spark.read.parquet(path).withColumn("_f", F.input_file_name())
        rows = d.groupBy("_f").agg((F.max(col) - F.min(col)).alias("s")).collect()
        return sum(r["s"] for r in rows) / len(rows)
    hx, hy = span(root + "/h", "x"), span(root + "/h", "y")
    zx, zy = span(root + "/z", "x"), span(root + "/z", "y")
    _inv(hx + hy <= (zx + zy) * 1.05, f"hilbert locality {hx+hy} vs {zx+zy}")
    print(f"hilbert 2M write {th:.1f}s (mean spans {hx:.0f}/{hy:.0f}) vs "
          f"zorder {tz:.1f}s ({zx:.0f}/{zy:.0f}) INVARIANT OK")


def bloom_at_scale(spark, n=2_000_000):
    import tempfile
    from filters_spark.sources import versioned as V
    t = tempfile.mkdtemp(prefix="str_blm_") + "/t"
    df = spark.range(n).select(F.col("id").alias("k"),
                               (F.col("id") % 9973).alias("v"))
    t0 = time.time()
    V.write_versioned(df.repartition(32, "v"), t, stats_cols=["k"],
                      bloom_cols=["k"], bloom_bits=1 << 20)
    tw = time.time() - t0
    m = V._read_manifest(t, 1)
    files = list(V.load_file_blooms(m))
    kept = []
    t0 = time.time()
    for key in range(0, n, n // 20):
        kf = V.bloom_prune_files(m, ("k", key, key), files)
        kept.append(len(kf))
        got = V.read_version(spark, t, where=("k", key, key)).where(
            F.col("k") == key).count()
        _inv(got == 1, f"bloom wrong-prune at {key}")
    tp = time.time() - t0
    _inv(max(kept) <= 4, f"bloom pruning weak: kept {kept}")
    print(f"bloom 2M/32-file build+commit {tw:.1f}s; 20 point reads "
          f"{tp:.1f}s, files/probe kept {min(kept)}-{max(kept)} of "
          f"{len(files)} INVARIANT OK")


def wordpiece_10x(spark):
    from filters_spark.functions import text
    d = load_table(spark, "documents", "/root/testdata/sf0.1").select("text")
    big = d
    for i in range(9):
        big = big.unionByName(d)
    big = big.repartition(32)
    n = big.count()
    t0 = time.time()
    m_d = text.wordpiece_train(big, n_merges=16, engine="driver")
    td = time.time() - t0
    t0 = time.time()
    m_s = text.wordpiece_train(big, n_merges=16, engine="spark")
    ts = time.time() - t0
    _inv(m_d == m_s, "wordpiece engines diverge at 10x")
    _inv(len(m_d) == 16, "wordpiece ran out of pairs at 10x")
    print(f"wordpiece {n} docs, 16 merges: driver {td:.1f}s "
          f"spark {ts:.1f}s, engines EQUAL INVARIANT OK")


def top_fraction_skew(spark, n=2_000_000):
    from filters_spark.functions import sampling
    df = (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("web"))
        .otherwise(F.lit("books")).alias("dom"),
        ((F.col("id") * 7919) % 100_003).alias("score"))
        .repartition(32, "doc_id"))
    t0 = time.time()
    kept = sampling.top_fraction_by_group(df, "score", "dom", 0.25)
    agg = {r["dom"]: r["n"] for r in
           kept.groupBy("dom").agg(F.count(F.lit(1)).alias("n")).collect()}
    tw = time.time() - t0
    _inv(agg.get("web", 0) <= int(0.25 * 0.9 * n),
         f"top-fraction over budget: {agg}")
    _inv(agg.get("web", 0) >= int(0.24 * 0.9 * n),
         f"top-fraction under-selected: {agg}")
    print(f"top_fraction 2M rows, 90% one domain: {tw:.1f}s, kept {agg} "
          f"INVARIANT OK")


def scd2_1m(spark, n=1_000_000):
    import tempfile
    from filters_spark.plans.joins import scd2_from_changes
    from filters_spark.sources import versioned as V
    t = tempfile.mkdtemp(prefix="str_scd_") + "/t"
    df = spark.range(n).select(F.col("id").alias("k"),
                               (F.col("id") * 3).alias("c"))
    V.write_versioned(df.repartitionByRange(16, "k"), t)
    V.update_where(spark, t, F.col("k") < n // 10,
                   {"c": F.col("c") + 1})
    V.delete_where(spark, t, F.col("k") < n // 20)
    t0 = time.time()
    h = scd2_from_changes(spark, t, "k", 1)
    agg = {(r["s"], r["e"]): r["n"] for r in
           h.groupBy(F.col("__start_version").alias("s"),
                     F.col("__end_version").alias("e"))
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    tw = time.time() - t0
    _inv(agg == {(1, 2): n // 10, (1, None): n - n // 10,
                 (2, 3): n // 20, (2, None): n // 10 - n // 20},
         f"scd2 intervals wrong: {agg}")
    print(f"scd2 1M keys, 3 commits: {tw:.1f}s, intervals OK INVARIANT OK")


def opq_10x(spark):
    from filters_spark.functions import projection
    e = load_table(spark, "embeddings", "/root/testdata/sf0.1")
    big = e
    for i in range(9):
        big = big.unionByName(e.select(
            (F.col("vec_id") + F.lit((i + 1) * 10_000_000)).alias("vec_id"),
            "embedding", *[c for c in e.columns
                           if c not in ("vec_id", "embedding")]))
    big = big.select("vec_id", "embedding").repartition(32)
    n = big.count()
    t0 = time.time()
    R = projection.opq_rotation(big, m=8, dim=64)
    tw = time.time() - t0
    import numpy as np
    M = np.array(R)
    _inv(np.abs(M @ M.T - np.eye(64)).max() < 1e-6, "rotation not orthogonal")
    print(f"opq_rotation {n} x 64-dim vectors (m=8): {tw:.1f}s, "
          f"orthogonal INVARIANT OK")


def main():
    spark = get_spark("stress_r10b", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    hilbert_vs_zorder(spark)
    bloom_at_scale(spark)
    top_fraction_skew(spark)
    scd2_1m(spark)
    opq_10x(spark)
    wordpiece_10x(spark)
    print("ALL INVARIANTS GREEN")


if __name__ == "__main__":
    main()
