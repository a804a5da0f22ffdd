"""Scale stress for round 6: BPE training at production merge counts
(r5 VERDICT #3 — the per-merge-scan wall).  Measures the incremental
driver engine at >=256 merges on a 2M-doc corpus against the Spark
loop's per-merge cost, and pins engine equality on a merge prefix.
One JSON line per phase; numbers land in SCALE.md.

Run:
    python tools/scale_stress_r6.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from filters_spark.functions import text as T


def build_session(cpus: int) -> SparkSession:
    return (
        SparkSession.builder.appName("scale_stress_r6")
        .master(f"local[{cpus}, 3]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("STRESS_DRIVER_MEM", "48g"))
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.ui.explainMode", "simple")
        .getOrCreate()
    )


def emit(**kw) -> None:
    sys.stdout.write(json.dumps(kw) + "\n")
    sys.stdout.flush()


def synth_docs(spark: SparkSession, n_docs: int, vocab: int = 20_000):
    """30-word docs over a vocab of `vocab` distinct word forms —
    the same deterministic synth as scale_stress_r5.stress_bpe."""
    body = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(29)),
                         lambda j: F.concat(
                             F.lit("w"),
                             F.pmod(F.xxhash64(F.col("id") * 30 + j),
                                    F.lit(vocab)))))
    return spark.range(n_docs).select(body.alias("text"))


def stress_bpe_merges(spark: SparkSession, n_docs: int = 2_000_000,
                      n_merges: int = 256, prefix: int = 24) -> None:
    """256-merge training on 2M docs: driver engine end-to-end wall
    vs the Spark loop's measured per-merge cost extrapolated to the
    same merge count.  Equality pin: both engines produce the same
    first `prefix` merges on the same corpus."""
    docs = synth_docs(spark, n_docs)

    t0 = time.time()
    spark_prefix = T.bpe_train(docs, n_merges=prefix, engine="spark")
    spark_prefix_s = time.time() - t0
    assert len(spark_prefix) == prefix

    t0 = time.time()
    driver_all = T.bpe_train(docs, n_merges=n_merges, engine="driver")
    driver_s = time.time() - t0
    assert len(driver_all) == n_merges
    assert driver_all[:prefix] == spark_prefix, "engine divergence"

    # spark per-merge marginal cost: re-run at half the prefix so the
    # one-off corpus fold cancels out of the difference
    t0 = time.time()
    half = T.bpe_train(docs, n_merges=prefix // 2, engine="spark")
    spark_half_s = time.time() - t0
    assert half == spark_prefix[:prefix // 2]
    per_merge_s = max(spark_prefix_s - spark_half_s, 0.0) / (prefix / 2)
    extrapolated_s = spark_half_s + per_merge_s * (n_merges - prefix // 2)

    emit(phase="bpe_256_merges", docs=n_docs, merges=n_merges,
         driver_wall_s=round(driver_s, 1),
         spark_prefix=prefix, spark_prefix_s=round(spark_prefix_s, 1),
         spark_per_merge_s=round(per_merge_s, 2),
         spark_extrapolated_s=round(extrapolated_s, 1),
         speedup=round(extrapolated_s / max(driver_s, 0.1), 1),
         top_merge=f"{driver_all[0][1]}+{driver_all[0][2]}"
                   f"@{driver_all[0][3]}")


def stress_versioned(spark: SparkSession, n_rows: int = 20_000_000) -> None:
    """Snapshot-versioned table at 20M rows: commit, CDC merge (1%
    updates + 0.1% inserts), pruned time-travel read.  Invariants
    exact; the skipping read must beat the full scan."""
    import shutil
    import tempfile

    from filters_spark.sources import versioned as V

    base = (spark.range(n_rows)
            .select(F.col("id").alias("k"),
                    (F.col("id") % 997).alias("v"))
            .repartitionByRange(64, "k"))
    path = tempfile.mkdtemp(prefix="fs_stress_ver_") + "/t"
    t0 = time.time()
    V.write_versioned(base, path, stats_cols=["k"])
    write_s = time.time() - t0

    updates = (spark.range(n_rows)
               .where(F.col("id") % 100 == 0)
               .select(F.col("id").alias("k"), F.lit(-1).cast("bigint").alias("v"))
               .unionByName(
                   spark.range(n_rows, n_rows + n_rows // 1000)
                   .select(F.col("id").alias("k"), F.lit(-2).cast("bigint").alias("v"))))
    t0 = time.time()
    V.merge_versioned(spark, path, updates, "k")
    merge_s = time.time() - t0

    t0 = time.time()
    n_updated = (V.read_version(spark, path)
                 .where(F.col("v") == -1).count())
    read_s = time.time() - t0
    assert n_updated == n_rows // 100, n_updated
    n_v1 = V.read_version(spark, path, 1).where(F.col("v") == -1).count()
    assert n_v1 == 0, "time travel leaked merged rows into v1"

    t0 = time.time()
    lo, hi = 1_000_000, 1_099_999
    pruned = (V.read_version(spark, path, 1, where=("k", lo, hi))
              .where(F.col("k").between(lo, hi)).count())
    pruned_s = time.time() - t0
    t0 = time.time()
    full = (V.read_version(spark, path, 1)
            .where(F.col("k").between(lo, hi)).count())
    full_s = time.time() - t0
    assert pruned == full == hi - lo + 1
    emit(phase="versioned_20m", rows=n_rows, write_s=round(write_s, 1),
         merge_s=round(merge_s, 1), read_s=round(read_s, 1),
         pruned_read_s=round(pruned_s, 2), full_read_s=round(full_s, 2),
         updated=n_updated)
    shutil.rmtree(path, ignore_errors=True)


def stress_codecs(spark: SparkSession, n_docs: int = 500_000) -> None:
    """Compressed-codec decode throughput: n_docs real 4x4 PNGs and
    GIFs built row-side, strict-decoded through the mapInPandas
    plumbing; per-doc luma equality spot-checked via the feature
    histogram total."""
    import pandas as pd

    from filters_spark.functions import multimodal as mm
    from filters_spark.functions.multimodal import _encode_gif, _encode_png

    def make_fn(enc):
        # real annotation objects: `from __future__ import annotations`
        # stringifies inline hints, which pandas_udf cannot resolve here
        def _fn(s):
            out = []
            for v in s:
                v = int(v)
                rows = [[(v + r * 4 + c) % 256 for c in range(4)]
                        for r in range(4)]
                out.append(enc(rows))
            return pd.Series(out)
        _fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return _fn

    def make_jpeg_fn():
        import numpy as np

        from filters_spark.functions.multimodal import _encode_jpeg

        def _fn(s):
            out = []
            for v in s:
                codes = (int(v) + np.arange(16).reshape(4, 4) * 7) % 256
                rows = np.kron(codes, np.ones((8, 8), np.int64))
                out.append(_encode_jpeg(rows, mode="420", q=8,
                                        restart_interval=2))
            return pd.Series(out)
        _fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return _fn

    for fmt, enc in (("png", _encode_png), ("gif", _encode_gif),
                     ("jpeg", None)):
        udf = F.pandas_udf(make_jpeg_fn() if fmt == "jpeg"
                           else make_fn(enc), "binary")
        side = 32 if fmt == "jpeg" else 4
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"), udf(F.col("id")).alias("raw"))
        media = mm.attach_meta(docs, "raw", f"image/{fmt}")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(side))
            .withField("meta.height", F.lit(side)))
        t0 = time.time()
        decoded = mm.decode_images(media.drop("raw"), strict=True,
                                   codec="auto")
        n_px = decoded.select(
            F.sum(F.octet_length("pixels")).alias("b")).first()["b"]
        wall = time.time() - t0
        assert n_px == n_docs * side * side, n_px
        emit(phase=f"codec_{fmt}_decode", docs=n_docs,
             wall_s=round(wall, 1),
             docs_per_s=round(n_docs / max(wall, 0.01)))


PHASES = {
    "bpe": stress_bpe_merges,
    "versioned": stress_versioned,
    "codecs": stress_codecs,
}


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wanted = sys.argv[1:] or list(PHASES)
    for name in wanted:
        PHASES[name](spark)


if __name__ == "__main__":
    main()
