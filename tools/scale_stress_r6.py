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


PHASES = {
    "bpe": stress_bpe_merges,
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
