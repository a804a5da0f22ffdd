"""Round-11 scale stress: (a) merge-on-read vs copy-on-write for a
SCATTERED 0.1% delete on a clustered 2M-row table — the economics the
deletion-vector design claims; (b) SCD2 at LONG history — 100+
commits, scd2_from_changes full-rebuild wall/plan size vs
maintain_scd2 per-call cost (r10 VERDICT #8).  Results -> SCALE.md §32.

Run: nohup python tools/stress_r11.py > /tmp/stress_r11.log 2>&1 &
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from filters_spark.plans.joins import maintain_scd2, scd2_from_changes  # noqa: E402
from filters_spark.sources import get_spark  # noqa: E402
from filters_spark.sources import versioned as V  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def mor_vs_cow(spark, root):
    log("=== (a) scattered 0.1% delete: MOR vs COW, 2M rows, 32 files")
    df = spark.range(0, 2_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v"))
    tm, tc = os.path.join(root, "mor"), os.path.join(root, "cow")
    for t in (tm, tc):
        V.write_versioned(df.repartitionByRange(32, "k"), t,
                          stats_cols=["k"])
    # scattered: every 997th key -> hits EVERY file of a k-clustered
    # layout (the GDPR id-list shape)
    cond = "k % 997 = 0"
    t0 = time.time()
    rm = V.delete_where(spark, tm, cond, mode="mor", key="k")
    t_mor = time.time() - t0
    t0 = time.time()
    rc = V.delete_where(spark, tc, cond)
    t_cow = time.time() - t0
    log(f"mor: {t_mor:.2f}s {rm}")
    log(f"cow: {t_cow:.2f}s {rc}")
    assert rm["n_deleted"] == rc["n_deleted"]
    assert rm["files_rewritten"] == 0
    # bytes written by each commit (the real economics)
    def bytes_under(p, sub):
        tot = 0
        d = os.path.join(p, sub)
        if not os.path.isdir(d):
            return 0
        for r, _dd, ff in os.walk(d):
            tot += sum(os.path.getsize(os.path.join(r, f)) for f in ff)
        return tot
    mor_new = bytes_under(tm, "snap/v=2") + bytes_under(tm, "dv/v=2")
    cow_new = bytes_under(tc, "snap/v=2")
    log(f"bytes written: mor {mor_new:,} vs cow {cow_new:,} "
        f"({cow_new / max(mor_new, 1):.0f}x)")
    # read-back parity + point-read cost on the mor table
    a = V.read_version(spark, tm).agg(F.sum("k"), F.count("*")).collect()
    b = V.read_version(spark, tc).agg(F.sum("k"), F.count("*")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    t0 = time.time()
    n = V.read_version(spark, tm).count()
    log(f"mor full read: {time.time()-t0:.2f}s ({n:,} rows)")
    t0 = time.time()
    n2 = V.read_version(spark, tc).count()
    log(f"cow full read: {time.time()-t0:.2f}s ({n2:,} rows)")


def scd2_long_history(spark, root):
    log("=== (b) SCD2 at long history: 120 commits on 500k rows")
    t = os.path.join(root, "scd2src")
    dim, cur = os.path.join(root, "dim"), os.path.join(root, "cursor")
    df = spark.range(0, 500_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"))
    V.write_versioned(df.repartitionByRange(8, "k"), t)
    t0 = time.time()
    n_commits = 120
    for i in range(n_commits):
        V.update_where(
            spark, t, F.col("k").between(i * 100, i * 100 + 49),
            {"v": F.col("v") + 1}, store_changes_key="k")
    log(f"built {n_commits} update commits in {time.time()-t0:.1f}s")
    # incremental: catch up once, then measure ONE more commit's call
    t0 = time.time()
    maintain_scd2(spark, t, dim, "k", cur)
    log(f"maintain catch-up over {n_commits} commits: "
        f"{time.time()-t0:.1f}s")
    V.update_where(spark, t, F.col("k") == 123_456,
                   {"v": F.lit(0)}, store_changes_key="k")
    t0 = time.time()
    maintain_scd2(spark, t, dim, "k", cur)
    t_call = time.time() - t0
    log(f"maintain ONE-commit call: {t_call:.2f}s (bounded plan)")
    # full rebuild: wall + plan size
    t0 = time.time()
    hist = scd2_from_changes(spark, t, "k", 1)
    plan = hist._jdf.queryExecution().executedPlan().toString()
    t_plan = time.time() - t0
    t0 = time.time()
    n_hist = hist.count()
    t_rebuild = time.time() - t0
    log(f"scd2_from_changes rebuild: plan build {t_plan:.1f}s, "
        f"execute {t_rebuild:.1f}s, plan string {len(plan):,} chars, "
        f"{n_hist:,} interval rows")
    dimrows = V.read_version(spark, dim).drop("_sk")
    n_dim = dimrows.count()
    log(f"stored dimension rows: {n_dim:,}")
    assert n_dim == n_hist, (n_dim, n_hist)
    # value-level equivalence on a sample of touched keys
    cols = ["k", "v", "__start_version", "__end_version", "is_current"]
    a = sorted(map(tuple, hist.where(F.col("k") < 2000)
                   .select(*cols).collect()))
    b = sorted(map(tuple, dimrows.where(F.col("k") < 2000)
                   .select(*cols).collect()))
    assert a == b
    log("incremental == rebuild on sampled keys; counts equal")


def main():
    spark = get_spark("stress_r11")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stress_r11_")
    log(f"root: {root}")
    mor_vs_cow(spark, root)
    scd2_long_history(spark, root)
    log("DONE")


if __name__ == "__main__":
    main()
