"""Round-11 late stress: WARC ingestion throughput, windowFunnel at
2M events, sketch-sidecar build/serve costs, chunking throughput.
Results -> SCALE.md §33.

Run: nohup python tools/stress_r11b.py > /tmp/stress_r11b.log 2>&1 &
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from filters_spark.functions.text import chunk_documents  # noqa: E402
from filters_spark.functions.timeseries import window_funnel  # noqa: E402
from filters_spark.sources import get_spark, load_table, warcio  # noqa: E402
from filters_spark.sources import versioned as V  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    spark = get_spark("stress_r11b")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stress_r11b_")
    log(f"root: {root}")

    # (a) WARC ingestion boundary at 50k docs (sf0.1 documents x10)
    d = load_table(spark, "documents", "/root/testdata/sf0.1")
    docs = d
    for i in range(1, 10):
        docs = docs.unionByName(d.select(
            (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
            *[c for c in d.columns if c != "doc_id"]))
    docs = docs.select(
        F.concat(F.lit("https://ex.com/"), F.col("doc_id")).alias("uri"),
        F.concat(F.lit("<html><body><p>"), F.col("text"),
                 F.lit("</p></body></html>")).alias("body"))
    n_docs = docs.count()
    wdir = os.path.join(root, "warc")
    t0 = time.time()
    n = warcio.write_warc(docs.repartition(32, "uri"), wdir)
    t_w = time.time() - t0
    t0 = time.time()
    back = warcio.read_warc(spark, wdir) \
        .where(F.col("warc_type") == "response")
    n_back = back.count()
    t_r = time.time() - t0
    assert n == n_back == n_docs
    log(f"WARC: write {n:,} records in {t_w:.1f}s "
        f"({n / t_w:,.0f} rec/s), read+parse in {t_r:.1f}s "
        f"({n / t_r:,.0f} rec/s) on 32 cores")

    # (b) windowFunnel at 2M events / 200k users
    ev = spark.range(0, 2_000_000).select(
        (F.col("id") % 200_000).alias("u"),
        F.timestamp_seconds(
            (F.col("id") * 7919 % 10_000_000)).alias("ts"),
        (F.xxhash64("id") % 5).alias("b"))
    steps = [F.col("b") == 0, F.col("b") == 1, F.col("b") == 2]
    t0 = time.time()
    lv = window_funnel(ev, "u", "ts", steps, window="30 day")
    dist = {r["funnel_level"]: r["n"] for r in
            lv.groupBy("funnel_level")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    t_f = time.time() - t0
    log(f"windowFunnel 2M events/200k users: {t_f:.1f}s, "
        f"level distribution {dist}")

    # (c) sketch sidecars at 2M rows / 32 files: build + serve
    t = os.path.join(root, "tbl")
    df = spark.range(1, 2_000_001).select(
        F.col("id").alias("k"),
        (F.col("id") * F.col("id") % 999983 + 1).alias("v"))
    t0 = time.time()
    V.write_versioned(df.repartitionByRange(32, "k"), t,
                      stats_cols=["k"])
    t_plain = time.time() - t0
    t2 = os.path.join(root, "tbl2")
    t0 = time.time()
    V.write_versioned(df.repartitionByRange(32, "k"), t2,
                      stats_cols=["k"], ndv_cols=["v"],
                      hdr_cols=["v"])
    t_armed = time.time() - t0
    t0 = time.time()
    [r] = V.stats_aggregate(spark, t2, [
        ("count", None, "n"), ("min", "k", "kmin"),
        ("approx_ndv", "v", "ndv"),
        ("approx_quantile", ("v", 1, 2), "p50"),
        ("approx_quantile", ("v", 99, 100), "p99")]).collect()
    t_meta = time.time() - t0
    log(f"sidecars: plain commit {t_plain:.1f}s, +ndv+hdr "
        f"{t_armed:.1f}s (delta = the pay-once indexing); "
        f"metadata count/min/ndv/p50/p99 in {t_meta:.2f}s "
        f"(zero data tasks): n={r['n']:,} ndv={r['ndv']:,.0f} "
        f"p50={r['p50']:,} p99={r['p99']:,}")
    t0 = time.time()
    exact = df.agg(F.countDistinct("v").alias("d"),
                   F.expr("percentile(v, 0.5)").alias("p")).collect()
    t_scan = time.time() - t0
    log(f"scan-path exact distinct+percentile: {t_scan:.2f}s "
        f"(exact ndv {exact[0]['d']:,}) — the read-side trade")

    # (d) chunking throughput at 50k docs
    d10 = load_table(spark, "documents", "/root/testdata/sf0.1")
    big = d10
    for i in range(1, 10):
        big = big.unionByName(d10.select(
            (F.col("doc_id") + 10_000_000 * i).alias("doc_id"),
            *[c for c in d10.columns if c != "doc_id"]))
    t0 = time.time()
    nch = chunk_documents(big, chunk_tokens=64, overlap=16).count()
    t_c = time.time() - t0
    log(f"chunking: 50k docs -> {nch:,} chunks in {t_c:.1f}s "
        "(pure expressions riding the scan)")
    log("DONE")


if __name__ == "__main__":
    main()
