"""Capstone integration test: the full training-data pipeline from
the README — validate → quality-filter → near-dup cluster → keep one
doc per component → profile → clean/dead-letter sinks — run end to
end on the real documents table, with count invariants checked at
every stage."""

import shutil
import tempfile

from pyspark.sql import functions as F

import filters_spark as fs
from filters_spark.functions import dedup, text
from filters_spark.sources import load_table, sinks

SF_DIR = "/root/testdata/sf0.001"


def test_full_pipeline(spark):
    docs = load_table(spark, "documents", SF_DIR)
    n_docs = docs.count()

    # 1. validate: lang must be a known code, text non-empty
    schema = fs.ValidationSchema({
        "lang": fs.Strip() | fs.MinLength(2) | fs.MaxLength(3),
        "text": fs.Required(),
    })
    res = schema.validate(docs)
    n_clean, n_rej = res.clean.count(), res.rejected.count()
    assert n_clean + n_rej == n_docs

    # 2. sinks: clean + dead-letter partitions must tile the input
    tmp = tempfile.mkdtemp(prefix="fse2e_")
    sinks.write_clean(res, f"{tmp}/clean")
    if n_rej:
        sinks.write_dead_letter(res, f"{tmp}/dead")
        assert spark.read.parquet(f"{tmp}/dead").count() == n_rej
    assert spark.read.parquet(f"{tmp}/clean").count() == n_clean

    # 3. quality filter + near-dup clustering (log-round CC)
    scored = res.clean.withColumn("q", text.quality_score(F.col("text")))
    kept_q = scored.where(F.col("q") >= 0.66)
    pairs = dedup.jaccard_pairs(
        kept_q.withColumn("toks", F.split("text", " ")),
        "doc_id", "toks", block_col="source", threshold=0.9,
    ).select("a_id", "b_id")
    comps = dedup.connected_components_star(pairs)
    survivors = (
        kept_q.join(comps, kept_q.doc_id == comps.node, "left")
        .where(comps.comp.isNull() | (comps.comp == kept_q.doc_id))
    )
    n_kept, n_in_pairs = survivors.count(), comps.count()
    n_components = comps.select("comp").distinct().count()
    # every clustered doc group keeps exactly its root; singletons kept
    assert n_kept == kept_q.count() - (n_in_pairs - n_components)

    # 4. profile the surviving corpus — fingerprints must be unique
    # per distinct text (md5 content hash)
    fps = survivors.select(
        text.fingerprint(F.col("text")).alias("fp")
    )
    assert fps.distinct().count() == survivors.select("text").distinct().count()
    shutil.rmtree(tmp, ignore_errors=True)


def test_raw_text_to_packed_shards(spark, tmp_path):
    """Raw-file ingestion → curation → epoch shuffle → packing, end
    to end: the full intake path a training-data run takes, starting
    from bare text files rather than the parquet testdata."""
    from filters_spark.sources.readers import read_text_docs
    from filters_spark.functions import dedup as dd
    from filters_spark.functions import packing, sampling, text

    p = tmp_path / "raw"
    p.mkdir()
    lines = []
    for i in range(50):
        lines.append(f"document {i} with unique content words w{i} x{i} y{i}")
    lines += lines[:10]              # exact duplicate lines
    lines += ["spam spam spam spam spam spam"] * 3   # repetition junk
    (p / "part1.txt").write_text("\n".join(lines[:40]) + "\n")
    (p / "part2.txt").write_text("\n".join(lines[40:]) + "\n")

    docs = read_text_docs(spark, str(p))
    # 1. repetition gate drops the spam lines
    rep = text.line_repetition_stats(
        docs.select("doc_id", "text"), "doc_id", "text", sep=" ")
    good = docs.join(
        rep.where(F.col("dup_line_frac") <= 0.5).select("doc_id"),
        "doc_id", "left_semi")
    # 2. exact dedup keep-first on content
    deduped = dd.exact_dedup(good, ["text"], ["doc_id"])
    # 3. deterministic epoch shuffle into 4 shards
    shuffled = sampling.global_shuffle(deduped, "doc_id", 4)
    # 4. pack into strict 32-token bins per shard (greedy FFD — the
    # streaming-fill variant lets docs span bin boundaries, so its
    # per-bin token sums legitimately overshoot by up to doc_len-1)
    lens = shuffled.select(
        "shard", "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    packed = packing.pack_greedy(lens, "doc_id", "n_tok", 32,
                                 partition_cols=["shard"])
    rows = packed.collect()
    texts = {r["text"] for r in deduped.select("text").collect()}
    assert len(texts) == 50            # dups collapsed, spam gone
    assert all("spam" not in t for t in texts)
    assert {r["shard"] for r in rows} <= {0, 1, 2, 3}
    # every doc is packed exactly once
    assert sorted(r["doc_id"] for r in rows) == \
        sorted(r["doc_id"] for r in deduped.collect())
    # bins respect the budget
    from collections import defaultdict
    bins = defaultdict(int)
    for r in rows:
        bins[(r["shard"], r["bin"])] += r["n_tok"]
    assert all(v <= 32 for v in bins.values())
