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
