"""Lexical retrieval over the corpus: inverted term statistics and
BM25 top-k scoring.

The reference library (eflglobal/filters) has no retrieval surface;
this is part of the large-scale-pipeline extension layer (SURVEY.md
§2.9 "beyond-reference ops") — the lexical complement to the
embedding ANN path in :mod:`.similarity` (dense + sparse retrieval
are the two halves of a training-data / RAG search stack, and the
chunking step in :func:`.text.chunk_documents` feeds both).

Scale design:

* Term statistics are ONE exploded aggregation over the corpus:
  explode tokens → per-(doc, term) tf (map-side partial agg collapses
  duplicates before the shuffle) → per-term document frequency.  At
  100 TB these postings are the materialize-once artifact; every
  query set afterwards touches only the terms it mentions.
* Query scoring joins the (small, by contract) query term set onto
  the postings with a BROADCAST join, so candidate generation is a
  map-side hash probe over the postings scan — no corpus-wide
  shuffle.  Only the per-(query, doc) score rollup and the top-k
  rank cut shuffle, both keyed by query id and bounded by candidate
  count, not corpus size.
* Scores use the Lucene/Okapi BM25 formulation with the +1 idf shift
  (``ln(1 + (N - df + .5)/(df + .5))``) so idf is never negative.
  Everything is a codegen-able column expression — no Python in the
  hot path.  Emitted scores are ROUNDED (4 dp) and ranked with a doc
  id tie-break so top-k sets are engine-independent (ln() may differ
  in the last ulp across libm implementations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "term_postings",
    "doc_lengths",
    "bm25_topk",
    "materialize_postings",
    "append_postings",
    "compact_postings",
    "bm25_topk_from_postings",
    "rrf_fuse",
]


def term_postings(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", sep: str = " ") -> DataFrame:
    """Inverted postings: one row per (doc, term) with the term
    frequency.  One explode + one grouped count; the groupBy's
    map-side combine collapses repeated terms inside each doc before
    anything shuffles."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(F.split(F.col(text_col), sep)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", sep: str = " ") -> DataFrame:
    """(doc_id, dl) token counts — a scan projection, no shuffle."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), sep)).alias("dl"),
    )


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id", term_col: str = "term",
              sep: str = " ") -> DataFrame:
    """BM25 top-k documents per query.

    ``queries`` is (query_id, term) — one row per query term,
    duplicates allowed (they simply add their contributions, the
    standard bag-of-words query semantics).  Returns
    (query_id, doc_id, score, rank) with score rounded to 4 dp and
    rank ties broken by doc id.

    Plan shape — FILTER BEFORE ROLLUP, the scale-critical order: the
    exploded token stream is semi-joined against the BROADCAST query
    term set first (a map-side hash probe riding the scan), so the
    (doc, term) tf rollup shuffles only matched tokens — |matches|,
    not the corpus's entire token stream.  Measured at 2M docs /
    ~120M tokens: 274 s with the full-postings rollup, 52 s with
    filter-first + the postings persist — the unfiltered shuffle
    alone was 4× the whole filtered query.
    Document lengths and N/avgdl come from a separate narrow scan
    projection (one 1-row aggregate, broadcast back — no driver
    collect).  The idf join is broadcast too; the only query-keyed
    shuffles are the per-(query, doc) score rollup and the rank cut.
    For a REUSABLE index over many future query sets, materialize
    :func:`term_postings` once instead and probe it.

    The query term set rides the bounded ``scoped_persist`` LRU,
    keyed on the PLAN (semanticHash) — callers must not overwrite
    the files behind a query frame in place between calls with an
    identical plan, or must ``release_caches()`` first (see
    ``_cache``).
    """
    toks = F.split(F.col(text_col), sep)
    # dl rides the exploded rows (first() per group recovers it), so
    # no second corpus-wide (doc_id) shuffle join for lengths — the
    # only corpus-shaped shuffle left is the matched-token rollup
    ex = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.size(toks).alias("dl"),
                    F.explode(toks).alias("term"))
        .where(F.col("term") != "")
    )
    qterms = queries.select(F.col(query_id_col).alias("query_id"),
                            F.col(term_col).alias("term"))
    # scoped persist (the same discipline as `post` below): the query
    # term set feeds TWO broadcast branches (the semi-join term set
    # and the scoring join) and Catalyst does not share subtrees
    # across join branches, so without this the set's lineage (a
    # corpus scan + explode + distinct in the flagship gates) runs
    # once per branch.  Measured alternative — collecting the rows
    # and re-parallelizing a local relation — was SLOWER at bench
    # scale (the Python pickle round-trip beats the saved JVM scan).
    from ._cache import scoped_persist
    qterms = scoped_persist(qterms, "bm25_qterms")
    wanted = qterms.select("term").distinct()
    post = (
        ex.join(F.broadcast(wanted), "term", "left_semi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    # scoped persist: feeds BOTH the df/idf branch (a broadcast
    # subtree, which executes as its own job) and the candidate
    # scoring branch — Catalyst does not share subplans across
    # joins, so without this the whole corpus tokenization+probe
    # runs twice (measured 2× the full query cost at 2M docs).
    # The frame is |matched postings| — small by construction; the
    # bounded LRU (_cache.scoped_persist) keeps repeat calls fast
    # and caps accumulation across distinct inputs.  A service
    # issuing many query sets should still materialize postings to
    # a table and probe that (bm25_topk_from_postings).
    post = scoped_persist(post, "bm25_postings")
    # corpus stats: N and avgdl in one 1-row aggregate over a narrow
    # scan projection, cross-joined back as a broadcast (never
    # collected to the driver)
    stats = doc_lengths(docs, id_col, text_col, sep).agg(
        F.count(F.lit(1)).alias("_n"), F.avg("dl").alias("_avgdl"))

    # document frequency per query term: the filtered postings are
    # already one row per (doc, term)
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(F.lit(1.0)
              + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        .alias("idf"),
    )

    cand = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
    )
    contrib = (
        F.col("idf") * F.col("tf") * (k1 + 1.0)
        / (F.col("tf")
           + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl")))
    )
    scored = (
        cand.select("query_id", "doc_id", contrib.alias("_c"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_c"), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def materialize_postings(docs: DataFrame, path: str,
                         id_col: str = "doc_id", text_col: str = "text",
                         sep: str = " ", term_partitions: int = 32) -> None:
    """Materialize the BM25 index artifacts once so that REPEATED
    query sets probe a table instead of re-tokenizing the corpus (and
    instead of :func:`bm25_topk`'s per-call persisted frame — the
    leaked-cache contract ADVICE r3 flagged).

    Writes two parquet datasets under ``path``:

    * ``postings/`` — (doc_id, term, tf, dl), RANGE-partitioned and
      sorted by term, so a probe's term predicate prunes whole files
      and row groups via parquet min/max stats (the 100 TB shape: a
      query touching 40 terms reads ~40 terms' worth of postings, not
      the corpus).
    * ``stats/`` — one row (_n, _avgdl, _sumdl), read back as a
      broadcast.  ``_sumdl`` is the EXACT bigint token total — the
      additive component that lets :func:`append_postings` update
      stats in O(delta) with bit-identical ``_avgdl`` to a full
      rebuild (avg = exact-int sum / count, one IEEE division).
    """
    toks = F.split(F.col(text_col), sep)
    post = (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.size(toks).alias("dl"),
                    F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    (post.repartitionByRange(term_partitions, "term")
     .sortWithinPartitions("term", "doc_id")
     .write.mode("overwrite").parquet(f"{path}/postings"))
    (doc_lengths(docs, id_col, text_col, sep)
     .agg(F.count(F.lit(1)).alias("_n"),
          F.sum("dl").cast("bigint").alias("_sumdl"))
     .select("_n",
             F.try_divide(F.col("_sumdl").cast("double"), F.col("_n"))
             .alias("_avgdl"),
             "_sumdl")
     .write.mode("overwrite").parquet(f"{path}/stats"))


def append_postings(spark, path: str, new_docs: DataFrame,
                    id_col: str = "doc_id", text_col: str = "text",
                    sep: str = " ", term_partitions: int = 8) -> None:
    """Incremental maintenance for a :func:`materialize_postings`
    index: a daily append costs O(delta), not O(corpus).

    * delta postings are computed from ``new_docs`` only and written
      with ``mode('append')`` — merge-on-read: the delta files carry
      their own term-sorted range layout, so probe-side pruning still
      skips non-matching files via parquet min/max stats (an LSM-like
      layout; re-run :func:`materialize_postings` periodically to
      compact if the delta-file count grows large);
    * stats merge EXACTLY: ``_n`` and ``_sumdl`` add as integers and
      ``_avgdl`` is re-derived by the same single IEEE division a
      full rebuild performs, so probe scores are bit-identical to a
      rebuilt index (no float accumulation drift — the midpoint
      rule).

    Document frequencies need no stored update at all: the probe
    computes df from postings rows at query time, and the base+delta
    rows ARE the rebuilt rows.  Precondition: ``new_docs`` ids are
    disjoint from the indexed corpus (same contract as a rebuild
    over a deduplicated corpus — append does not upsert).
    """
    stats_old = spark.read.parquet(f"{path}/stats").head()
    if "_sumdl" not in stats_old.__fields__:
        raise ValueError(
            "append_postings: index lacks the _sumdl stats component "
            "(built by an older materialize_postings) — rebuild once "
            "with the current version before appending")
    toks = F.split(F.col(text_col), sep)
    delta = (
        new_docs.select(F.col(id_col).alias("doc_id"),
                        F.size(toks).alias("dl"),
                        F.explode(toks).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    (delta.repartitionByRange(term_partitions, "term")
     .sortWithinPartitions("term", "doc_id")
     .write.mode("append").parquet(f"{path}/postings"))
    d = (doc_lengths(new_docs, id_col, text_col, sep)
         .agg(F.count(F.lit(1)).alias("_dn"),
              F.coalesce(F.sum("dl"), F.lit(0)).cast("bigint")
              .alias("_dsum")).head())
    n_new = int(stats_old["_n"]) + int(d["_dn"])
    sum_new = int(stats_old["_sumdl"] or 0) + int(d["_dsum"])
    (spark.createDataFrame([(n_new, sum_new)], "_n bigint, _sumdl bigint")
     .select("_n",
             F.try_divide(F.col("_sumdl").cast("double"), F.col("_n"))
             .alias("_avgdl"),
             "_sumdl")
     .write.mode("overwrite").parquet(f"{path}/stats"))


def bm25_topk_from_postings(spark, path: str, queries: DataFrame,
                            k: int = 10, k1: float = 1.2, b: float = 0.75,
                            query_id_col: str = "query_id",
                            term_col: str = "term") -> DataFrame:
    """BM25 top-k against a :func:`materialize_postings` index.

    The (by contract small) query term set is collected and pushed
    into the postings scan as an ``IN`` predicate — with the
    range-partitioned, term-sorted layout that prunes files and row
    groups, so the scan cost is proportional to the matched postings.
    The query term set rides the bounded ``scoped_persist`` LRU (one
    lineage evaluation feeds both the IN-list collect and the scoring
    broadcast — the ``ivf_topk_from_index`` discipline); the matched
    postings slice itself is never persisted: the idf branch is a
    second pruned read of a small slice, not a leaked cache entry.
    Staleness contract: the cached query set is keyed on the PLAN
    (semanticHash) — callers must not overwrite the files behind a
    query frame in place between calls with an identical plan, or
    must ``release_caches()`` first (see ``_cache``)."""
    qterms = queries.select(F.col(query_id_col).alias("query_id"),
                            F.col(term_col).alias("term"))
    # scoped persist: the query term set is evaluated twice — once
    # for the IN-list collect, once under the scoring broadcast — and
    # its lineage is a corpus scan + explode + distinct in the
    # flagship gates.  The sorted IN list keeps the plan text (and
    # therefore steady-state plan reuse) deterministic.
    from ._cache import scoped_persist
    qterms = scoped_persist(qterms, "bm25_qterms")
    terms = sorted({r.term
                    for r in qterms.select("term").distinct().collect()})
    post = (spark.read.parquet(f"{path}/postings")
            .where(F.col("term").isin(terms)))
    stats = spark.read.parquet(f"{path}/stats")

    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(F.lit(1.0)
              + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        .alias("idf"),
    )
    cand = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .crossJoin(F.broadcast(stats))
    )
    contrib = (
        F.col("idf") * F.col("tf") * (k1 + 1.0)
        / (F.col("tf")
           + k1 * (1.0 - b + b * F.col("dl") / F.col("_avgdl")))
    )
    scored = (
        cand.select("query_id", "doc_id", contrib.alias("_c"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_c"), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def rrf_fuse(rankings: list[DataFrame], k: int = 60, topk: int = 10,
             query_col: str = "query_id", id_col: str = "doc_id",
             rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009,
    SIGIR — ``RRF(d) = Σ_systems 1/(k + rank_s(d))``): merge the
    top-k lists of heterogeneous retrievers (the BM25 sparse arm and
    the embedding ANN dense arm are the canonical pair) into one
    ranking without score calibration — only RANKS cross systems, so
    BM25's unbounded scores and cosine's [-1, 1] never need to be
    put on a common scale.

    Inputs are (query, doc, rank) frames; absent docs simply
    contribute nothing (the standard RRF convention).  Output is
    (query_id, doc_id, rrf_score, rank) with the fused score rounded
    to 6 dp and doc-id tie-breaks — deterministic across engines
    (each addend is one IEEE division; with the usual 2-3 systems
    the sum is order-insensitive).

    Scale: a unionAll of already-cut top-k lists — |queries|·k·
    |systems| rows total, shuffled once on (query, doc) for the sum
    and once for the rank window.  The corpus is never touched."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    u = None
    for r in rankings:
        part = r.select(F.col(query_col).alias("query_id"),
                        F.col(id_col).alias("doc_id"),
                        F.col(rank_col).alias("rank"))
        u = part if u is None else u.unionByName(part)
    fused = (
        u.groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.lit(1.0) / (F.lit(k) + F.col("rank"))), 6)
             .alias("rrf_score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id"))
    return (fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk))


def compact_postings(spark, path: str, term_partitions: int = 32) -> None:
    """Compact an appended :func:`materialize_postings` index: read
    the accumulated base + delta files back and rewrite ONE
    term-sorted range layout (the LSM compaction step — appends keep
    probes correct via merge-on-read, but each append adds files
    whose term ranges overlap the base's, and probe-side pruning
    degrades as the file count grows).  O(index), not O(corpus): the
    rewrite re-sorts postings rows, never re-tokenizes documents.
    Stats are untouched (append already maintains them exactly).

    The rewrite stages into ``postings.compact`` and swaps via one
    atomic symlink flip (:func:`.._swap.atomic_swap_dir`), so a
    concurrent reader sees either the old file set or the new one —
    never a half-written or momentarily-missing directory."""
    import shutil

    from ._swap import atomic_swap_dir

    post = spark.read.parquet(f"{path}/postings")
    tmp = f"{path}/postings.compact"
    shutil.rmtree(tmp, ignore_errors=True)
    (post.repartitionByRange(term_partitions, "term")
     .sortWithinPartitions("term", "doc_id")
     .write.mode("overwrite").parquet(tmp))
    atomic_swap_dir(f"{path}/postings", tmp)
