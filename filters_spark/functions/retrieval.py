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

    Plan shape: postings/lengths/avgdl are built lazily from the
    corpus; the query term set joins the postings BROADCAST, so the
    corpus-side work is a hash probe riding the postings scan.  The
    idf join is also broadcast (|distinct query terms| rows).  The
    only query-keyed shuffles are the per-(query, doc) score rollup
    and the rank cut — both bounded by matched candidates.
    """
    post = term_postings(docs, id_col, text_col, sep)
    dls = doc_lengths(docs, id_col, text_col, sep)
    # corpus stats: N and avgdl in one 1-row aggregate, cross-joined
    # back as a broadcast (never collected to the driver)
    stats = dls.agg(F.count(F.lit(1)).alias("_n"),
                    F.avg("dl").alias("_avgdl"))

    qterms = queries.select(F.col(query_id_col).alias("query_id"),
                            F.col(term_col).alias("term"))
    # document frequency ONLY for terms some query mentions: semi-join
    # the postings down first, then count distinct docs per term
    wanted = qterms.select("term").distinct()
    dfreq = (
        post.join(F.broadcast(wanted), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        F.log(F.lit(1.0)
              + (F.col("_n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        .alias("idf"),
    )

    cand = (
        post.join(F.broadcast(qterms), "term")
        .join(F.broadcast(idf), "term")
        .join(dls.crossJoin(F.broadcast(stats)), "doc_id")
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
