"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query logic lives in ``filters_spark.plans.queries``; this module
is the thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _configure(spark: SparkSession) -> SparkSession:
    """Pin the session discipline the engine assumes (UTC, AQE) on a
    driver-provided session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the full lineitem validation schema (Required/Int/Min/Max/
    Strip/Choice chains compiled to one projection) and aggregates the
    clean split.
    """
    from filters_spark.plans import queries as Q

    _configure(spark)
    return Q.REGISTRY["val_lineitem_clean_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from filters_spark.plans import queries as Q

    out = {}
    for name, fn in Q.spark_queries().items():
        def wrapped(spark, sf_dir, _fn=fn):
            return _fn(_configure(spark), sf_dir)
        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for
    non-SQL-expressible ops → driver records rows-only checks)."""
    from filters_spark.plans import queries as Q

    return Q.oracles()
