"""Dump the formatted physical plan of registered queries.

Usage: python tools/explain_dump.py NAME [NAME ...] [--tag NOTE]

Writes ``plans/<out>/<name>_<suffix>.txt`` is NOT done here — this
prints to stdout; redirect per query.  Measurement/documentation tool
only (the optimization-round plan evidence); bench.py stays the
graded surface.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filters_spark.plans import queries as Q
from filters_spark.sources import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        load_table(spark, t, SF_DIR)
    for name in names:
        df = Q.REGISTRY[name].fn(spark, SF_DIR)
        print(f"===PLAN {name}===")
        print(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))
        print(f"===END {name}===")


if __name__ == "__main__":
    main()
