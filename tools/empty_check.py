"""Empty-input robustness sweep: run EVERY registered query against a
zero-row copy of all ten tables (same schemas) and report queries that
crash rather than returning an empty/degenerate result.

Why this matters at 100 TB: partition pruning, a too-tight filter, or
an upstream outage routinely hands an operator ZERO rows — an engine
whose as-of join or TF-IDF throws on empty input fails the whole DAG
at 3am.  Correct behavior is an empty (or 1-row degenerate aggregate)
result with the same schema.

Usage: python tools/empty_check.py [name ...]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filters_spark.plans import queries as Q
from filters_spark.sources import get_spark
from filters_spark.sources.tables import TABLES, load_table

SRC = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def make_empty_dir(spark) -> str:
    out = tempfile.mkdtemp(prefix="fs_empty_sf_")
    for t in TABLES:
        # load_table, not bare spark.read.parquet: events.ts has
        # shipped as TIMESTAMP(NANOS) in some testdata regenerations
        # and only load_table carries the normalization
        df = load_table(spark, t, SRC)
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


def main() -> None:
    spark = get_spark("filters_spark_empty_check", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    empty_dir = make_empty_dir(spark)
    names = sys.argv[1:] or list(Q.REGISTRY)
    failures: list[tuple[str, str]] = []
    for name in names:
        try:
            n = Q.REGISTRY[name].fn(spark, empty_dir).count()
            print(f"OK    {name} ({n} rows)", flush=True)
        except Exception as ex:  # noqa: BLE001 — reporting, not handling
            first = str(ex).splitlines()[0][:160]
            failures.append((name, first))
            print(f"CRASH {name}: {first}", flush=True)
    print(f"\n{len(names) - len(failures)}/{len(names)} queries tolerate "
          f"empty input")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
