"""Solo per-query bench: isolate queries from suite contention.

Usage: python tools/solo_bench.py NAME [NAME ...] [--reps N]

Runs each named registered query cold once then ``--reps`` steady
times (fresh DataFrame per run, same session — bench.py's
methodology) and prints min/median steady seconds.  Measurement tool
only: bench.py stays the graded surface.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filters_spark.plans import queries as Q
from filters_spark.sources import get_spark, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    reps = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--reps"):
            if "=" in a:
                reps = int(a.split("=", 1)[1])
            else:
                i += 1
                reps = int(argv[i])
        else:
            args.append(a)
        i += 1
    spark = get_spark("solo_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        load_table(spark, t, SF_DIR)
    for name in args:
        q = Q.REGISTRY[name]
        spark.sparkContext.setJobDescription(f"solo:{name}:cold")
        t0 = time.time()
        q.fn(spark, SF_DIR).collect()
        cold = time.time() - t0
        steadies = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"solo:{name}:steady{i}")
            t0 = time.time()
            q.fn(spark, SF_DIR).collect()
            steadies.append(time.time() - t0)
        print(f"{name}: cold {cold:.2f}s steady "
              f"min {min(steadies):.2f} med "
              f"{statistics.median(steadies):.2f} "
              f"({' '.join(f'{s:.2f}' for s in steadies)})",
              flush=True)


if __name__ == "__main__":
    main()
