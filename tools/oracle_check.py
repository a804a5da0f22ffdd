"""Local replica of the driver's correctness gate: run every
registered query on Spark AND its DuckDB oracle at sf0.01, compare
row count + schema (column names) + order-insensitive value hash.

Driver-faithful since round 4 (VERDICT r3 task 2): both sides are
converted to **pandas** (``DataFrame.toPandas()`` / duckdb
``rel.df()``) exactly like the official harness, because that
conversion is where type divergence appears — DuckDB's HUGEINT (the
result type of ``sum(INTEGER)``) becomes float64 in pandas while
Spark's LongType stays int64, so ``6.0`` vs ``6`` hash-mismatches
officially even though ``fetchall()`` (the pre-round-4 path here)
returned a masking Python ``int``.  Cells are compared at exact repr
precision — no ``%.9g`` collapsing, Decimals keep their scale, and a
BinaryType output column is reported as a gate hazard (the driver's
pandas ``sort_values`` crashes on ``bytearray``: CORRECTNESS_r03
``val_bytestring``).

Usage: python tools/oracle_check.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from filters_spark.plans import queries as Q
from filters_spark.sources import get_spark

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def norm_cell(v):
    """Exact, dtype-sensitive canonical string for one pandas cell.

    int64 6 -> '6'; float64 6.0 -> '6.0' (full repr — a last-ulp
    double difference IS a mismatch, as it is officially); Decimal
    keeps its textual scale ('1.25' != '1.2500000000').  bytes raise
    GateHazard so binary outputs are caught before the driver's
    canonicalizer crashes on them.
    """
    import datetime as dt
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, pd.Timestamp):
        # DuckDB DATE arrives as midnight datetime64 while Spark
        # DateType arrives as datetime.date (Arrow-less toPandas);
        # officially-green r3 rows with date outputs (val_date_tz,
        # rel_q3_shipping) prove the driver equates the two — mirror
        # that by collapsing tz-less midnight timestamps to dates.
        if v.tz is None and v == v.normalize():
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.datetime):
        if v.tzinfo is None and (v.hour, v.minute, v.second,
                                 v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        raise GateHazard(
            "BinaryType output column — the driver's pandas "
            "canonicalizer crashes on bytearray; emit hex() instead"
        )
    if isinstance(v, np.ndarray):
        return "[" + ",".join(norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(
            f"{k}:{norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


class GateHazard(Exception):
    """Output shape that the official harness cannot canonicalize."""


def canon_lines(pdf) -> list[str]:
    """Order-insensitive canonical lines: columns sorted by name,
    rows as exact-repr cell joins, lines sorted."""
    cols = sorted(pdf.columns)
    lines = []
    for row in pdf[cols].itertuples(index=False, name=None):
        lines.append("|".join(norm_cell(v) for v in row))
    lines.sort()
    return lines


def table_hash(lines: list[str]) -> str:
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def dtype_report(spdf, dpdf) -> list[str]:
    """Per-column pandas-dtype divergences — the exact hazard class
    that produced the round-3 official reds.  Only KIND mismatches
    are flagged (int-vs-float, object-vs-float…): int32 vs int64
    stringifies identically ('6') so the official hash is width
    blind (green r3 rows prove it), but float64 6.0 → '6.0' vs int64
    6 → '6' is an official red."""
    out = []
    for c in sorted(set(spdf.columns) & set(dpdf.columns)):
        sk, dk = spdf[c].dtype.kind, dpdf[c].dtype.kind
        if {sk, dk} <= {"i", "u"}:
            continue
        # date-vs-datetime64 pairs are officially tolerated (green r3
        # date rows) — the value canon collapses them; let it decide
        if {sk, dk} == {"O", "M"}:
            continue
        if sk != dk:
            out.append(f"dtype[{c}]: spark={spdf[c].dtype}({sk}) "
                       f"duckdb={dpdf[c].dtype}({dk})")
    return out


def main(only: list[str]) -> int:
    if only and only[0] == "--window":
        # exactly the rows the official driver gate will check
        only = list(Q.DRIVER_WINDOW) + only[1:]
    # ORACLE_SHUFFLE=1 (or 64) sweeps shuffle-partition extremes: a
    # query whose RESULT depends on shuffle fan-out is a latent
    # partition-order bug (the local[5]/AQE-off gates' third axis)
    spark = get_spark("oracle_check",
                      shuffle_partitions=int(
                          os.environ.get("ORACLE_SHUFFLE", "8")))
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failures = 0
    for name, q in Q.REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.fn(spark, SF_DIR)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"ok?  {name}: rows-only ({len(spdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            dpdf = con.sql(q.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(spdf.columns) != sorted(dpdf.columns):
            problems.append(
                f"schema {sorted(spdf.columns)} != {sorted(dpdf.columns)}")
        if len(spdf) != len(dpdf):
            problems.append(f"rowcount {len(spdf)} != {len(dpdf)}")
        if not problems:
            problems.extend(dtype_report(spdf, dpdf))
        if not problems:
            try:
                so = canon_lines(spdf)
            except GateHazard as e:
                problems.append(f"spark output hazard: {e}")
                so = None
            try:
                do = canon_lines(dpdf)
            except GateHazard as e:
                problems.append(f"oracle output hazard: {e}")
                do = None
            if so is not None and do is not None and \
                    table_hash(so) != table_hash(do):
                problems.append("value hash mismatch")
                for a, b in zip(so, do):
                    if a != b:
                        problems.append(f"  spark  : {a}\n   duckdb : {b}")
                        break
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print("   " + p)
        else:
            print(f"PASS {name} ({len(spdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
