import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from filters_spark.sources import get_spark

    s = get_spark("filters_spark_tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def run_chain(spark, chain, values, in_type="string", field="v"):
    """Reference-style test harness (``filters/test.py::
    BaseFilterTestCase`` analog): run a chain over a list of raw
    values, return [(cleaned, code)] in input order."""
    from pyspark.sql import functions as F
    from filters_spark.core import null_error

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"i int, v {in_type}"
    )
    c, e = chain.build(F.col("v"), null_error(), field)
    c = F.when(e.isNull(), c)  # end-of-chain nulling, as ValidationSchema does
    rows = (
        df.select(F.col("i"), c.alias("clean"), e.alias("err"))
        .orderBy("i")
        .collect()
    )
    return [(r["clean"], r["err"]["code"] if r["err"] else None) for r in rows]


def assert_passes(spark, chain, value, expected, in_type="string"):
    [(clean, code)] = run_chain(spark, chain, [value], in_type)
    assert code is None, f"expected pass, got error {code!r} for {value!r}"
    assert clean == expected, f"{value!r}: cleaned {clean!r} != {expected!r}"


def assert_errors(spark, chain, value, expected_code, in_type="string"):
    [(clean, code)] = run_chain(spark, chain, [value], in_type)
    assert code == expected_code, (
        f"{value!r}: expected code {expected_code!r}, got {code!r} (clean={clean!r})"
    )
    assert clean is None, f"errored value must clean to None, got {clean!r}"
