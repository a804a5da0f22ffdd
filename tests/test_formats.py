"""Source/sink format coverage (SURVEY.md §2.9 scans row:
parquet/json/csv): validated data must round-trip losslessly through
every batch format the engine claims."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import filters_spark as fs
from filters_spark.sources import load_table


@pytest.fixture(scope="module")
def clean_df(spark):
    li = load_table(spark, "lineitem", "/root/testdata/sf0.001").limit(200)
    res = fs.ValidationSchema({
        "l_orderkey": fs.Required() | fs.Int(),
        "l_returnflag": fs.Choice(["A", "N", "R"]),
    }).validate(li)
    return res.clean.select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip(spark, clean_df, fmt):
    tmp = tempfile.mkdtemp(prefix=f"fs_fmt_{fmt}_")
    try:
        w = clean_df.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            w = w.option("header", True)
        w.save(tmp + "/out")

        r = spark.read.format(fmt)
        if fmt == "csv":
            r = r.option("header", True).schema(clean_df.schema)
        elif fmt == "json":
            r = r.schema(clean_df.schema)
        back = r.load(tmp + "/out")

        assert back.count() == clean_df.count()
        # value-level equality, order-insensitive
        a = clean_df.orderBy("l_orderkey", "l_quantity", "l_shipdate").collect()
        b = back.orderBy("l_orderkey", "l_quantity", "l_shipdate").collect()
        assert a == b
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
