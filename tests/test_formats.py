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


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
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


# ---------------------------------------------------------------------------
# Malformed-record readers (sources.readers): the reference's handler
# strategies as parse modes.
# ---------------------------------------------------------------------------

import os

from pyspark.sql import types as T

from filters_spark.sources import readers

_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("qty", T.DoubleType()),
    T.StructField("flag", T.StringType()),
])

_CSV_LINES = [
    "id,qty,flag",
    "1,2.5,A",
    "2,not_a_number,N",   # malformed qty
    "3,7.25,R",
    "4,1.0",              # too few columns
]

_JSON_LINES = [
    '{"id": 1, "qty": 2.5, "flag": "A"}',
    '{"id": 2, "qty": "oops", "flag": "N"}',   # wrong type
    'this is not json at all',                 # unparseable
    '{"id": 4, "qty": 9.0, "flag": "R"}',
]


@pytest.fixture(scope="module")
def dirty_files():
    tmp = tempfile.mkdtemp(prefix="fs_dirty_")
    os.makedirs(tmp + "/csv")
    os.makedirs(tmp + "/json")
    with open(tmp + "/csv/part.csv", "w") as f:
        f.write("\n".join(_CSV_LINES) + "\n")
    with open(tmp + "/json/part.json", "w") as f:
        f.write("\n".join(_JSON_LINES) + "\n")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


class TestPermissiveSplit:
    def test_csv_split(self, spark, dirty_files):
        df = readers.read_csv(spark, dirty_files + "/csv", _SCHEMA).cache()
        clean, bad = readers.split_corrupt(df)
        assert readers.CORRUPT_COL not in clean.columns
        assert {r.id for r in clean.collect()} == {1, 3}
        # dead letters carry the raw line for replay
        raw = {r[readers.CORRUPT_COL] for r in bad.collect()}
        assert any("not_a_number" in s for s in raw)
        df.unpersist()

    def test_json_split(self, spark, dirty_files):
        df = readers.read_json(spark, dirty_files + "/json", _SCHEMA).cache()
        clean, bad = readers.split_corrupt(df)
        assert {r.id for r in clean.collect()} == {1, 4}
        assert bad.count() == 2
        df.unpersist()

    def test_csv_partial_row_is_clean_with_nulls(self, spark, dirty_files):
        # CSV mode PERMISSIVE fills missing trailing columns with null
        # AND records the raw line; the short row id=4 parses id/qty.
        df = readers.read_csv(spark, dirty_files + "/csv", _SCHEMA).cache()
        row4 = [r for r in df.collect() if r.id == 4]
        assert len(row4) == 1
        assert row4[0].flag is None
        df.unpersist()


class TestHandlerModes:
    def test_dropmalformed_csv(self, spark, dirty_files):
        # LogHandler analog: malformed rows silently dropped.
        df = readers.read_csv(spark, dirty_files + "/csv", _SCHEMA,
                              mode="DROPMALFORMED")
        ids = {r.id for r in df.collect()}
        assert 2 not in ids and 1 in ids and 3 in ids

    def test_failfast_json(self, spark, dirty_files):
        # ExceptionHandler analog: first malformed record aborts.
        df = readers.read_json(spark, dirty_files + "/json", _SCHEMA,
                               mode="FAILFAST")
        with pytest.raises(Exception):
            df.collect()

    def test_bad_mode_rejected(self, spark, dirty_files):
        with pytest.raises(ValueError):
            readers.read_csv(spark, dirty_files + "/csv", _SCHEMA, mode="nope")
