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


class TestReadEvolving:
    """Schema-evolution reads (sources.read_evolving): schema-on-read
    reconciliation across fragment versions."""

    def _write_fragments(self, spark, tmp_path):
        from pyspark.sql import functions as F

        base = str(tmp_path / "corpus")
        v1 = spark.createDataFrame(
            [(1, 10, "old"), (2, 20, "old")],
            "id int, score int, deprecated string")
        v2 = spark.createDataFrame(
            [(3, 2**40, "kept"), (4, 40, None)],
            "id long, score long, note string")
        v1.coalesce(1).write.parquet(f"{base}/v=1")
        v2.coalesce(1).write.parquet(f"{base}/v=2")
        return base

    def test_reconciles_missing_extra_and_widened(self, spark, tmp_path):
        from pyspark.sql import types as T

        from filters_spark.sources.readers import read_evolving

        base = self._write_fragments(spark, tmp_path)
        target = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("score", T.LongType()),
            T.StructField("note", T.StringType()),
        ])
        rows = {r["id"]: (r["score"], r["note"])
                for r in read_evolving(spark, base, target).collect()}
        # v1 int columns widened, note nulls in; deprecated dropped
        assert rows == {1: (10, None), 2: (20, None),
                        3: (2**40, "kept"), 4: (40, None)}

    def test_pure_scan_plan(self, spark, tmp_path):
        from pyspark.sql import types as T

        from filters_spark.sources.readers import read_evolving

        base = self._write_fragments(spark, tmp_path)
        target = T.StructType([T.StructField("id", T.LongType())])
        df = read_evolving(spark, base, target)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert sorted(r["id"] for r in df.collect()) == [1, 2, 3, 4]
