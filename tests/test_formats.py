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


class TestAvroRoundtrip:
    """Avro OCF source/sink implemented from the public spec
    (sources.avroio — the spark-avro connector jar and both Python
    avro packages are absent in this container, probed in the module
    docstring).  Self-roundtrip + a byte-level GOLDEN pin computed by
    hand from the spec, so the wire format is pinned beyond
    self-consistency."""

    def test_golden_bytes_match_spec(self, tmp_path):
        # one record {"a": 1}, codec null, fixed sync marker —
        # every byte derived by hand from the Avro 1.11 spec
        from filters_spark.sources.avroio import _read_ocf, _write_ocf
        schema = ('{"type": "record", "name": "row", "fields": '
                  '[{"name": "a", "type": "long"}]}')
        sync = bytes(range(16))
        p = str(tmp_path / "g.avro")
        with open(p, "wb") as fh:
            n = _write_ocf(fh, schema, [{"a": 1}], "null", sync)
        assert n == 1
        raw = open(p, "rb").read()
        assert raw[:4] == b"Obj\x01"
        # metadata map: count=2 -> zigzag 4; keys sorted
        # (avro.codec='null', avro.schema=schema)
        exp = bytearray(b"Obj\x01")
        exp += bytes([4])
        for k, v in (("avro.codec", b"null"),
                     ("avro.schema", schema.encode())):
            kk = k.encode()
            exp += bytes([len(kk) * 2]) + kk
            if len(v) < 64:
                exp += bytes([len(v) * 2]) + v
            else:                      # multi-byte zigzag varint
                u = len(v) * 2
                while u:
                    b = u & 0x7F
                    u >>= 7
                    exp.append(b | 0x80 if u else b)
                exp += v
        exp += bytes([0]) + sync
        # block: count 1 -> 0x02, size 1 -> 0x02, payload
        # zigzag(1)=0x02, sync
        exp += bytes([2, 2, 2]) + sync
        assert raw == bytes(exp)
        # and the decoder agrees
        _s, rows = _read_ocf(p)
        assert rows == [{"a": 1}]

    def test_all_types_roundtrip(self, spark, tmp_path):
        import datetime as dt

        from filters_spark.sources.avroio import read_avro, write_avro
        rows = [
            (1, 2.5, "héllo", b"\x00\xff", True,
             dt.date(2024, 3, 1), dt.datetime(2024, 3, 1, 12, 30, 15,
                                              123456),
             [1, 2, 3], ("x", 9)),
            (2, None, None, None, None, None, None, None, None),
        ]
        schema = ("k bigint, d double, s string, b binary, f boolean, "
                  "dt date, ts timestamp, arr array<bigint>, "
                  "st struct<name: string, n: bigint>")
        df = spark.createDataFrame(rows, schema)
        p = str(tmp_path / "t")
        n = write_avro(df, p)
        assert n == 2
        back = read_avro(spark, p)
        assert back.schema == df.schema
        got = sorted(map(tuple, back.collect()))
        want = sorted(map(tuple, df.collect()))
        assert got == want

    def test_deflate_and_null_codecs_agree(self, spark, tmp_path):
        from filters_spark.sources.avroio import read_avro, write_avro
        df = spark.range(500).selectExpr(
            "id", "cast(id as string) s",
            "cast(id as double) * 0.5 x")
        a, b = str(tmp_path / "defl"), str(tmp_path / "plain")
        write_avro(df, a, codec="deflate")
        write_avro(df, b, codec="null")
        ra = sorted(map(tuple, read_avro(spark, a).collect()))
        rb = sorted(map(tuple, read_avro(spark, b).collect()))
        assert ra == rb and len(ra) == 500
        # deflate actually compresses the repetitive payload
        size = lambda d: sum(  # noqa: E731
            os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
        assert size(a) < size(b)

    def test_schema_on_read_evolution(self, spark, tmp_path):
        import pyspark.sql.types as T

        from filters_spark.sources.avroio import read_avro, write_avro
        df = spark.createDataFrame([(1, 10), (2, 20)],
                                   "k int, n int")   # int32 in files
        p = str(tmp_path / "t")
        write_avro(df, p)
        target = T.StructType([
            T.StructField("k", T.LongType()),        # int -> long
            T.StructField("evolved", T.StringType()),  # not in files
        ])
        back = read_avro(spark, p, target)
        got = sorted((r["k"], r["evolved"]) for r in back.collect())
        assert got == [(1, None), (2, None)]
        assert dict(back.dtypes)["k"] == "bigint"

    def test_empty_frame_roundtrips(self, spark, tmp_path):
        from filters_spark.sources.avroio import read_avro, write_avro
        df = spark.createDataFrame([], "k bigint, s string")
        p = str(tmp_path / "t")
        assert write_avro(df, p) == 0
        back = read_avro(spark, p)
        assert back.count() == 0
        assert [f.name for f in back.schema.fields] == ["k", "s"]

    def test_corrupt_block_fails_loudly(self, spark, tmp_path):
        from filters_spark.sources.avroio import read_avro, write_avro
        df = spark.range(10).selectExpr("id", "cast(id as string) s")
        p = str(tmp_path / "t")
        write_avro(df, p, codec="null")
        f = os.path.join(p, sorted(os.listdir(p))[0])
        raw = bytearray(open(f, "rb").read())
        raw[-3] ^= 0xFF                       # flip a sync-marker byte
        open(f, "wb").write(bytes(raw))
        with pytest.raises(Exception, match="sync marker|corrupt"):
            read_avro(spark, p).collect()
        # bad magic
        open(f, "wb").write(b"PAR1" + bytes(raw[4:]))
        with pytest.raises(Exception, match="bad magic"):
            read_avro(spark, p).collect()

    def test_unsupported_types_raise(self, spark, tmp_path):
        from filters_spark.sources.avroio import write_avro
        df = spark.range(1).selectExpr(
            "map('a', id) m")
        with pytest.raises(TypeError, match="unsupported Spark type"):
            write_avro(df, str(tmp_path / "t"))

    def test_timestamp_ntz_roundtrip(self, spark, tmp_path):
        import datetime as dt

        from filters_spark.sources.avroio import read_avro, write_avro
        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 3, 1, 12, 30, 15, 123456)), (2, None)],
            "k bigint, ts timestamp_ntz")
        p = str(tmp_path / "t")
        write_avro(df, p)
        back = read_avro(spark, p)
        assert dict(back.dtypes)["ts"] == "timestamp_ntz"
        assert sorted(map(tuple, back.collect())) == \
            sorted(map(tuple, df.collect()))

    def test_rewrite_overwrites_stale_parts(self, spark, tmp_path):
        from filters_spark.sources.avroio import read_avro, write_avro
        p = str(tmp_path / "t")
        write_avro(spark.range(100).selectExpr("id"), p)
        write_avro(spark.range(7).selectExpr("id"), p)  # overwrite
        assert read_avro(spark, p).count() == 7


class TestWarc:
    """WARC source/sink from the public ISO 28500 spec (r11): record
    walk, gzip-member-per-record layout, header folding, HTTP
    response extraction incl. chunked decoding."""

    def _corpus(self, spark):
        return spark.range(0, 50).select(
            F.concat(F.lit("https://ex.com/d/"), F.col("id"))
            .alias("uri"),
            F.concat(F.lit("<p>doc "), F.col("id"),
                     F.lit(" &amp; tail</p>")).alias("body"))

    def test_roundtrip(self, spark, tmp_path):
        from filters_spark.sources import warcio
        p = str(tmp_path / "w")
        n = warcio.write_warc(self._corpus(spark).repartition(3), p)
        assert n == 50
        back = warcio.read_warc(spark, p)
        resp = back.where(F.col("warc_type") == "response")
        assert resp.count() == 50
        # one warcinfo per file, each record its own gzip member
        import os
        files = [f for f in os.listdir(p) if f.endswith(".warc.gz")]
        assert back.where(F.col("warc_type") == "warcinfo").count() \
            == len(files)
        [r] = resp.where(
            F.col("target_uri") == "https://ex.com/d/9").collect()
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html"
        assert bytes(r["body"]) == b"<p>doc 9 &amp; tail</p>"
        assert r["record_id"].startswith("urn:uuid:")
        assert r["warc_date"] == "2024-01-01T00:00:00Z"

    def test_gzip_members_are_per_record(self, spark, tmp_path):
        """The Common Crawl layout: each record its own gzip member —
        member count == record count."""
        import os
        from filters_spark.sources import warcio
        p = str(tmp_path / "w")
        warcio.write_warc(self._corpus(spark).coalesce(1), p)
        [f] = [os.path.join(p, x) for x in os.listdir(p)
               if x.endswith(".warc.gz")]
        raw = open(f, "rb").read()
        assert raw.count(b"\x1f\x8b\x08") == 51  # 50 + warcinfo

    def test_chunked_transfer_decoding(self, spark, tmp_path):
        import gzip
        from filters_spark.sources import warcio
        from filters_spark.sources.warcio import _warc_record
        chunked = b"5\r\nhello\r\n8\r\n chunked\r\n0\r\n\r\n"
        http = (b"HTTP/1.1 206 Partial\r\nContent-Type: text/plain\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n" + chunked)
        p = tmp_path / "c"
        p.mkdir()
        with open(p / "one.warc.gz", "wb") as fh:
            fh.write(gzip.compress(_warc_record(
                "response", "urn:uuid:x", "2024-01-01T00:00:00Z",
                http, "application/http;msgtype=response",
                target_uri="https://ex.com/c")))
        [r] = warcio.read_warc(spark, str(p)).collect()
        assert r["http_status"] == 206
        assert bytes(r["body"]) == b"hello chunked"

    def test_header_continuation_folding(self, spark, tmp_path):
        import gzip
        p = tmp_path / "f"
        p.mkdir()
        content = b"payload"
        rec = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
               b"WARC-Record-ID: <urn:uuid:y>\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"WARC-Target-URI: https://ex.com/very\r\n"
               b" /long/path\r\n"
               b"Content-Length: 7\r\n\r\n" + content + b"\r\n\r\n")
        with open(p / "one.warc.gz", "wb") as fh:
            fh.write(gzip.compress(rec))
        from filters_spark.sources import warcio
        [r] = warcio.read_warc(spark, str(p)).collect()
        assert r["target_uri"] == "https://ex.com/very /long/path"
        assert bytes(r["body"]) == content

    def test_plain_uncompressed_warc(self, spark, tmp_path):
        p = tmp_path / "u"
        p.mkdir()
        rec = (b"WARC/1.1\r\nWARC-Type: resource\r\n"
               b"WARC-Record-ID: <urn:uuid:z>\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"Content-Length: 3\r\n\r\nabc\r\n\r\n")
        with open(p / "one.warc", "wb") as fh:
            fh.write(rec * 2)
        from filters_spark.sources import warcio
        rows = warcio.read_warc(spark, str(p)).collect()
        assert len(rows) == 2
        assert all(bytes(r["body"]) == b"abc" for r in rows)

    def test_truncated_record_fails_loudly(self, spark, tmp_path):
        import gzip
        import pytest
        p = tmp_path / "t"
        p.mkdir()
        rec = (b"WARC/1.0\r\nWARC-Type: resource\r\n"
               b"WARC-Record-ID: <urn:uuid:q>\r\n"
               b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
               b"Content-Length: 999\r\n\r\nshort")
        with open(p / "one.warc.gz", "wb") as fh:
            fh.write(gzip.compress(rec))
        from filters_spark.sources import warcio
        with pytest.raises(Exception, match="truncated"):
            warcio.read_warc(spark, str(p)).collect()

    def test_empty_write_readback(self, spark, tmp_path):
        from filters_spark.sources import warcio
        p = str(tmp_path / "e")
        assert warcio.write_warc(self._corpus(spark).limit(0), p) == 0
        back = warcio.read_warc(spark, p)
        assert [r["warc_type"] for r in back.collect()] == ["warcinfo"]
