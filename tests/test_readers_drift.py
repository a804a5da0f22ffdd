"""Tests for raw-text/binary ingestion readers and the streaming
drift monitor."""

import os

from pyspark.sql import functions as F


class TestReadTextDocs:
    def test_line_mode_ids_stable_across_layout(self, spark, tmp_path):
        p = tmp_path / "corpus"
        p.mkdir()
        (p / "a.txt").write_text("hello world\n\nsecond doc\n")
        (p / "b.txt").write_text("third doc\n")
        from filters_spark.sources.readers import read_text_docs
        rows = read_text_docs(spark, str(p)).collect()
        texts = sorted(r["text"] for r in rows)
        assert texts == ["hello world", "second doc", "third doc"]  # blank dropped
        assert all(r["doc_id"] is not None for r in rows)
        # ids are content-derived: re-reading yields the same ids
        again = {r["text"]: r["doc_id"]
                 for r in read_text_docs(spark, str(p)).collect()}
        assert all(again[r["text"]] == r["doc_id"] for r in rows)

    def test_whole_file_mode(self, spark, tmp_path):
        p = tmp_path / "files"
        p.mkdir()
        (p / "x.txt").write_text("line one\nline two\n")
        from filters_spark.sources.readers import read_text_docs
        rows = read_text_docs(spark, str(p), whole_file=True).collect()
        assert len(rows) == 1
        assert "line one" in rows[0]["text"] and "line two" in rows[0]["text"]

    def test_min_length_filter(self, spark, tmp_path):
        p = tmp_path / "short"
        p.mkdir()
        (p / "a.txt").write_text("ok line here\nno\n")
        from filters_spark.sources.readers import read_text_docs
        rows = read_text_docs(spark, str(p), min_length=5).collect()
        assert [r["text"] for r in rows] == ["ok line here"]


class TestReadMediaDir:
    def test_binary_payloads_and_filters(self, spark, tmp_path):
        p = tmp_path / "media"
        p.mkdir()
        (p / "a.jpg").write_bytes(b"\xff\xd8smalljpeg")
        (p / "b.jpg").write_bytes(b"\xff\xd8" + b"x" * 1000)
        (p / "c.png").write_bytes(b"\x89PNGdata")
        from filters_spark.sources.readers import read_media_dir
        all_files = read_media_dir(spark, str(p)).collect()
        assert len(all_files) == 3
        jpgs = read_media_dir(spark, str(p), pattern="*.jpg").collect()
        assert sorted(os.path.basename(r["path"]) for r in jpgs) == \
            ["a.jpg", "b.jpg"]
        small = read_media_dir(spark, str(p), pattern="*.jpg",
                               max_bytes=100).collect()
        assert [os.path.basename(r["path"]) for r in small] == ["a.jpg"]
        assert bytes(small[0]["content"]).startswith(b"\xff\xd8")

    def test_feeds_multimodal_features(self, spark, tmp_path):
        """binaryFile output plugs into the multimodal media-struct
        convention end to end (stub codec)."""
        p = tmp_path / "imgs"
        p.mkdir()
        (p / "i1.jpg").write_bytes(b"\xff\xd8" + b"p" * 64)
        from filters_spark.sources.readers import read_media_dir
        from filters_spark.functions import multimodal as mm
        raw = read_media_dir(spark, str(p)).select(
            F.col("path").alias("doc_id"), "content")
        media = mm.attach_meta(raw, "content", "image/jpeg").drop("content")
        out = mm.decode_images(media, strict=False, codec="fake").collect()
        assert len(out) == 1
        assert out[0]["pixels"] is not None


class TestStreamingDrift:
    def test_drift_by_window(self, spark):
        from filters_spark import streaming as st
        ev = st.events_stream(spark, "/root/testdata/sf0.001")
        drift = st.validate.drift_by_window(
            ev, "event_type",
            baseline={"click": 0.5, "view": 0.3, "signup": 0.1,
                      "purchase": 0.1},
            window="1 day", watermark="2 days")
        # update mode: append would hold back windows the watermark
        # has not passed yet (the stream's tail) — for a drift
        # monitor the live partial windows are the point
        q = (drift.writeStream.format("memory").queryName("drift_t")
             .outputMode("update").trigger(availableNow=True).start())
        q.processAllAvailable()
        q.stop()
        rows = spark.sql("select * from drift_t").collect()
        assert rows, "no drift windows emitted"
        cats = {r["event_type"] for r in rows}
        assert "click" in cats
        for r in rows:
            assert r["n"] > 0
            assert 0.0 <= r["baseline_share"] <= 1.0
        # batch parity: summed streaming counts == batch counts
        from filters_spark.sources import load_table
        batch = (load_table(spark, "events", "/root/testdata/sf0.001")
                 .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
        batch_n = {r["event_type"]: r["n"] for r in batch.collect()}
        stream_n = {}
        for r in rows:
            stream_n[r["event_type"]] = stream_n.get(r["event_type"], 0) + r["n"]
        assert stream_n == batch_n


class TestTrainingShards:
    def test_one_ordered_file_per_shard(self, spark, tmp_path):
        import glob
        import hashlib
        import pyarrow.parquet as pq
        from filters_spark.sources.sinks import write_training_shards

        df = spark.createDataFrame([(i, f"doc{i}") for i in range(300)],
                                   "doc_id bigint, text string")
        out = str(tmp_path / "shards")
        manifest = {r["shard"]: (r["n_rows"], r["order_checksum"])
                    for r in write_training_shards(
                        df, "doc_id", 8, out).collect()}
        assert set(manifest) == set(range(8))
        assert sum(n for n, _ in manifest.values()) == 300

        # each shard dir holds exactly ONE data file, in position order
        for s in range(8):
            files = [f for f in glob.glob(f"{out}/shard={s}/*")
                     if f.endswith(".parquet")]
            assert len(files) == 1, f"shard {s}: {files}"
            t = pq.read_table(files[0]).to_pydict()
            ids = t["doc_id"]
            # file order must equal the md5 hash order of the ids
            exp = sorted(ids, key=lambda k: (
                hashlib.md5(str(k).encode()).hexdigest(), k))
            assert ids == exp, f"shard {s} not in epoch order"
            # manifest checksum replays from the file
            chk = sum(k * (p + 1) for p, k in enumerate(ids))
            assert chk == manifest[s][1]


class TestOrcRoundtrip:
    def test_roundtrip_partitioned_and_evolution(self, spark, tmp_path):
        import pyspark.sql.types as T
        from pyspark.sql import functions as F

        from filters_spark.sources import readers

        df = spark.range(50).select(
            F.col("id"), (F.col("id") % 5).cast("string").alias("grp"),
            (F.col("id") * 3).alias("v"))
        path = str(tmp_path / "orc_t")
        readers.write_orc(df, path, partition_by=["grp"])
        # plain read back: all rows, partition column restored
        back = readers.read_orc(spark, path)
        assert back.count() == 50
        assert set(back.columns) == {"id", "grp", "v"}
        # schema-on-read evolution: extra column nulls out, dropped
        # column never read
        sch = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("extra", T.StringType()),
            T.StructField("grp", T.StringType()),
        ])
        ev = readers.read_orc(spark, path, sch)
        rows = ev.collect()
        assert len(rows) == 50
        assert all(r["extra"] is None for r in rows)
        assert {r["grp"] for r in rows} == {"0", "1", "2", "3", "4"}

    def test_partition_pruning_in_plan(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from filters_spark.sources import readers

        df = spark.range(50).select(
            F.col("id"), (F.col("id") % 5).cast("string").alias("grp"))
        path = str(tmp_path / "orc_p")
        readers.write_orc(df, path, partition_by=["grp"])
        pruned = readers.read_orc(spark, path).where(F.col("grp") == "2")
        assert pruned.count() == 10
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # directory-level pruning: the scan's partition filters carry
        # the predicate (no full-table read)
        assert "grp" in plan

    def test_compression_options(self, spark, tmp_path):
        from filters_spark.sources import readers

        df = spark.range(10)
        for comp in ("zlib", "snappy"):
            path = str(tmp_path / f"orc_{comp}")
            readers.write_orc(df, path, compression=comp)
            assert readers.read_orc(spark, path).count() == 10


class TestTarShards:
    def _df(self, spark, n=60):
        from pyspark.sql import functions as F
        return spark.range(n).select(
            F.concat(F.lit("doc-"), F.col("id")).alias("member_name"),
            F.encode(F.concat(F.lit("body "), F.col("id")),
                     "UTF-8").alias("payload"))

    def test_roundtrip_and_manifest(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from filters_spark.sources import readers, sinks
        d = str(tmp_path / "sh")
        man = sinks.write_tar_shards(self._df(spark), d,
                                     n_shards=3).collect()
        assert sum(r["n_members"] for r in man) == 60
        back = readers.read_tar_shards(spark, d)
        rows = back.collect()
        assert len(rows) == 60
        got = {r["member_name"]: bytes(r["payload"]) for r in rows}
        assert got["doc-7"] == b"body 7"
        assert all(r["member_bytes"] == len(bytes(r["payload"]))
                   for r in rows)
        # shards attribute to real files
        assert back.select("shard_path").distinct().count() == 3

    def test_deterministic_shard_bytes(self, spark, tmp_path):
        """Same names + payloads -> byte-identical shard files
        (pinned tar metadata + per-shard name sort)."""
        import hashlib
        import os

        from filters_spark.sources import sinks

        def digest(d):
            h = {}
            for f in sorted(os.listdir(d)):
                h[f] = hashlib.md5(
                    open(os.path.join(d, f), "rb").read()).hexdigest()
            return h

        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        sinks.write_tar_shards(self._df(spark), d1, n_shards=3).collect()
        sinks.write_tar_shards(self._df(spark).repartition(7), d2,
                               n_shards=3).collect()
        assert digest(d1) == digest(d2)

    def test_member_filter(self, spark, tmp_path):
        from filters_spark.sources import readers, sinks
        d = str(tmp_path / "f")
        sinks.write_tar_shards(self._df(spark, 30), d,
                               n_shards=2).collect()
        only1 = readers.read_tar_shards(spark, d, member_filter="doc-1")
        names = {r["member_name"] for r in only1.collect()}
        assert names == {f"doc-{i}" for i in list(range(10, 20)) + [1]}


class TestXmlRoundtrip:
    """sources.read_xml / write_xml — Spark 4's native xml source:
    the gate (rel_xml_roundtrip) pins escaping + attributes + nesting
    + evolution checksums; these pin the reader-contract corners the
    aggregate can't see (exact restored values, malformed-record
    handling)."""

    def test_roundtrip_attrs_nesting_escaping(self, spark, tmp_path):
        import pyspark.sql.types as T
        from pyspark.sql import functions as F

        from filters_spark.sources import readers

        df = spark.range(10).select(
            F.col("id"),
            F.concat(F.lit("p"), (F.col("id") % 3).cast("string"))
            .alias("_tag"),
            F.struct((F.col("id") * 100).alias("cents"),
                     (F.col("id") + 7).alias("aux")).alias("nested"),
            F.concat(F.lit('x<&">'), F.col("id").cast("string"),
                     F.lit("&amp;end")).alias("note"))
        path = str(tmp_path / "xml_t")
        readers.write_xml(df, path, row_tag="rec", root_tag="recs")
        sch = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("_tag", T.StringType()),
            T.StructField("nested", T.StructType([
                T.StructField("cents", T.LongType()),
                T.StructField("aux", T.LongType()),
            ])),
            T.StructField("note", T.StringType()),
        ])
        back = readers.read_xml(spark, path, "rec", sch)
        rows = {r["id"]: r for r in back.collect()}
        assert len(rows) == 10
        for i in range(10):
            r = rows[i]
            assert r["_tag"] == f"p{i % 3}"
            assert r["nested"]["cents"] == i * 100
            assert r["nested"]["aux"] == i + 7
            # escaping survives EXACTLY — including a literal string
            # that already looks like an entity (&amp;end must come
            # back as the 8 chars written, not double-decoded to &end)
            assert r["note"] == f'x<&">{i}&amp;end'

    def test_raw_file_is_escaped_xml(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from filters_spark.sources import readers

        df = spark.createDataFrame([(1, 'a<&"b')], "id long, note string")
        path = str(tmp_path / "xml_raw")
        readers.write_xml(df.coalesce(1), path, row_tag="rec")
        import glob
        files = glob.glob(f"{path}/part-*")
        assert files
        body = open(files[0]).read()
        # the markup-hostile chars must be entity-escaped on disk
        assert "a<&" not in body
        assert "&lt;" in body and "&amp;" in body

    def test_permissive_corrupt_record(self, spark, tmp_path):
        import pyspark.sql.types as T

        from filters_spark.sources import readers

        p = tmp_path / "bad.xml"
        p.write_text(
            "<rows>"
            "<rec><id>1</id><v>ok</v></rec>"
            "<rec><id>oops</id><v>bad-type</v></rec>"
            "<rec><id>3</id><v>fine</v></rec>"
            "</rows>")
        sch = T.StructType([
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ])
        back = readers.read_xml(
            spark, str(p), "rec", sch, mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt_record")
        rows = back.collect()
        assert len(rows) == 3
        good = [r for r in rows if r["_corrupt_record"] is None]
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        assert {r["id"] for r in good} == {1, 3}
        assert len(bad) == 1 and bad[0]["id"] is None
