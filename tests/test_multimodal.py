"""Multimodal plumbing: media struct convention, mapInPandas decode /
featurize / frame-sample shapes (codecs stubbed deterministically —
the Spark-side schema, batching, and partitioning are what's real)."""

import pytest
from pyspark.sql import functions as F

from filters_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def media_df(spark):
    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two-longer"), (3, None)],
        "id bigint, raw binary",
    )
    return mm.attach_meta(df, "raw", "image/png")


class TestAttachMeta:
    def test_struct_shape(self, media_df):
        dt = dict(media_df.dtypes)["media"]
        assert dt.startswith("struct<payload:binary,meta:struct<mime:string")

    def test_meta_values(self, media_df):
        row = media_df.where(F.col("id") == 1).head()
        assert row["media"]["meta"]["mime"] == "image/png"
        assert row["media"]["meta"]["width"] >= 16


class TestDecodeImages:
    def test_decode_is_deterministic(self, media_df):
        out1 = mm.decode_images(media_df).where(F.col("id") == 1).head()
        out2 = mm.decode_images(media_df).where(F.col("id") == 1).head()
        assert out1["pixels"] == out2["pixels"]
        assert len(out1["pixels"]) == out1["out_width"] * out1["out_height"]

    def test_null_payload_passthrough(self, media_df):
        row = mm.decode_images(media_df).where(F.col("id") == 3).head()
        assert row["pixels"] is None

    def test_strict_mode_raises(self, media_df):
        with pytest.raises(Exception):
            mm.decode_images(media_df, strict=True).collect()

    def test_fake_codec_pinned(self, media_df):
        # 'fake' must produce the md5-keystream stub regardless of
        # what libs are installed — it's the hash-gated contract
        row = mm.decode_images(media_df, codec="fake").where(F.col("id") == 1).head()
        w, h = row["out_width"], row["out_height"]
        assert row["pixels"] == mm._fake_pixels(b"payload-one", w, h)

    def test_real_codec_requires_pil(self, media_df):
        if mm._pil_available():
            pytest.skip("PIL present — covered by the parity test")
        with pytest.raises(Exception, match="PIL|pil|No module"):
            mm.decode_images(media_df, codec="real").collect()

    @pytest.mark.skipif(not mm._pil_available(),
                        reason="PIL not in this container")
    def test_real_codec_parity_with_pil(self, spark):
        """When PIL exists, codec='real' must match a direct PIL
        decode byte-for-byte — proving the stub/real boundary is
        swappable with no Spark-side changes."""
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (20, 12), (120, 30, 200)).save(buf, format="PNG")
        png = buf.getvalue()
        df = spark.createDataFrame([(1, png)], "id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/png")
        row = mm.decode_images(media, codec="real").head()
        w, h = row["out_width"], row["out_height"]
        expected = (
            Image.open(io.BytesIO(png)).convert("L").resize((w, h)).tobytes()
        )
        assert bytes(row["pixels"]) == expected


class TestFeatures:
    def test_feature_vector_shape_and_norm(self, media_df):
        feats = mm.extract_image_features(mm.decode_images(media_df), dim=8)
        row = feats.where(F.col("id") == 2).head()
        assert len(row["features"]) == 8
        assert abs(sum(row["features"]) - 1.0) < 1e-6


class TestFrameSampling:
    def test_one_row_per_frame(self, media_df):
        frames = mm.sample_video_frames(media_df, every_ms=1000)
        rows = frames.where(F.col("id") == 1).collect()
        assert len(rows) == 3  # fake duration 3000ms / 1000ms
        assert [r["frame_idx"] for r in rows] == [0, 1, 2]
        assert all(len(r["frame"]) == 16 for r in rows)


class TestRepartition:
    def test_partition_count_scales_with_bytes(self, spark):
        df = spark.createDataFrame(
            [(i, bytes(1000)) for i in range(100)], "id bigint, raw binary"
        )
        df = mm.attach_meta(df, "raw", "application/octet-stream")
        out = mm.repartition_for_media(df, target_bytes_per_task=10_000,
                                       sample_fraction=1.0)
        assert out.rdd.getNumPartitions() == 10  # 100 rows × 1000 B / 10 kB


class TestAudioResample:
    def test_resample_length_arithmetic(self, spark):
        import pyspark.sql.functions as F
        from filters_spark.functions import multimodal as mm

        df = spark.createDataFrame(
            [(1, b"\x01\x02\x03four"), (2, None)], "id bigint, payload binary"
        )
        media = mm.attach_meta(df, "payload", "audio/wav").withColumn(
            "media",
            F.col("media").withField("meta.duration_ms", F.lit(500).cast("bigint")),
        )
        out = {r["id"]: r for r in mm.resample_audio(media, target_rate=16000).collect()}
        # 500 ms at 16 kHz → 8000 samples → 16000 PCM bytes
        assert out[1]["n_samples"] == 8000
        assert len(out[1]["samples"]) == 16000
        assert out[1]["out_rate"] == 16000
        assert out[2]["samples"] is None and out[2]["n_samples"] is None

    def test_strict_raises(self, spark):
        import pytest as _pytest
        from py4j.protocol import Py4JJavaError
        from filters_spark.functions import multimodal as mm

        df = spark.createDataFrame([(1, b"x")], "id bigint, payload binary")
        media = mm.attach_meta(df, "payload", "audio/wav")
        with _pytest.raises(Exception) as ei:
            mm.resample_audio(media, strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or "torchaudio" in str(ei.value)


class TestRealNetpbmCodec:
    def _ppm(self, w, h, rgb_rows):
        header = f"P6\n{w} {h}\n255\n".encode()
        body = bytes(v for row in rgb_rows for px in row for v in px)
        return header + body

    def test_p6_decodes_real_pixels_even_strict(self, spark):
        from pyspark.sql import functions as F
        from filters_spark.functions import multimodal as mm
        # 2x1: pure red and pure white
        payload = self._ppm(2, 1, [[(255, 0, 0), (255, 255, 255)]])
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/x-portable-pixmap")
        # force output dims = native dims via meta override
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(2))
            .withField("meta.height", F.lit(1)))
        out = mm.decode_images(media, strict=True, codec="auto").collect()
        px = bytes(out[0]["pixels"])
        assert len(px) == 2
        assert px[0] == 76      # luma of pure red = round(0.299*255)
        assert px[1] == 255     # white
    def test_p5_comment_and_resize(self, spark):
        from pyspark.sql import functions as F
        from filters_spark.functions import multimodal as mm
        header = b"P5\n# a comment\n4 4\n255\n"
        body = bytes(range(16))                      # 4x4 ramp
        df = spark.createDataFrame([(1, bytearray(header + body))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/x-portable-graymap")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(2))
            .withField("meta.height", F.lit(2)))
        out = mm.decode_images(media, strict=True, codec="auto").collect()
        px = bytes(out[0]["pixels"])
        # nearest-neighbor picks rows 0,2 and cols 0,2 -> 0,2,8,10
        assert list(px) == [0, 2, 8, 10]


class TestRealWavResample:
    def _wav(self, rate, samples, n_ch=1):
        import io
        import struct
        import wave
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(n_ch)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(b"".join(struct.pack("<h", s) for s in samples))
        return buf.getvalue()

    def test_upsample_doubles_length_even_strict(self, spark):
        import struct
        from filters_spark.functions import multimodal as mm
        wav = self._wav(8000, [0, 1000, 2000, 3000])
        df = spark.createDataFrame([(1, bytearray(wav))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "audio/wav")
        out = mm.resample_audio(media, target_rate=16000,
                                strict=True).collect()
        n = out[0]["n_samples"]
        assert n == 8
        got = struct.unpack(f"<{n}h", bytes(out[0]["samples"]))
        assert got[0] == 0 and got[1] == 500     # linear midpoint
        assert got[2] == 1000

    def test_stereo_mixes_to_mono(self, spark):
        import struct
        from filters_spark.functions import multimodal as mm
        # L=1000, R=3000 interleaved -> mono 2000
        wav = self._wav(16000, [1000, 3000, 1000, 3000], n_ch=2)
        df = spark.createDataFrame([(1, bytearray(wav))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "audio/wav")
        out = mm.resample_audio(media, target_rate=16000,
                                strict=True).collect()
        got = struct.unpack(f"<{out[0]['n_samples']}h",
                            bytes(out[0]["samples"]))
        assert got == (2000, 2000)


class TestCodecReviewRegressions:
    def test_16bit_pgm_decodes_correctly(self, spark):
        from pyspark.sql import functions as F
        from filters_spark.functions import multimodal as mm
        import struct
        # 2x1 16-bit PGM: maxval 65535, big-endian samples 0 and 65535
        payload = b"P5\n2 1\n65535\n" + struct.pack(">2H", 0, 65535)
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/x-portable-graymap")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(2))
            .withField("meta.height", F.lit(1)))
        px = bytes(mm.decode_images(media, strict=True,
                                    codec="auto").collect()[0]["pixels"])
        assert list(px) == [0, 255]   # scaled, not byte-split noise

    def test_netpbm_decodes_real_even_lenient_without_pil(self, spark):
        """codec='auto', strict=False on a PIL-less worker must still
        use the REAL numpy decode for netpbm payloads — the strict
        flag controls error behavior, never the decoded output."""
        from pyspark.sql import functions as F
        from filters_spark.functions import multimodal as mm
        payload = b"P5\n2 1\n255\n" + bytes([7, 200])
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/x-portable-graymap")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(2))
            .withField("meta.height", F.lit(1)))
        lenient = bytes(mm.decode_images(media, strict=False,
                                         codec="auto").collect()[0]["pixels"])
        strict = bytes(mm.decode_images(media, strict=True,
                                        codec="auto").collect()[0]["pixels"])
        assert lenient == strict == bytes([7, 200])

    def test_pil_path_swappable_with_stub(self, spark):
        """CONDITIONAL (skips in this container — no PIL): the real
        PIL decode body and the stub must be swappable WITHOUT plan
        changes — same output schema, same pixels-length contract
        (w*h bytes), strict mode satisfied by the PIL path.  Proves
        the stub boundary is an implementation detail, not a schema
        fork (VERDICT r3 task 7)."""
        import pytest as _pytest
        PIL = _pytest.importorskip("PIL.Image")
        import io
        from pyspark.sql import functions as F
        from filters_spark.functions import multimodal as mm

        buf = io.BytesIO()
        PIL.new("RGB", (4, 2), (10, 200, 30)).save(buf, format="PNG")
        df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/png")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(4))
            .withField("meta.height", F.lit(2)))
        real = mm.decode_images(media, strict=True, codec="auto")
        fake = mm.decode_images(media, strict=False, codec="fake")
        assert real.schema == fake.schema       # no plan/schema fork
        rpx = real.collect()[0]["pixels"]
        fpx = fake.collect()[0]["pixels"]
        assert len(rpx) == len(fpx) == 4 * 2    # same output contract

    def test_corrupt_netpbm_falls_back_lenient_raises_strict(self, spark):
        """A payload that SNIFFS as netpbm ('P5' prefix) but is
        malformed (truncated raster / garbage header) must fall
        through to the stub when strict=False — the WAV twin's
        contract — and raise only in strict mode (ADVICE r3)."""
        from filters_spark.functions import multimodal as mm
        corrupt = b"P5\n2 notanint\n255\nx"    # garbage header token
        truncated = b"P5\n4 4\n255\n\x01\x02"  # raster too short
        for payload in (corrupt, truncated):
            df = spark.createDataFrame([(1, bytearray(payload))],
                                       "doc_id bigint, raw binary")
            media = mm.attach_meta(df, "raw", "image/x-portable-graymap")
            out = mm.decode_images(media, strict=False,
                                   codec="auto").collect()
            assert out[0]["pixels"] is not None   # stub fallback, no crash
            import pytest as _pytest
            with _pytest.raises(Exception):
                mm.decode_images(media, strict=True, codec="auto").collect()

    def test_non_pcm_riff_falls_back_lenient_raises_strict(self, spark):
        from filters_spark.functions import multimodal as mm
        bogus = b"RIFF\x10\x00\x00\x00AVI LIST"   # RIFF but not a WAV
        df = spark.createDataFrame([(1, bytearray(bogus))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "video/avi")
        out = mm.resample_audio(media, target_rate=16000,
                                strict=False).collect()
        assert out[0]["samples"] is not None      # stub fallback, no crash
        import pytest as _pytest
        with _pytest.raises(Exception):
            mm.resample_audio(media, target_rate=16000,
                              strict=True).collect()


class TestY4mVideo:
    def _y4m(self, w, h, yframes, fps="25:1"):
        csz = (w // 2) * (h // 2)
        out = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A0:0 C420\n".encode()
        for y in yframes:
            assert len(y) == w * h
            out += b"FRAME\n" + y + bytes([128] * (2 * csz))
        return out

    def test_y4m_parses_real_frames_even_strict(self, spark):
        from pyspark.sql import functions as F
        from filters_spark.functions import multimodal as mm
        f0 = bytes(range(16))
        f1 = bytes(range(100, 116))
        payload = self._y4m(4, 4, [f0, f1])
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "video/x-yuv4mpeg")
        rows = (mm.sample_video_frames(media, every_ms=40, strict=True)
                .orderBy("frame_idx").collect())
        assert [(r["frame_idx"], r["frame_ts_ms"]) for r in rows] == \
            [(0, 0), (1, 40)]
        assert bytes(rows[0]["frame"]) == f0
        assert bytes(rows[1]["frame"]) == f1

    def test_sampling_interval_skips_frames(self, spark):
        from filters_spark.functions import multimodal as mm
        frames = [bytes([i] * 16) for i in range(10)]  # 25fps → 40ms apart
        payload = self._y4m(4, 4, frames)
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "video/x-yuv4mpeg")
        rows = (mm.sample_video_frames(media, every_ms=100, strict=True)
                .orderBy("frame_idx").collect())
        # 10 frames over 360ms, one per 100ms bucket: ts 0,120,200,320
        assert [r["frame_ts_ms"] for r in rows] == [0, 120, 200, 320]
        assert bytes(rows[1]["frame"]) == frames[3]

    def test_corrupt_y4m_lenient_falls_back_strict_raises(self, spark):
        import pytest as _pytest
        from filters_spark.functions import multimodal as mm
        for payload in (b"YUV4MPEG2 W4 Hx\nFRAME\n",      # bad header
                        b"YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n\x00\x01"):
            df = spark.createDataFrame([(1, bytearray(payload))],
                                       "doc_id bigint, raw binary")
            media = mm.attach_meta(df, "raw", "video/x-yuv4mpeg")
            out = mm.sample_video_frames(media, strict=False).collect()
            assert len(out) > 0          # stub fallback, no crash
            with _pytest.raises(Exception):
                mm.sample_video_frames(media, strict=True).collect()

    def test_ntsc_frame_rate_timestamps(self, spark):
        """Fractional rates (F30000:1001) must timestamp via integer
        arithmetic on num/den, not float fps."""
        from filters_spark.functions import multimodal as mm
        frames = [bytes([i] * 16) for i in range(4)]
        payload = self._y4m(4, 4, frames, fps="30000:1001")
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "video/x-yuv4mpeg")
        rows = (mm.sample_video_frames(media, every_ms=1, strict=True)
                .orderBy("frame_idx").collect())
        # ts_j = (j * 1000 * 1001) // 30000 -> 0, 33, 66, 100
        assert [r["frame_ts_ms"] for r in rows] == [0, 33, 66, 100]


class TestImageAhash:
    def _img_df(self, spark, imgs):
        rows = [(i, bytes(p), 8, 8) for i, p in imgs]
        return spark.createDataFrame(
            rows, "doc_id bigint, pixels binary, width int, height int")

    def test_identical_images_same_hash_and_noise_is_near(self, spark):
        from filters_spark.functions import dedup, multimodal as mm
        base = [10] * 32 + [200] * 32          # half dark, half bright
        noisy = list(base)
        noisy[0] = 14                           # tiny perturbation
        inverted = [200] * 32 + [10] * 32
        df = self._img_df(spark, [(1, base), (2, base), (3, noisy),
                                  (4, inverted)])
        h = {r["doc_id"]: (r["ahash_hi"], r["ahash_lo"])
             for r in mm.image_ahash(df).collect()}
        assert h[1] == h[2]                    # identical -> equal hash
        assert h[1] == h[3]                    # small noise -> same aHash
        assert h[1] != h[4]                    # inversion flips every bit
        pairs = {(r["a_id"], r["b_id"]): r["dist"] for r in
                 dedup.image_dup_pairs(mm.image_ahash(df),
                                       max_dist=3).collect()}
        assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
        assert (1, 4) not in pairs             # 64 bits apart

    def test_downsampling_blocks_integer_exact(self, spark):
        """16x16 image downsampled to 8x8 blocks: bit = blocksum*wh >
        totalsum*blockpixels, no float means."""
        from filters_spark.functions import multimodal as mm
        px = []
        for y in range(16):
            for x in range(16):
                px.append(250 if x >= 8 else 5)  # right half bright
        df = spark.createDataFrame([(1, bytes(px), 16, 16)],
                                   "doc_id bigint, pixels binary, "
                                   "width int, height int")
        [r] = mm.image_ahash(df).collect()
        # row-major 8x8 bits: each row = left 4 dark (0), right 4
        # bright (1) -> per row nibble 0b11110000 = 0xF0
        expected_bits = 0
        for j in range(64):
            if (j % 8) >= 4:
                expected_bits |= 1 << j
        assert r["ahash_hi"] == expected_bits & 0xFFFFFFFF
        assert r["ahash_lo"] == expected_bits >> 32

    def test_indivisible_dims_raise(self, spark):
        import pytest as _pt
        from filters_spark.functions import multimodal as mm
        df = spark.createDataFrame([(1, bytes([1] * 15), 5, 3)],
                                   "doc_id bigint, pixels binary, "
                                   "width int, height int")
        with _pt.raises(Exception, match="divisible"):
            mm.image_ahash(df).collect()


class TestAudioEnergyHash:
    def _pcm(self, vals):
        import struct
        return struct.pack(f"<{len(vals)}h", *vals)

    def test_contour_and_duplicates(self, spark):
        from filters_spark.functions import multimodal as mm
        quiet_loud = [10] * 16 + [1000] * 16   # 32 samples, 16 windows
        duplicate = list(quiet_loud)
        inverted = [1000] * 16 + [10] * 16
        df = spark.createDataFrame(
            [(1, self._pcm(quiet_loud)), (2, self._pcm(duplicate)),
             (3, self._pcm(inverted))],
            "doc_id bigint, samples binary")
        got = {r["doc_id"]: (r["energy_hash"], r["total_energy"])
               for r in mm.audio_energy_hash(df, n_windows=16).collect()}
        assert got[1] == got[2]                 # byte-dup -> same hash
        # loud half = windows 8..15 -> bits 8..15 set
        assert got[1][0] == 0xFF00
        assert got[3][0] == 0x00FF              # inverted contour
        assert got[1][1] == 16 * 10 + 16 * 1000

    def test_negative_samples_use_magnitude(self, spark):
        from filters_spark.functions import multimodal as mm
        vals = [-500] * 8 + [5] * 8             # loud NEGATIVE first half
        df = spark.createDataFrame([(1, self._pcm(vals))],
                                   "doc_id bigint, samples binary")
        [r] = mm.audio_energy_hash(df, n_windows=8).collect()
        assert r["energy_hash"] == 0x0F         # |amplitude| drives energy
        assert r["total_energy"] == 8 * 500 + 8 * 5

    def test_indivisible_raises(self, spark):
        import pytest as _pt
        from filters_spark.functions import multimodal as mm
        df = spark.createDataFrame([(1, self._pcm([1, 2, 3]))],
                                   "doc_id bigint, samples binary")
        with _pt.raises(Exception, match="divisible"):
            mm.audio_energy_hash(df, n_windows=16).collect()


class TestBmpCodec:
    """Real uncompressed-BMP decode (multimodal._decode_bmp) — the
    third real image format beside netpbm and Y4M."""

    def _bmp(self, rows, top_down=False, bpp=24, n_pal=None):
        import struct
        h = len(rows)
        w = len(rows[0])
        row_bytes = ((w * bpp // 8 + 3) // 4) * 4
        body = b""
        order = rows if top_down else rows[::-1]
        for r in order:
            if bpp == 24:
                line = b"".join(bytes([c, c, c]) for c in r)
            else:
                line = bytes(r)
            body += line + b"\0" * (row_bytes - len(line))
        pal_n = (n_pal if n_pal is not None else 256) if bpp == 8 else 0
        pal = b"".join(bytes([i, i, i, 0]) for i in range(pal_n))
        off = 54 + len(pal)
        hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        dib = struct.pack("<IiiHHIIiiII", 40, w,
                          -h if top_down else h,
                          1, bpp, 0, len(body), 0, 0,
                          n_pal or 0 if bpp == 8 else 0, 0)
        return hdr + dib + pal + body

    def test_decodes_real_in_strict_mode(self, spark):
        from pyspark.sql import functions as F

        from filters_spark.functions import multimodal as mm

        payload = self._bmp([[10, 20, 30, 40]])
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/bmp")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(4))
            .withField("meta.height", F.lit(1)))
        px = mm.decode_images(media, strict=True,
                              codec="auto").collect()[0]["pixels"]
        assert list(px) == [10, 20, 30, 40]

    def test_bottom_up_vs_top_down_agree(self):
        from filters_spark.functions.multimodal import _decode_bmp

        rows = [[1, 2], [3, 4]]
        up = _decode_bmp(self._bmp(rows, top_down=False), 2, 2)
        down = _decode_bmp(self._bmp(rows, top_down=True), 2, 2)
        assert list(up) == list(down) == [1, 2, 3, 4]

    def test_paletted_8bit(self):
        from filters_spark.functions.multimodal import _decode_bmp

        out = _decode_bmp(self._bmp([[5, 6, 7]], bpp=8), 3, 1)
        assert list(out) == [5, 6, 7]   # grayscale palette: lum == index

    def test_short_palette_biclrused(self):
        """A BMP with biClrUsed=16 ships only 16 palette entries; the
        decoder must size the read from biClrUsed, never assume 256
        (r5 ADVICE: pixel bytes silently became palette entries)."""
        from filters_spark.functions.multimodal import _decode_bmp

        out = _decode_bmp(self._bmp([[5, 6, 7]], bpp=8, n_pal=16), 3, 1)
        assert list(out) == [5, 6, 7]

    def test_pixel_index_past_short_palette_raises(self):
        import pytest as _pytest

        from filters_spark.functions.multimodal import _decode_bmp

        payload = self._bmp([[5, 200, 7]], bpp=8, n_pal=16)
        with _pytest.raises(ValueError, match="palette"):
            _decode_bmp(payload, 3, 1)

    def test_corrupt_bmp_falls_back_lenient_raises_strict(self, spark):
        from pyspark.sql import functions as F

        from filters_spark.functions import multimodal as mm

        compressed = bytearray(self._bmp([[1, 2]]))
        compressed[30] = 1              # BI_RLE8 — unsupported on purpose
        truncated = self._bmp([[1, 2, 3, 4]])[:40]
        for payload in (bytes(compressed), truncated):
            df = spark.createDataFrame([(1, bytearray(payload))],
                                       "doc_id bigint, raw binary")
            media = mm.attach_meta(df, "raw", "image/bmp")
            media = media.withColumn(
                "media", F.col("media").withField("meta.width", F.lit(2))
                .withField("meta.height", F.lit(1)))
            out = mm.decode_images(media, strict=False,
                                   codec="auto").collect()
            assert out[0]["pixels"] is not None
            import pytest as _pytest
            with _pytest.raises(Exception):
                mm.decode_images(media, strict=True, codec="auto").collect()


class TestPngCodec:
    """Real stdlib-zlib PNG decode (multimodal._decode_png) — the
    compressed image format this container CAN decode for real (r5
    VERDICT #2): chunk walk + CRC, DEFLATE, five unfilter rules."""

    def _gray_rows(self):
        return [[10, 20, 30, 250], [40, 5, 60, 70],
                [200, 90, 100, 0], [110, 255, 120, 130]]

    def test_roundtrip_each_filter_type(self):
        from filters_spark.functions.multimodal import (_decode_png,
                                                        _encode_png)

        rows = self._gray_rows()
        flat = [c for r in rows for c in r]
        for ft in range(5):
            payload = _encode_png(rows, filters=[ft] * 4)
            assert list(_decode_png(payload, 4, 4)) == flat, f"filter {ft}"

    def test_mixed_filters_roundtrip(self):
        from filters_spark.functions.multimodal import (_decode_png,
                                                        _encode_png)

        rows = self._gray_rows()
        payload = _encode_png(rows, filters=[0, 1, 2, 4])
        assert list(_decode_png(payload, 4, 4)) == \
            [c for r in rows for c in r]

    def test_rgb_and_rgba_luma(self):
        import struct
        import zlib

        from filters_spark.functions.multimodal import (_decode_png,
                                                        _png_chunk)

        # 2x1 RGB: pure red, pure white
        raw = bytes([0, 255, 0, 0, 255, 255, 255])
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
        p = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IDAT", zlib.compress(raw))
             + _png_chunk(b"IEND", b""))
        out = list(_decode_png(p, 2, 1))
        assert out == [round(0.299 * 255), 255]
        # 1x1 RGBA: green, alpha ignored
        raw = bytes([0, 0, 255, 0, 7])
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
        p = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IDAT", zlib.compress(raw))
             + _png_chunk(b"IEND", b""))
        assert list(_decode_png(p, 1, 1)) == [round(0.587 * 255)]

    def test_paletted(self):
        import struct
        import zlib

        from filters_spark.functions.multimodal import (_decode_png,
                                                        _png_chunk)

        plte = bytes([0, 0, 0, 50, 50, 50, 200, 200, 200])
        raw = bytes([0, 2, 1, 0])           # one scanline, indices 2,1,0
        ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0)
        p = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"PLTE", plte)
             + _png_chunk(b"IDAT", zlib.compress(raw))
             + _png_chunk(b"IEND", b""))
        assert list(_decode_png(p, 3, 1)) == [200, 50, 0]

    def test_interlace_and_16bit_rejected(self):
        import struct
        import zlib

        import pytest as _pt

        from filters_spark.functions.multimodal import (_decode_png,
                                                        _png_chunk)

        for depth, interlace, msg in ((8, 1, "interlace"),
                                      (16, 0, "8-bit")):
            ihdr = struct.pack(">IIBBBBB", 1, 1, depth, 0, 0, 0,
                               interlace)
            p = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
                 + _png_chunk(b"IDAT", zlib.compress(bytes([0, 0])))
                 + _png_chunk(b"IEND", b""))
            with _pt.raises(ValueError, match=msg):
                _decode_png(p, 1, 1)

    def test_crc_corruption_rejected(self):
        import pytest as _pt

        from filters_spark.functions.multimodal import (_decode_png,
                                                        _encode_png)

        payload = bytearray(_encode_png(self._gray_rows()))
        payload[40] ^= 0xFF                 # flip an IDAT body byte
        with _pt.raises(ValueError, match="CRC"):
            _decode_png(bytes(payload), 4, 4)

    def test_strict_decodes_in_plan_lenient_survives_corrupt(self, spark):
        from pyspark.sql import functions as F

        from filters_spark.functions import multimodal as mm
        from filters_spark.functions.multimodal import _encode_png

        good = _encode_png([[9, 8], [7, 6]], filters=[1, 4])
        corrupt = bytearray(good)
        corrupt[40] ^= 0xFF                 # CRC-breaking IDAT flip
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, corrupt)],
            "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/png")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(2))
            .withField("meta.height", F.lit(2)))
        ok = mm.decode_images(media.where(F.col("doc_id") == 1),
                              strict=True, codec="auto").collect()
        assert list(ok[0]["pixels"]) == [9, 8, 7, 6]
        lenient = mm.decode_images(media, strict=False,
                                   codec="auto").collect()
        assert all(r["pixels"] is not None for r in lenient)
        import pytest as _pt
        with _pt.raises(Exception):
            mm.decode_images(media, strict=True, codec="auto").collect()


class TestGifCodec:
    """Real GIF87a/89a decode (multimodal._decode_gif) — the second
    genuinely-compressed image format (variable-width LZW), encoder
    twin performing real compression."""

    def test_roundtrip_small(self):
        from filters_spark.functions.multimodal import (_decode_gif,
                                                        _encode_gif)

        rows = [[10, 20, 30, 250], [40, 5, 60, 70],
                [200, 90, 100, 0], [110, 255, 120, 130]]
        out = _decode_gif(_encode_gif(rows), 4, 4)
        assert list(out) == [c for r in rows for c in r]

    def test_roundtrip_large_exercises_width_growth(self):
        """4096 pixels with low repetition push the LZW dictionary
        through several code-width bumps (9→12 bits) — the
        encoder/decoder width schedules must stay in lockstep."""
        from filters_spark.functions.multimodal import (_decode_gif,
                                                        _encode_gif)

        rows = [[(r * 131 + c * 17 + (r * c) % 7) % 256
                 for c in range(64)] for r in range(64)]
        out = _decode_gif(_encode_gif(rows), 64, 64)
        assert list(out) == [c for r in rows for c in r]

    def test_interlaced_roundtrip(self):
        from filters_spark.functions.multimodal import (_decode_gif,
                                                        _encode_gif)

        rows = [[(r * 16 + c) % 256 for c in range(8)]
                for r in range(16)]
        plain = _decode_gif(_encode_gif(rows, interlace=False), 8, 16)
        laced = _decode_gif(_encode_gif(rows, interlace=True), 8, 16)
        assert list(plain) == list(laced) == [c for r in rows for c in r]

    def test_truncated_and_garbage_rejected(self):
        import pytest as _pt

        from filters_spark.functions.multimodal import (_decode_gif,
                                                        _encode_gif)

        good = _encode_gif([[1, 2], [3, 4]])
        with _pt.raises(ValueError):
            _decode_gif(good[:20], 2, 2)
        bad = bytearray(good)
        bad[13 + 768] = 0x99               # unknown block id
        with _pt.raises(ValueError, match="block"):
            _decode_gif(bytes(bad), 2, 2)

    def test_strict_in_plan(self, spark):
        from pyspark.sql import functions as F

        from filters_spark.functions import multimodal as mm
        from filters_spark.functions.multimodal import _encode_gif

        payload = _encode_gif([[7, 8], [9, 10]])
        df = spark.createDataFrame([(1, bytearray(payload))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/gif")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(2))
            .withField("meta.height", F.lit(2)))
        px = mm.decode_images(media, strict=True,
                              codec="auto").collect()[0]["pixels"]
        assert list(px) == [7, 8, 9, 10]


class TestImaAdpcmCodec:
    """IMA/DVI ADPCM WAV (format tag 0x11): the genuinely-compressed
    audio codec beside G.711's fixed mappings — stateful 4-bit
    quantizer, step/index tables, per-block headers."""

    def test_decode_matches_hand_stepped_reference(self):
        from filters_spark.functions.multimodal import (_ima_adpcm_decode,
                                                        _ima_step)
        import struct

        nibs = [3, 9, 14, 0, 7, 8, 15, 1]
        data = struct.pack("<hBB", 100, 5, 0) + bytes(
            nibs[j] | (nibs[j + 1] << 4) for j in range(0, 8, 2))
        got = _ima_adpcm_decode(data, len(data))
        pred, idx = 100, 5
        want = [100]
        for n in nibs:
            pred, idx = _ima_step(pred, idx, n)
            want.append(pred)
        assert got == want

    def test_encode_decode_deterministic_and_tracks_signal(self):
        import math

        import numpy as np

        from filters_spark.functions.multimodal import (_ima_adpcm_decode,
                                                        _ima_adpcm_encode,
                                                        _riff_chunks)

        sig = [int(12000 * math.sin(i / 10)) for i in range(1021)]
        wav = _ima_adpcm_encode(sig, block_align=516)  # 1025/block
        chunks = _riff_chunks(wav)
        off, size = chunks[b"data"]
        out = _ima_adpcm_decode(wav[off:off + size], 516)
        dec = np.array(out[:len(sig)], dtype=np.float64)
        ref = np.array(sig, dtype=np.float64)
        # lossy but close: ADPCM tracks a smooth signal within ~2%
        assert np.abs(dec - ref).mean() < 0.02 * 12000
        # byte-deterministic: encode twice → identical payloads
        assert _ima_adpcm_encode(sig, block_align=516) == wav

    def test_resample_wav_strict_in_plan_and_stereo_rejected(self, spark):
        import struct

        from pyspark.sql import functions as F

        from filters_spark.functions import multimodal as mm
        from filters_spark.functions.multimodal import _ima_adpcm_encode

        wav = _ima_adpcm_encode([0, 500, -500, 1000], block_align=6)
        df = spark.createDataFrame([(1, bytearray(wav))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "audio/adpcm")
        out = mm.resample_audio(media, target_rate=8000,
                                strict=True).collect()
        assert out[0]["n_samples"] > 0
        # stereo: flip the channel count; strict must raise
        stereo = bytearray(wav)
        struct.pack_into("<H", stereo, 22, 2)
        df2 = spark.createDataFrame([(1, stereo)],
                                    "doc_id bigint, raw binary")
        media2 = mm.attach_meta(df2, "raw", "audio/adpcm")
        import pytest as _pt
        with _pt.raises(Exception):
            mm.resample_audio(media2, target_rate=8000,
                              strict=True).collect()
        # lenient survives it via the stub
        lenient = mm.resample_audio(media2, target_rate=8000,
                                    strict=False).collect()
        assert lenient[0]["samples"] is not None


class TestMulawCodec:
    """G.711 µ-law WAV (format tag 7): exact integer expansion."""

    def _mulaw_wav(self, data: bytes, rate=8000, n_ch=1):
        import struct
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 7, n_ch, rate,
                                        rate * n_ch, n_ch, 8)
                + b"data" + struct.pack("<I", len(data)) + data)

    def test_reference_expansion_values(self):
        import numpy as np

        from filters_spark.functions.multimodal import _mulaw_to_linear

        got = _mulaw_to_linear(
            np.array([0xFF, 0x7F, 0x00, 0x80], dtype=np.uint8))
        # the 16-bit-scaled G.711 table: silence codes -> 0, extreme
        # codes -> ±32124
        assert list(got) == [0, 0, -32124, 32124]

    def test_strict_decode_through_resample_audio(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from filters_spark.functions import multimodal as mm
        from filters_spark.functions.multimodal import _mulaw_to_linear

        data = bytes(range(0, 256, 16))          # 16 spread codes
        df = spark.createDataFrame(
            [(1, bytearray(self._mulaw_wav(data)))],
            "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "audio/basic")
        out = mm.resample_audio(media, target_rate=8000,
                                strict=True).collect()[0]
        got = np.frombuffer(bytes(out["samples"]), dtype="<i2")
        want = _mulaw_to_linear(np.frombuffer(data, np.uint8))
        assert list(got) == list(want)
        assert out["n_samples"] == 16

    def test_stereo_mulaw_mono_mixes(self, spark):
        import numpy as np

        from filters_spark.functions import multimodal as mm
        from filters_spark.functions.multimodal import _mulaw_to_linear

        data = bytes([0x00, 0xFF] * 4)           # L=max-neg, R=0
        df = spark.createDataFrame(
            [(1, bytearray(self._mulaw_wav(data, n_ch=2)))],
            "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "audio/basic")
        out = mm.resample_audio(media, target_rate=8000,
                                strict=True).collect()[0]
        got = np.frombuffer(bytes(out["samples"]), dtype="<i2")
        assert list(got) == [-16062] * 4         # mean(-32124, 0)

    def test_truncated_mulaw_lenient_falls_back_strict_raises(self, spark):
        from filters_spark.functions import multimodal as mm

        payload = self._mulaw_wav(bytes(16))[:30]   # cut inside fmt
        df = spark.createDataFrame(
            [(1, bytearray(payload))], "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "audio/basic")
        out = mm.resample_audio(media, strict=False).collect()
        assert out[0]["samples"] is not None
        import pytest as _pytest
        with _pytest.raises(Exception):
            mm.resample_audio(media, strict=True).collect()


class TestAlawCodec:
    def test_reference_expansion_values(self):
        import numpy as np

        from filters_spark.functions.multimodal import _alaw_to_linear

        got = _alaw_to_linear(
            np.array([0x55, 0xD5, 0x2A, 0xAA], dtype=np.uint8))
        assert list(got) == [-8, 8, -32256, 32256]

    def test_tag_dispatch_mulaw_vs_alaw_differ(self, spark):
        """Identical bytes behind tag 6 vs tag 7 must decode to
        DIFFERENT samples — the decoder keys on the format tag, so a
        mu-law/A-law mixup cannot pass silently."""
        import struct
        import numpy as np

        from filters_spark.functions import multimodal as mm

        data = bytes(range(16, 32))

        def wav(tag):
            return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                    + b"fmt " + struct.pack("<IHHIIHH", 16, tag, 1, 8000,
                                            8000, 1, 8)
                    + b"data" + struct.pack("<I", len(data)) + data)

        outs = {}
        for tag in (6, 7):
            df = spark.createDataFrame(
                [(1, bytearray(wav(tag)))], "doc_id bigint, raw binary")
            media = mm.attach_meta(df, "raw", "audio/basic")
            r = mm.resample_audio(media, target_rate=8000,
                                  strict=True).collect()[0]
            outs[tag] = list(np.frombuffer(bytes(r["samples"]),
                                           dtype="<i2"))
        assert outs[6] != outs[7]
        from filters_spark.functions.multimodal import (_alaw_to_linear,
                                                        _mulaw_to_linear)
        raw = np.frombuffer(data, np.uint8)
        assert outs[6] == list(_alaw_to_linear(raw))
        assert outs[7] == list(_mulaw_to_linear(raw))


class TestJpegCodec:
    """Real baseline JPEG (multimodal._decode_jpeg / _encode_jpeg) —
    ITU T.81 sequential DCT: marker walk, canonical Huffman, byte
    unstuffing, DC-diff/AC run-length entropy, dequant + IDCT,
    subsampled interleaved MCUs, restart markers."""

    def _codes(self):
        import numpy as np

        return (np.arange(16).reshape(4, 4) * 13 + 5) % 256

    def test_block_constant_exact_gray(self):
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rows = np.kron(self._codes(), np.ones((8, 8), np.int64))
        p = _encode_jpeg(rows, mode="gray", q=8)
        out = np.frombuffer(_decode_jpeg(p, 32, 32),
                            np.uint8).reshape(32, 32)
        # constant blocks + flat q=8 round-trip EXACTLY (DC-only)
        assert (out == rows).all()

    def test_block_constant_exact_420_with_restarts(self):
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rows = np.kron(self._codes(), np.ones((8, 8), np.int64))
        p = _encode_jpeg(rows, mode="420", q=8, restart_interval=1)
        assert b"\xff\xd0" in p or b"\xff\xd1" in p  # RST markers present
        out = np.frombuffer(_decode_jpeg(p, 32, 32),
                            np.uint8).reshape(32, 32)
        assert (out == rows).all()

    def test_444_exact(self):
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rows = np.kron(self._codes(), np.ones((8, 8), np.int64))
        p = _encode_jpeg(rows, mode="444", q=8)
        out = np.frombuffer(_decode_jpeg(p, 32, 32),
                            np.uint8).reshape(32, 32)
        assert (out == rows).all()

    def test_lossy_roundtrip_tolerance_and_ac_paths(self):
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (24, 40))
        p = _encode_jpeg(img, mode="gray", q=1)
        out = np.frombuffer(_decode_jpeg(p, 40, 24),
                            np.uint8).reshape(24, 40)
        # q=1 loses only float->int rounding; the full AC run-length
        # path (runs, ZRL, EOB, negative coefficients) is exercised
        assert np.abs(out.astype(int) - img).max() <= 2

    def test_zrl_long_zero_runs(self):
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        # one hot pixel per block forces >15-zero runs (ZRL symbols)
        img = np.zeros((16, 16), int)
        img[3, 12] = 255
        img[9, 1] = 200
        p = _encode_jpeg(img, mode="gray", q=1)
        out = np.frombuffer(_decode_jpeg(p, 16, 16),
                            np.uint8).reshape(16, 16)
        assert np.abs(out.astype(int) - img).max() <= 2

    def test_non_multiple_of_8_dims_edge_pad(self):
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (11, 13))
        p = _encode_jpeg(img, mode="420", q=1)
        out = np.frombuffer(_decode_jpeg(p, 13, 11),
                            np.uint8).reshape(11, 13)
        assert np.abs(out.astype(int) - img).max() <= 2

    def test_malformed_streams_rejected(self):
        import numpy as np
        import pytest as _pt

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rows = np.full((8, 8), 100)
        p = _encode_jpeg(rows, mode="gray", q=8)
        # r8: an SOF2 marker now DISPATCHES to the progressive
        # decoder; a baseline stream RELABELED progressive is
        # malformed there (a progressive scan cannot carry Ss=0 with
        # Se=63) and must still raise, not mis-decode
        sof = p.index(b"\xff\xc0")
        prog = p[:sof] + b"\xff\xc2" + p[sof + 2:]
        with _pt.raises(ValueError, match="Se=0"):
            _decode_jpeg(prog, 8, 8)
        # genuinely non-baseline, non-progressive frames still refuse
        lossless = p[:sof] + b"\xff\xc3" + p[sof + 2:]
        with _pt.raises(ValueError, match="non-baseline"):
            _decode_jpeg(lossless, 8, 8)
        with _pt.raises(ValueError):
            _decode_jpeg(p[:20], 8, 8)
        with _pt.raises(ValueError, match="SOI"):
            _decode_jpeg(b"nope", 8, 8)

    def test_strict_plan_decode_and_lenient_fallback(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from filters_spark.functions import multimodal as mm
        from filters_spark.functions.multimodal import _encode_jpeg

        rows = np.kron(self._codes(), np.ones((8, 8), np.int64))
        good = _encode_jpeg(rows, mode="420", q=8, restart_interval=2)
        df = spark.createDataFrame(
            [(1, bytearray(good))], "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "image/jpeg")
        media = media.withColumn(
            "media", F.col("media").withField("meta.width", F.lit(32))
            .withField("meta.height", F.lit(32)))
        out = mm.decode_images(media, strict=True, codec="auto").collect()
        px = np.frombuffer(bytes(out[0]["pixels"]), np.uint8)
        assert (px.reshape(32, 32) == rows).all()
        # corrupt payload: strict raises, lenient falls to the stub
        bad = good[:2] + b"\xff\xc2" + good[4:]
        dfb = spark.createDataFrame(
            [(1, bytearray(bad))], "doc_id bigint, raw binary")
        mb = mm.attach_meta(dfb, "raw", "image/jpeg")
        import pytest as _pt
        with _pt.raises(Exception):
            mm.decode_images(mb, strict=True, codec="auto").collect()
        lenient = mm.decode_images(mb, strict=False, codec="auto").collect()
        assert lenient[0]["pixels"] is not None

    def test_dc_prediction_without_restarts_differs(self):
        """DC coefficients are DIFFERENTIALLY coded: decoding must
        accumulate across blocks.  A fresh-predictor-per-block bug
        would decode block k as (code_k - code_{k-1}) instead."""
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rows = np.kron(np.array([[10, 250]]), np.ones((8, 8), np.int64))
        p = _encode_jpeg(rows, mode="gray", q=8)
        out = np.frombuffer(_decode_jpeg(p, 16, 8), np.uint8)
        assert set(out.tolist()) == {10, 250}

    def test_annexk_standard_tables_roundtrip(self):
        """Round trip through the ITU T.81 Annex K typical luminance
        tables — multi-length canonical codes (2..16 bits), the
        shape every real encoder emits; exercises the decoder's
        variable-length Huffman walk that the uniform tables
        cannot."""
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_jpeg,
                                                        _encode_jpeg)

        rows = np.kron(self._codes(), np.ones((8, 8), np.int64))
        p = _encode_jpeg(rows, mode="420", q=8, restart_interval=2,
                         tables="annexk")
        out = np.frombuffer(_decode_jpeg(p, 32, 32),
                            np.uint8).reshape(32, 32)
        assert (out == rows).all()
        rng = np.random.RandomState(5)
        img = rng.randint(0, 256, (24, 24))
        p2 = _encode_jpeg(img, mode="gray", q=1, tables="annexk")
        out2 = np.frombuffer(_decode_jpeg(p2, 24, 24),
                             np.uint8).reshape(24, 24)
        assert np.abs(out2.astype(int) - img).max() <= 2



class TestJpegProgressive:
    """Progressive JPEG (SOF2 — multimodal._decode_jpeg_progressive /
    _encode_jpeg_progressive, VERDICT r7 #7): spectral selection,
    successive approximation (DC and AC), EOB runs, correction-bit
    refinement, per-scan restarts.  Pixel comparisons are against a
    numpy dequant+IDCT reference over the SAME coefficients, so the
    entropy/progression machinery is tested coefficient-exact."""

    @staticmethod
    def _ref(coefs, q, h, w):
        import numpy as np

        from filters_spark.functions.multimodal import (_JPEG_ZZ,
                                                        _jpeg_dct_matrix)

        A = _jpeg_dct_matrix()
        by_n, bx_n = coefs.shape[:2]
        ref = np.zeros((h, w))
        for by in range(by_n):
            for bx in range(bx_n):
                nat = np.zeros(64)
                nat[_JPEG_ZZ] = coefs[by, bx].astype(np.float64)
                if not coefs[by, bx][1:].any():
                    blk = coefs[by, bx][0] * q / 8.0 + 128.0
                else:
                    blk = A.T @ (nat.reshape(8, 8) * q) @ A + 128.0
                ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = blk
        return np.round(ref).clip(0, 255).astype(np.uint8)

    def test_flat_blocks_exact_roundtrip(self):
        import numpy as np

        from filters_spark.functions.multimodal import (
            _decode_jpeg, _decode_jpeg_progressive,
            _encode_jpeg_progressive)

        rng = np.random.RandomState(7)
        rows = np.kron(rng.randint(32, 127, (4, 4)),
                       np.ones((8, 8), np.int64))
        p = _encode_jpeg_progressive(rows, q=8, al_dc=1, al_ac=1)
        out = np.frombuffer(_decode_jpeg_progressive(p, 32, 32),
                            np.uint8).reshape(32, 32)
        assert np.array_equal(out, rows.astype(np.uint8))
        # the baseline entry point dispatches SOF2 transparently
        out2 = np.frombuffer(_decode_jpeg(p, 32, 32),
                             np.uint8).reshape(32, 32)
        assert np.array_equal(out2, rows.astype(np.uint8))

    def test_restart_markers_reset_state(self):
        import numpy as np

        from filters_spark.functions.multimodal import (
            _decode_jpeg_progressive, _encode_jpeg_progressive)

        rng = np.random.RandomState(3)
        rows = np.kron(rng.randint(32, 127, (4, 4)),
                       np.ones((8, 8), np.int64))
        p = _encode_jpeg_progressive(rows, q=8, restart_interval=3,
                                     al_dc=2, al_ac=2)
        out = np.frombuffer(_decode_jpeg_progressive(p, 32, 32),
                            np.uint8).reshape(32, 32)
        assert np.array_equal(out, rows.astype(np.uint8))

    def test_dense_ac_multiband_successive_approximation(self):
        import numpy as np

        from filters_spark.functions.multimodal import (
            _decode_jpeg_progressive, _encode_jpeg_progressive)

        rng = np.random.RandomState(5)
        for trial in range(4):
            coefs = rng.randint(-40, 41, (3, 5, 64))
            coefs[rng.rand(3, 5, 64) < 0.7] = 0
            h, w = 24, 40
            p = _encode_jpeg_progressive(
                coef_blocks=coefs, size=(h, w), q=8, al_dc=2,
                ac_bands=((1, 9), (10, 35), (36, 63)), al_ac=2,
                restart_interval=trial % 3)
            got = np.frombuffer(_decode_jpeg_progressive(p, w, h),
                                np.uint8).reshape(h, w)
            assert np.array_equal(got, self._ref(coefs, 8, h, w)), trial

    def test_edge_cases(self):
        """Zero approximation levels, single band, big magnitudes,
        all-zero blocks (pure EOB runs), and the ZRL-before-
        correction-coefficient span accounting (k<=EOB folding)."""
        import numpy as np

        from filters_spark.functions.multimodal import (
            _decode_jpeg_progressive, _encode_jpeg_progressive)

        rng = np.random.RandomState(11)
        c2 = rng.randint(-20, 21, (2, 3, 64))
        c2[np.abs(c2) < 15] = 0
        c3 = rng.randint(-1000, 1001, (2, 2, 64))
        c3[np.abs(c3) < 700] = 0
        zc = np.zeros((1, 1, 64), np.int64)
        zc[0, 0, 1], zc[0, 0, 30], zc[0, 0, 60] = 8, 3, 1
        cases = [
            (c2, dict(al_dc=0, al_ac=0)),
            (c2, dict(al_dc=1, ac_bands=((1, 63),), al_ac=3)),
            (c3, dict(al_dc=3, al_ac=4)),
            (np.zeros((3, 3, 64), np.int64), dict(al_dc=1, al_ac=2)),
            (zc, dict(al_dc=1, al_ac=1)),
        ]
        for c, kw in cases:
            by_n, bx_n = c.shape[:2]
            h, w = by_n * 8, bx_n * 8
            for rst in (0, 2):
                p = _encode_jpeg_progressive(
                    coef_blocks=c, size=(h, w), q=8,
                    restart_interval=rst, **kw)
                got = np.frombuffer(_decode_jpeg_progressive(p, w, h),
                                    np.uint8).reshape(h, w)
                assert np.array_equal(got, self._ref(c, 8, h, w)), kw

    def test_fuzz_random_scan_scripts(self):
        import numpy as np

        from filters_spark.functions.multimodal import (
            _decode_jpeg_progressive, _encode_jpeg_progressive)

        rng = np.random.RandomState(20)
        for t in range(40):
            by_n, bx_n = rng.randint(1, 4), rng.randint(1, 4)
            c = rng.randint(-200, 201, (by_n, bx_n, 64))
            c[rng.rand(by_n, bx_n, 64) < rng.uniform(0.3, 0.98)] = 0
            nb = rng.randint(1, 4)
            cuts = sorted(rng.choice(range(2, 63), nb - 1,
                                     replace=False)) if nb > 1 else []
            edges = [1] + [int(x) for x in cuts] + [64]
            bands = tuple((edges[i], edges[i + 1] - 1)
                          for i in range(len(edges) - 1))
            h, w = by_n * 8, bx_n * 8
            p = _encode_jpeg_progressive(
                coef_blocks=c, size=(h, w), q=8,
                restart_interval=int(rng.randint(0, 4)),
                al_dc=int(rng.randint(0, 4)), ac_bands=bands,
                al_ac=int(rng.randint(0, 4)))
            got = np.frombuffer(_decode_jpeg_progressive(p, w, h),
                                np.uint8).reshape(h, w)
            assert np.array_equal(got, self._ref(c, 8, h, w)), t

class TestTiffCodec:
    """Real uncompressed baseline TIFF (multimodal._decode_tiff):
    II/MM byte orders, IFD walk with inline-vs-offset values,
    multi-strip reassembly, WhiteIsZero inversion."""

    def _img(self):
        import numpy as np
        rng = np.random.RandomState(4)
        return rng.randint(0, 256, (12, 17)).astype(np.uint8)

    def test_roundtrip_both_endians_and_strips(self):
        import numpy as np

        from filters_spark.functions.multimodal import (_decode_tiff,
                                                        _encode_tiff)
        img = self._img()
        for be in (False, True):
            for rps in (None, 3):
                p = _encode_tiff(img, big_endian=be, rows_per_strip=rps)
                out = np.frombuffer(_decode_tiff(p, 17, 12),
                                    np.uint8).reshape(12, 17)
                assert (out == img).all(), (be, rps)

    def test_white_is_zero_inversion(self):
        import struct

        import numpy as np

        from filters_spark.functions.multimodal import (_decode_tiff,
                                                        _encode_tiff)
        img = self._img()
        p = bytearray(_encode_tiff(img))
        ifd = struct.unpack_from("<I", p, 4)[0]
        n = struct.unpack_from("<H", p, ifd)[0]
        for i in range(n):
            off = ifd + 2 + i * 12
            if struct.unpack_from("<H", p, off)[0] == 262:
                struct.pack_into("<H", p, off + 8, 0)
        out = np.frombuffer(_decode_tiff(bytes(p), 17, 12),
                            np.uint8).reshape(12, 17)
        assert (out == 255 - img).all()

    def test_unsupported_shapes_raise(self):
        import struct

        import pytest as _pt

        from filters_spark.functions.multimodal import (_decode_tiff,
                                                        _encode_tiff)
        img = self._img()
        p = bytearray(_encode_tiff(img))
        ifd = struct.unpack_from("<I", p, 4)[0]
        n = struct.unpack_from("<H", p, ifd)[0]
        for i in range(n):
            off = ifd + 2 + i * 12
            if struct.unpack_from("<H", p, off)[0] == 259:
                struct.pack_into("<H", p, off + 8, 5)  # LZW
        with _pt.raises(ValueError, match="uncompressed"):
            _decode_tiff(bytes(p), 4, 4)
        with _pt.raises(ValueError, match="TIFF"):
            _decode_tiff(b"nope", 4, 4)


class TestVideoSceneChanges:
    """Shot-boundary detection (r11): integer SAD per consecutive Y
    plane pair, one mapInPandas pass, codec contract on compressed."""

    def _y4m(self, w, h, yframes, fps="25:1"):
        csz = (w // 2) * (h // 2)
        out = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A0:0 C420\n".encode()
        for y in yframes:
            out += b"FRAME\n" + y + bytes([128] * (2 * csz))
        return out

    def test_hand_computed_sads_and_cuts(self, spark):
        f0 = bytes(range(16))
        f1 = bytes(range(16))                     # identical: SAD 0
        f2 = bytes(range(100, 116))               # SAD = 16*100
        p = self._y4m(4, 4, [f0, f1, f2])
        df = spark.createDataFrame([(1, bytearray(p))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "video/x-yuv4mpeg")
        rows = (mm.video_scene_changes(media, threshold=100,
                                       strict=True)
                .orderBy("frame_idx").collect())
        assert [(r["frame_idx"], r["sad"], r["is_cut"])
                for r in rows] == [(1, 0, False), (2, 1600, True)]

    def test_single_frame_emits_nothing(self, spark):
        p = self._y4m(4, 4, [bytes(16)])
        df = spark.createDataFrame([(1, bytearray(p))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "video/x-yuv4mpeg")
        assert mm.video_scene_changes(media, strict=True).count() == 0

    def test_compressed_contract(self, spark):
        df = spark.createDataFrame([(1, bytearray(b"\x00fakemp4"))],
                                   "doc_id bigint, raw binary")
        media = mm.attach_meta(df, "raw", "video/mp4")
        # lenient: emits nothing (no meaningful fake SAD exists)
        assert mm.video_scene_changes(media, strict=False).count() == 0
        with pytest.raises(Exception, match="strict"):
            mm.video_scene_changes(media, strict=True).collect()
