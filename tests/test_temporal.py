"""Temporal validators (SURVEY.md §2.2 Date/Datetime): session tz is
pinned UTC by get_spark, so naive parses are UTC."""

import datetime as dt

import filters_spark as fs
from tests.conftest import assert_errors, assert_passes, run_chain


class TestDatetime:
    def test_iso(self, spark):
        assert_passes(
            spark, fs.Datetime(), "2024-01-02T03:04:05", dt.datetime(2024, 1, 2, 3, 4, 5)
        )

    def test_date_only(self, spark):
        assert_passes(spark, fs.Datetime(), "2024-01-02", dt.datetime(2024, 1, 2))

    def test_slash_format(self, spark):
        assert_passes(spark, fs.Datetime(), "01/02/2024", dt.datetime(2024, 1, 2))

    def test_invalid(self, spark):
        assert_errors(spark, fs.Datetime(), "2024-13-40", "not_datetime")

    def test_naive_interpreted_in_zone(self, spark):
        # naive Berlin winter time = UTC+1 → 11:00 UTC
        [(clean, code)] = run_chain(
            spark, fs.Datetime(timezone="Europe/Berlin"), ["2024-01-02 12:00:00"]
        )
        assert code is None and clean == dt.datetime(2024, 1, 2, 11, 0, 0)

    def test_timestamp_input_passthrough(self, spark):
        v = dt.datetime(2024, 5, 6, 7, 8, 9)
        assert_passes(spark, fs.Datetime(), v, v, in_type="timestamp")

    def test_explicit_offset_wins_over_zone(self, spark):
        # +09:00 in the input beats the assumed zone — no double shift
        [(clean, code)] = run_chain(
            spark, fs.Datetime(timezone="Europe/Berlin"), ["2024-01-02T12:00:00+09:00"]
        )
        assert code is None and clean == dt.datetime(2024, 1, 2, 3, 0, 0)

    def test_zulu_suffix_wins_over_zone(self, spark):
        [(clean, code)] = run_chain(
            spark, fs.Datetime(timezone="Asia/Tokyo"), ["2024-01-02T12:00:00Z"]
        )
        assert code is None and clean == dt.datetime(2024, 1, 2, 12, 0, 0)

    def test_single_digit_offset_wins_over_zone(self, spark):
        # '+9:00' is valid per Spark's cast grammar — must NOT be
        # re-shifted by the assumed zone
        [(clean, code)] = run_chain(
            spark, fs.Datetime(timezone="Europe/Berlin"), ["2024-01-02T12:00:00+9:00"]
        )
        assert code is None and clean == dt.datetime(2024, 1, 2, 3, 0, 0)

    def test_region_zone_id_wins_over_zone(self, spark):
        [(clean, code)] = run_chain(
            spark, fs.Datetime(timezone="Asia/Tokyo"),
            ["2024-01-02 12:00:00 America/Los_Angeles"],
        )
        # PST = UTC-8 → 20:00 UTC; the Tokyo assumption must not apply
        assert code is None and clean == dt.datetime(2024, 1, 2, 20, 0, 0)

    def test_bare_hour_offset_after_time(self, spark):
        [(clean, code)] = run_chain(
            spark, fs.Datetime(timezone="Europe/Berlin"), ["2024-01-02 12:00:00+09"]
        )
        assert code is None and clean == dt.datetime(2024, 1, 2, 3, 0, 0)

    def test_plain_date_still_naive(self, spark):
        # a bare DATE ends in '-NN' — the offset detector must not
        # mistake it for a UTC offset (that would skip the zone shift)
        [(clean, code)] = run_chain(
            spark, fs.Datetime(timezone="Asia/Tokyo"), ["2024-01-02"]
        )
        # naive Tokyo midnight → 15:00 UTC previous day
        assert code is None and clean == dt.datetime(2024, 1, 1, 15, 0, 0)


class TestDate:
    def test_iso(self, spark):
        assert_passes(spark, fs.Date(), "2024-01-02", dt.date(2024, 1, 2))

    def test_from_datetime_string(self, spark):
        assert_passes(spark, fs.Date(), "2024-01-02T23:59:59", dt.date(2024, 1, 2))

    def test_invalid(self, spark):
        assert_errors(spark, fs.Date(), "not a date", "not_date")

    def test_tz_naive_boundary_shift(self, spark):
        # 03:00 Tokyo = 18:00 UTC the PREVIOUS day
        [(clean, code)] = run_chain(
            spark, fs.Date(timezone="Asia/Tokyo"), ["2024-01-02 03:00:00"]
        )
        assert code is None and clean == dt.date(2024, 1, 1)

    def test_tz_offset_input_no_double_shift(self, spark):
        # explicit +09:00: instant is 09:30 UTC same day — tz param inert
        [(clean, code)] = run_chain(
            spark, fs.Date(timezone="Asia/Tokyo"), ["2024-01-02 18:30:00+09:00"]
        )
        assert code is None and clean == dt.date(2024, 1, 2)

    def test_tz_property_vs_zoneinfo(self, spark):
        """Property-style sweep vs the pure-Python zoneinfo oracle:
        naive inputs across zones/hours must match dateutil-equivalent
        interpret-in-zone → UTC → .date() semantics."""
        from zoneinfo import ZoneInfo

        zones = ["Asia/Tokyo", "Europe/Berlin", "America/Los_Angeles", "UTC"]
        hours = [0, 3, 11, 15, 23]
        days = ["2024-01-02", "2024-06-15", "2023-12-31"]
        for zone in zones:
            inputs = [f"{d} {h:02d}:00:00" for d in days for h in hours]
            expected = [
                dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")
                .replace(tzinfo=ZoneInfo(zone))
                .astimezone(dt.timezone.utc)
                .date()
                for s in inputs
            ]
            got = [c for c, _ in run_chain(spark, fs.Date(timezone=zone), inputs)]
            assert got == expected, f"zone={zone}"


class TestZoneDetectionHardening:
    """Round-3 review regressions: inputs whose zone marker the old
    regex missed were silently double-shifted by the timezone param;
    typed DATE columns were shifted back a day."""

    def test_zone_marked_inputs_not_reshifted(self, spark):
        import datetime as dt
        import filters_spark as fs
        from tests.conftest import run_chain
        cases = {
            "2024-01-02 12:00:00 UTC": dt.datetime(2024, 1, 2, 12, 0),
            "2024-01-02 12:00:00 GMT": dt.datetime(2024, 1, 2, 12, 0),
            "2024-01-02 12:00:00.5+09": dt.datetime(2024, 1, 2, 3, 0, 0,
                                                    500000),
            "2024-01-02 12:00:00+09:00": dt.datetime(2024, 1, 2, 3, 0),
            "2024-01-02 12:00:00Z": dt.datetime(2024, 1, 2, 12, 0),
            # naive: interpreted in Tokyo
            "2024-01-02 12:00:00": dt.datetime(2024, 1, 2, 3, 0),
            # naive DATE: midnight Tokyo -> previous day 15:00 UTC
            "2024-01-02": dt.datetime(2024, 1, 1, 15, 0),
        }
        got = run_chain(spark, fs.Datetime(timezone="Asia/Tokyo"),
                        list(cases))
        for (raw, exp), (clean, code) in zip(cases.items(), got):
            assert code is None, raw
            assert clean == exp, (raw, clean, exp)

    def test_typed_date_not_shifted(self, spark):
        import datetime as dt
        from pyspark.sql import functions as F
        import filters_spark as fs
        from filters_spark.core import null_error
        df = spark.createDataFrame([(dt.date(2024, 1, 2),)], "d date")
        v = fs.Date(timezone="Asia/Tokyo").specialize(
            df.schema["d"].dataType)
        c, e = v.build(F.col("d"), null_error(), "d")
        assert df.select(c.alias("out")).head()["out"] == dt.date(2024, 1, 2)

    def test_typed_timestamp_still_shifted(self, spark):
        import datetime as dt
        from pyspark.sql import functions as F
        import filters_spark as fs
        from filters_spark.core import null_error
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 2, 1, 0),)], "t timestamp")
        v = fs.Date(timezone="Asia/Tokyo").specialize(
            df.schema["t"].dataType)
        c, e = v.build(F.col("t"), null_error(), "t")
        # 01:00 Tokyo wall clock = previous day 16:00 UTC
        assert df.select(c.alias("out")).head()["out"] == dt.date(2024, 1, 1)
