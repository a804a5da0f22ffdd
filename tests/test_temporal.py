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


class TestDate:
    def test_iso(self, spark):
        assert_passes(spark, fs.Date(), "2024-01-02", dt.date(2024, 1, 2))

    def test_from_datetime_string(self, spark):
        assert_passes(spark, fs.Date(), "2024-01-02T23:59:59", dt.date(2024, 1, 2))

    def test_invalid(self, spark):
        assert_errors(spark, fs.Date(), "not a date", "not_date")
