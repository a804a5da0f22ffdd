"""Pandas-UDF fallback leaves (SURVEY.md §4.4, §7.3 milestone 7).
Each is compared against its scalar Python oracle."""

import datetime as dt
import unicodedata

import filters_spark as fs
from filters_spark.operators import udf
from tests.conftest import assert_errors, assert_passes, run_chain


class TestCall:
    def test_arbitrary_callable(self, spark):
        rev = udf.Call(lambda s: s[::-1], "string")
        assert_passes(spark, rev, "abc", "cba")

    def test_none_propagates(self, spark):
        rev = udf.Call(lambda s: s[::-1], "string")
        assert_passes(spark, rev, None, None)

    def test_error_on_none(self, spark):
        parse = udf.Call(
            lambda s: s if s.startswith("ok") else None,
            "string", error_on_none=True, code="bad_prefix",
        )
        assert_errors(spark, parse, "nope", "bad_prefix")

    def test_udf_executes_once_per_row_staged(self, spark, tmp_path):
        # In the staged ValidationSchema path, error_on_none validators
        # must run the Python body once per row — the UDF result is
        # materialized as a named stage column and both the value and
        # the error derive from it (substep split in operators/udf.py).
        marker = str(tmp_path / "calls.log")

        def traced(s):
            with open(marker, "a") as f:
                f.write("x\n")
            return s if s.startswith("ok") else None

        schema = fs.ValidationSchema(
            {"v": udf.Call(traced, "string", error_on_none=True, code="bad")}
        )
        df = spark.createDataFrame(
            [("ok1",), ("nope",), ("ok2",), ("bad",)], "v string"
        ).coalesce(1)
        rows = schema.apply(df).collect()
        got = [(r["v"], r["_errors"][0]["code"] if r["_errors"] else None)
               for r in rows]
        assert sorted(got, key=str) == sorted(
            [("ok1", None), (None, "bad"), ("ok2", None), (None, "bad")], key=str)
        with open(marker) as f:
            calls = len(f.readlines())
        assert calls == 4, f"UDF ran {calls}x for 4 rows"


class TestUnicodeNFC:
    def test_nfd_to_nfc(self, spark):
        nfd = unicodedata.normalize("NFD", "é")
        assert len(nfd) == 2
        assert_passes(spark, udf.UnicodeNFC(), nfd, "é")


class TestCaseFoldExact:
    def test_eszett(self, spark):
        # the case lower() cannot do: ß → ss
        assert_passes(spark, udf.CaseFoldExact(), "STRASSE-ß", "strasse-ss")


class TestDatetimeFuzzy:
    def test_freeform(self, spark):
        [(clean, code)] = run_chain(
            spark, udf.DatetimeFuzzy(), ["Jan 2 2024 3:04pm"]
        )
        assert code is None and clean == dt.datetime(2024, 1, 2, 15, 4)

    def test_unparseable(self, spark):
        assert_errors(spark, udf.DatetimeFuzzy(), "not a date", "not_datetime")


class TestIpV6Normalize:
    def test_rfc5952_compression(self, spark):
        assert_passes(
            spark, udf.IpV6Normalize(), "2001:0db8:0000:0000:0000:0000:0000:0001",
            "2001:db8::1",
        )

    def test_invalid(self, spark):
        assert_errors(spark, udf.IpV6Normalize(), "zz::1::", "not_ip_address")


class TestMaxBytesTruncate:
    def test_boundary_safe(self, spark):
        # 'éé' = 4 bytes; budget 3 must cut at the codepoint boundary
        assert_passes(spark, udf.MaxBytesTruncate(3), "éé", "é")

    def test_under_budget_unchanged(self, spark):
        assert_passes(spark, udf.MaxBytesTruncate(10), "abc", "abc")

    def test_exact_boundary_keeps_codepoint(self, spark):
        # r8 fix: a cut landing EXACTLY on a codepoint boundary keeps
        # that codepoint — 12-byte budget fits four 3-byte euros (the
        # old backoff stripped the complete final char to three)
        assert_passes(spark, udf.MaxBytesTruncate(12),
                      "€" * 5, "€" * 4)
        assert_passes(spark, udf.MaxBytesTruncate(12),
                      "é" * 7, "é" * 6)

    def test_prefix_budget(self, spark):
        # prefix consumes budget; remainder cut at a boundary
        assert_passes(spark, udf.MaxBytesTruncate(6, prefix=".."),
                      "abcdefgh", "..abcd")

    def test_chain_short_circuit_skips_udf(self, spark):
        # upstream error nulls the value; the UDF sees None and no-ops
        chain = fs.Choice(["ok"]) | udf.Call(lambda s: s.upper(), "string")
        [(clean, code)] = run_chain(spark, chain, ["bad"])
        assert code == "not_valid_choice" and clean is None
