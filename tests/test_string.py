"""String validators (SURVEY.md §2.4)."""

import base64

import filters_spark as fs
from tests.conftest import assert_errors, assert_passes, run_chain


class TestStrip:
    def test_whitespace(self, spark):
        assert_passes(spark, fs.Strip(), "  hi  ", "hi")

    def test_unprintables(self, spark):
        assert_passes(spark, fs.Strip(), "\x00hi\x07", "hi")

    def test_custom_patterns(self, spark):
        assert_passes(
            spark, fs.Strip(leading="x+", trailing="y+", strip_unprintable=False),
            "xxhiyy", "hi",
        )


class TestCaseFold:
    def test_lower(self, spark):
        assert_passes(spark, fs.CaseFold(), "AbC", "abc")


class TestSplit:
    def test_array(self, spark):
        assert_passes(spark, fs.Split(":"), "a:b:c", ["a", "b", "c"])

    def test_keyed(self, spark):
        [(clean, code)] = run_chain(spark, fs.Split(":", keys=["x", "y"]), ["a:b"])
        assert code is None
        assert clean.asDict() == {"x": "a", "y": "b"}

    def test_keyed_wrong_parts(self, spark):
        assert_errors(spark, fs.Split(":", keys=["x", "y"]), "a:b:c", "wrong_parts")


class TestRegex:
    def test_all_matches(self, spark):
        assert_passes(spark, fs.Regex("[0-9]+"), "a1b22", ["1", "22"])

    def test_no_match_errors(self, spark):
        assert_errors(spark, fs.Regex("[0-9]+"), "abc", "malformed")


class TestMaxBytes:
    def test_check_ok(self, spark):
        assert_passes(spark, fs.MaxBytes(5), "abc", "abc")

    def test_check_too_long_multibyte(self, spark):
        # 'éé' = 4 utf-8 bytes
        assert_errors(spark, fs.MaxBytes(3), "éé", "too_long")

    def test_truncate_at_codepoint_boundary(self, spark):
        [(clean, code)] = run_chain(spark, fs.MaxBytes(3, truncate=True), ["éé"])
        assert code is None and clean == "é"


class TestBase64:
    def test_standard(self, spark):
        raw = base64.b64encode(b"hello").decode()
        assert_passes(spark, fs.Base64Decode(), raw, bytearray(b"hello"))

    def test_urlsafe_unpadded(self, spark):
        raw = base64.urlsafe_b64encode(b"he~~o").decode().rstrip("=")
        assert_passes(spark, fs.Base64Decode(), raw, bytearray(b"he~~o"))

    def test_illegal_chars(self, spark):
        assert_errors(spark, fs.Base64Decode(), "a!!#", "not_base64")

    def test_impossible_length(self, spark):
        assert_errors(spark, fs.Base64Decode(), "abcde", "not_base64")


class TestUuid:
    CANON = "0f9a5983-8e7d-4f29-a9aa-9e504bcf56cf"

    def test_canonical(self, spark):
        assert_passes(spark, fs.Uuid(), self.CANON, self.CANON)

    def test_uppercase_braced(self, spark):
        assert_passes(spark, fs.Uuid(), "{" + self.CANON.upper() + "}", self.CANON)

    def test_urn_prefix(self, spark):
        assert_passes(spark, fs.Uuid(), "urn:uuid:" + self.CANON, self.CANON)

    def test_unhyphenated(self, spark):
        assert_passes(spark, fs.Uuid(), self.CANON.replace("-", ""), self.CANON)

    def test_garbage(self, spark):
        assert_errors(spark, fs.Uuid(), "not-a-uuid", "not_uuid")

    def test_version_check(self, spark):
        assert_passes(spark, fs.Uuid(version=4), self.CANON, self.CANON)
        assert_errors(spark, fs.Uuid(version=1), self.CANON, "wrong_version")


class TestUnicode:
    def test_line_endings(self, spark):
        assert_passes(spark, fs.Unicode(), "a\r\nb\rc", "a\nb\nc")

    def test_strips_unprintables_keeps_tabs(self, spark):
        assert_passes(spark, fs.Unicode(), "a\x00b\tc", "ab\tc")

    def test_from_binary(self, spark):
        assert_passes(
            spark, fs.Unicode(from_binary=True), bytearray(b"hi"), "hi", in_type="binary"
        )


class TestIpAddress:
    def test_v4_ok(self, spark):
        assert_passes(spark, fs.IpAddress(), "10.0.0.1", "10.0.0.1")

    def test_v4_out_of_range(self, spark):
        assert_errors(spark, fs.IpAddress(), "256.1.1.1", "not_ip_address")

    def test_v6(self, spark):
        chain = fs.IpAddress(ipv4=False, ipv6=True)
        assert_passes(spark, chain, "2001:DB8::1", "2001:db8::1")
        assert_passes(spark, chain, "::1", "::1")
        assert_errors(spark, chain, "10.0.0.1", "not_ip_address")

    def test_both(self, spark):
        chain = fs.IpAddress(ipv4=True, ipv6=True)
        assert_passes(spark, chain, "10.0.0.1", "10.0.0.1")
        assert_passes(spark, chain, "::1", "::1")


class TestJsonDecode:
    def test_typed(self, spark):
        [(clean, code)] = run_chain(spark, fs.JsonDecode("k int"), ['{"k": 3}'])
        assert code is None and clean.asDict() == {"k": 3}

    def test_invalid(self, spark):
        assert_errors(spark, fs.JsonDecode("k int"), "{bad", "not_json")

    def test_variant_schemaless(self, spark):
        [(clean, code)] = run_chain(spark, fs.JsonDecode(), ["[1,2]"])
        assert code is None and clean is not None


class TestRegexDialectReport:
    """Java-vs-Python regex dialect audit (r5 VERDICT missing #4)."""

    def test_clean_patterns_report_nothing(self):
        from filters_spark import macros
        from filters_spark.operators.string import regex_dialect_report

        for pat in (r"[0-9]+", r"^\w+@\w+$", r"a(?:b|c)*d", r"(?i)foo",
                    macros.EMAIL_RE, macros.URL_RE, macros.SLUG_RE,
                    macros.HEX_COLOR_RE, macros.PHONE_E164_RE):
            assert regex_dialect_report(pat) == [], pat

    def test_each_hazard_flagged(self):
        from filters_spark.operators.string import regex_dialect_report

        cases = {
            r"foo\Z": r"\Z",
            r"foo\z": r"\z",
            r"\p{L}+": r"\p{...}",
            r"[a-z&&[^bc]]": "[..&&..]",
            r"\h+": r"\h/\H/\V",
            r"\v+": r"\v",
            r"a\R b": r"\R",
            r"[[:alpha:]]": "[[:class:]]",
        }
        for pat, construct in cases.items():
            got = [c for c, _n in regex_dialect_report(pat)]
            assert construct in got, (pat, got)

    def test_escaped_backslash_not_false_positive(self):
        from filters_spark.operators.string import regex_dialect_report

        # literal backslash followed by Z / v: not the anchor / class
        assert regex_dialect_report("a\\\\Z") == []
        assert regex_dialect_report("a\\\\v") == []
