"""ISO extension family (SURVEY.md §2.7; VERDICT r7 Next #3) —
public ``filters-iso`` (Country/Currency/Locale) and
``filters-macaddress`` parity, plus integrity of the generated
tables against the live JVM's CLDR data."""

import pytest

from conftest import run_chain

from filters_spark.operators.iso import (
    Country,
    Currency,
    Locale,
    MacAddress,
)


def one(spark, chain, value):
    [(clean, code)] = run_chain(spark, chain, [value])
    return clean, code


class TestCountry:
    def test_alpha2_canonical(self, spark):
        vals = ["us", "US", " de ", "GB", "Fr"]
        got = run_chain(spark, Country(), vals)
        assert got == [("US", None), ("US", None), ("DE", None),
                       ("GB", None), ("FR", None)]

    def test_alpha3_accepted(self, spark):
        got = run_chain(spark, Country(), ["USA", "deu", "gbr", "CHE"])
        assert got == [("US", None), ("DE", None), ("GB", None),
                       ("CH", None)]

    def test_to_alpha3(self, spark):
        got = run_chain(spark, Country(to="alpha3"), ["us", "DEU", "ch"])
        assert got == [("USA", None), ("DEU", None), ("CHE", None)]

    def test_invalid(self, spark):
        for bad in ["XZ", "USAA", "U", "", "united states"]:
            clean, code = one(spark, Country(), bad)
            assert code == "invalid_country", bad
            assert clean is None

    def test_none_passes_through(self, spark):
        assert run_chain(spark, Country(), [None]) == [(None, None)]

    def test_bad_to_raises(self):
        with pytest.raises(ValueError):
            Country(to="numeric")


class TestCurrency:
    def test_alpha_canonical(self, spark):
        got = run_chain(spark, Currency(), ["usd", "EUR", " jpy ", "Chf"])
        assert got == [("USD", None), ("EUR", None), ("JPY", None),
                       ("CHF", None)]

    def test_numeric_accepted(self, spark):
        # 840=USD, 978=EUR, 392=JPY, 008=ALL (leading-zero case,
        # with and without the zeros)
        got = run_chain(spark, Currency(), ["840", "978", "392", "008", "8"])
        assert got == [("USD", None), ("EUR", None), ("JPY", None),
                       ("ALL", None), ("ALL", None)]

    def test_invalid(self, spark):
        for bad in ["XXX1", "dollars", "", "9999"]:
            clean, code = one(spark, Currency(), bad)
            assert code == "invalid_currency", bad
            assert clean is None


class TestLocale:
    def test_canonical_casing(self, spark):
        got = run_chain(spark, Locale(),
                        ["en-us", "EN_US", "sr-latn-rs", "zh_HANT_TW",
                         "fr", "es-419"])
        assert got == [("en_US", None), ("en_US", None),
                       ("sr_Latn_RS", None), ("zh_Hant_TW", None),
                       ("fr", None), ("es_419", None)]

    def test_three_letter_language_syntactic(self, spark):
        assert one(spark, Locale(), "haw-US") == ("haw_US", None)

    def test_invalid(self, spark):
        for bad in ["english", "qq", "en-USA-x", "en_ZZ", "", "e"]:
            clean, code = one(spark, Locale(), bad)
            assert code == "invalid_locale", bad
            assert clean is None


class TestMacAddress:
    def test_forms_canonicalized(self, spark):
        vals = ["AA:BB:CC:DD:EE:FF", "aa-bb-cc-dd-ee-ff",
                "aabb.ccdd.eeff", "aabbccddeeff", " 01:23:45:67:89:AB "]
        got = run_chain(spark, MacAddress(), vals)
        assert [g[0] for g in got] == [
            "aa:bb:cc:dd:ee:ff", "aa:bb:cc:dd:ee:ff",
            "aa:bb:cc:dd:ee:ff", "aa:bb:cc:dd:ee:ff",
            "01:23:45:67:89:ab"]
        assert all(g[1] is None for g in got)

    def test_custom_sep(self, spark):
        assert one(spark, MacAddress(sep="-"), "aabbccddeeff") == (
            "aa-bb-cc-dd-ee-ff", None)

    def test_invalid(self, spark):
        for bad in ["aa:bb:cc:dd:ee", "aabbccddeefg", "", "aa bb cc dd ee ff"]:
            clean, code = one(spark, MacAddress(), bad)
            assert code == "invalid_mac_address", bad
            assert clean is None


class TestRegistry:
    def test_iso_validators_registered(self):
        import filters_spark as fs

        for name in ("Country", "Currency", "Locale", "MacAddress"):
            assert name in fs.ext.names()

    def test_usable_through_schema(self, spark):
        import filters_spark as fs
        from filters_spark.schema import ERRORS_COL
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("us",), ("xx",), ("DEU",)], "country string")
        res = fs.ValidationSchema({"country": fs.ext.Country}) \
            .validate(df)
        rows = res.validated.select(
            "country", F.size(ERRORS_COL).alias("n_err")).collect()
        got = sorted(((r["country"] or "", r["n_err"]) for r in rows))
        assert got == [("", 1), ("DE", 0), ("US", 0)]


class TestFullTableFunctional:
    def test_every_country_code_canonicalizes(self, spark):
        """ALL table entries through the real expression in one job:
        alpha-2 lowercased and alpha-3 mixed-case each map to the
        canonical alpha-2."""
        from filters_spark.operators._isodata import COUNTRIES

        rows = []
        for a2, a3 in COUNTRIES:
            rows.append((a2.lower(), a2))
            if a3:
                rows.append((a3[0] + a3[1:].lower(), a2))
        got = run_chain(spark, Country(), [r[0] for r in rows])
        for (inp, want), (clean, code) in zip(rows, got):
            assert code is None and clean == want, (inp, clean, code)

    def test_every_currency_code_canonicalizes(self, spark):
        from collections import Counter

        from filters_spark.operators._isodata import CURRENCIES

        counts = Counter(num for _, num in CURRENCIES)
        rows = []
        for code, num in CURRENCIES:
            rows.append((code.lower(), code))
            if num > 0 and counts[num] == 1:
                rows.append((f"{num:03d}", code))
        got = run_chain(spark, Currency(), [r[0] for r in rows])
        for (inp, want), (clean, ecode) in zip(rows, got):
            assert ecode is None and clean == want, (inp, clean, ecode)

    def test_ambiguous_numeric_rejects(self, spark):
        # 532 = ANG and its successor XCG, 891 = YUM/CSD — an
        # ambiguous numeric cannot canonicalize and must reject
        for bad in ["532", "891", "000"]:
            [(clean, code)] = run_chain(spark, Currency(), [bad])
            assert code == "invalid_currency" and clean is None, bad


class TestTableIntegrity:
    def test_tables_match_live_jvm(self, spark):
        """The committed _isodata tables must equal what the running
        JVM's CLDR data produces — a JDK bump that revises ISO data
        fails here instead of silently diverging."""
        import sys
        sys.path.insert(0, "tools")
        from gen_isodata import extract

        from filters_spark.operators import _isodata as d

        countries, currencies, languages = extract(spark)
        assert tuple(tuple(c) for c in countries) == d.COUNTRIES
        assert tuple(tuple(c) for c in currencies) == d.CURRENCIES
        assert tuple(languages) == d.LANGUAGES
