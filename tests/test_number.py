"""Number validators (SURVEY.md §2.3).  The watch-list items
(§7.4): '1.5' must NOT become 1; NaN/Inf must error; Round is
HALF_UP."""

from decimal import Decimal

import filters_spark as fs
from tests.conftest import assert_errors, assert_passes, run_chain


class TestInt:
    def test_int_string(self, spark):
        assert_passes(spark, fs.Int(), "42", 42)

    def test_padded_int(self, spark):
        assert_passes(spark, fs.Int(), " 7 ", 7)

    def test_non_integral_rejected(self, spark):
        assert_errors(spark, fs.Int(), "1.5", "not_int")

    def test_integral_float_string(self, spark):
        assert_passes(spark, fs.Int(), "3.0", 3)

    def test_not_numeric(self, spark):
        assert_errors(spark, fs.Int(), "abc", "not_numeric")

    def test_none_passthrough(self, spark):
        assert_passes(spark, fs.Int(), None, None)

    def test_from_long_input(self, spark):
        assert_passes(spark, fs.Int(), 5, 5, in_type="bigint")

    def test_from_double_non_integral(self, spark):
        assert_errors(spark, fs.Int(), 2.5, "not_int", in_type="double")

    def test_scientific_notation(self, spark):
        assert_passes(spark, fs.Int(), "1E3", 1000)

    def test_java_float_syntax_rejected(self, spark):
        # Java parseDouble accepts 'D'/'f' suffixes and hex floats;
        # the reference (Python-Decimal grammar) does not
        for bad in ("0D", "1f", "2.5d", "0x1p3"):
            assert_errors(spark, fs.Int(), bad, "not_numeric")

    def test_double_overflow_and_underflow_strings(self, spark):
        assert_errors(spark, fs.Int(), "1e309", "too_big")     # double → +Inf
        assert_errors(spark, fs.Int(), "-1e309", "too_big")
        assert_errors(spark, fs.Int(), "1e-999", "not_int")    # double → 0.0
        assert_passes(spark, fs.Int(), "0e1", 0)               # true zero
        assert_passes(spark, fs.Int(), "0.00e99", 0)

    def test_float_specialized_long_boundary(self, spark):
        # float(2**63 - 1) rounds UP to exactly 2**63, which is OUT of
        # long range — the specialized float path must flag it too_big
        # (matching the string path), never silently saturate.
        from pyspark.sql.types import DoubleType
        iv = fs.Int().specialize(DoubleType())
        assert_errors(spark, iv, float(2**63), "too_big", in_type="double")
        assert_errors(spark, iv, float(2**64), "too_big", in_type="double")
        # largest double below 2**63 and the exact lower bound are legal
        assert_passes(spark, iv, float(2**63 - 1024), 2**63 - 1024, in_type="double")
        assert_passes(spark, iv, float(-(2**63)), -(2**63), in_type="double")
        # string path agrees on the same boundary
        assert_errors(spark, fs.Int(), str(2**63), "too_big")
        assert_passes(spark, fs.Int(), str(2**63 - 1), 2**63 - 1)


class TestDecimal:
    def test_parse(self, spark):
        assert_passes(spark, fs.DecimalOf(scale=2), "3.14", Decimal("3.14"))

    def test_nan_rejected(self, spark):
        assert_errors(spark, fs.DecimalOf(), float("nan"), "not_finite", in_type="double")

    def test_inf_rejected(self, spark):
        assert_errors(spark, fs.DecimalOf(), float("inf"), "not_finite", in_type="double")

    def test_nan_string_rejected(self, spark):
        assert_errors(spark, fs.DecimalOf(), "NaN", "not_finite")

    def test_garbage_rejected(self, spark):
        assert_errors(spark, fs.DecimalOf(), "12x", "not_numeric")


class TestMinMax:
    def test_min_inclusive(self, spark):
        assert_passes(spark, fs.Min(0), 0, 0, in_type="bigint")
        assert_errors(spark, fs.Min(0), -1, "too_small", in_type="bigint")

    def test_min_exclusive(self, spark):
        assert_errors(spark, fs.Min(0, exclusive=True), 0, "too_small", in_type="bigint")

    def test_max_inclusive(self, spark):
        assert_passes(spark, fs.Max(10), 10, 10, in_type="bigint")
        assert_errors(spark, fs.Max(10), 11, "too_big", in_type="bigint")

    def test_range_chain(self, spark):
        chain = fs.Min(0) | fs.Max(1)
        assert_passes(spark, chain, 0.5, 0.5, in_type="double")
        assert_errors(spark, chain, 1.5, "too_big", in_type="double")


class TestRound:
    def test_half_up(self, spark):
        # HALF_UP: 2.5 → 3 (bround/HALF_EVEN would give 2)
        [(clean, code)] = run_chain(spark, fs.Round(1, scale=0), [2.5], "double")
        assert code is None and clean == Decimal("3")

    def test_to_nearest_quarter(self, spark):
        [(clean, code)] = run_chain(spark, fs.Round("0.25", scale=2), [0.30], "double")
        assert code is None and clean == Decimal("0.25")
