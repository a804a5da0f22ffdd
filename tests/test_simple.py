"""Per-operator tests for simple validators (SURVEY.md §2.2),
mirroring the reference's case matrix: happy path, None passthrough,
boundaries, error codes ported verbatim."""

import filters_spark as fs
from tests.conftest import assert_errors, assert_passes


class TestRequired:
    def test_value_passes(self, spark):
        assert_passes(spark, fs.Required("chars"), "x", "x")

    def test_none_fails(self, spark):
        assert_errors(spark, fs.Required("chars"), None, "empty")

    def test_empty_string_fails(self, spark):
        assert_errors(spark, fs.Required("chars"), "", "empty")

    def test_scalar_kind_null_only(self, spark):
        assert_passes(spark, fs.Required("scalar"), "", "")


class TestNotEmpty:
    def test_none_passes_by_default(self, spark):
        assert_passes(spark, fs.NotEmpty(), None, None)

    def test_empty_fails(self, spark):
        assert_errors(spark, fs.NotEmpty(), "", "empty")

    def test_allow_none_false(self, spark):
        assert_errors(spark, fs.NotEmpty(allow_none=False), None, "empty")


class TestEmpty:
    def test_empty_passes(self, spark):
        assert_passes(spark, fs.Empty(), "", "")

    def test_nonempty_fails(self, spark):
        assert_errors(spark, fs.Empty(), "x", "not_empty")

    def test_none_passes(self, spark):
        assert_passes(spark, fs.Empty(), None, None)


class TestOptional:
    def test_none_replaced(self, spark):
        assert_passes(spark, fs.Optional("dflt"), None, "dflt")

    def test_empty_replaced(self, spark):
        assert_passes(spark, fs.Optional("dflt"), "", "dflt")

    def test_value_kept(self, spark):
        assert_passes(spark, fs.Optional("dflt"), "x", "x")


class TestChoice:
    def test_in_set(self, spark):
        assert_passes(spark, fs.Choice(["a", "b"]), "a", "a")

    def test_out_of_set(self, spark):
        assert_errors(spark, fs.Choice(["a", "b"]), "c", "not_valid_choice")

    def test_case_insensitive(self, spark):
        assert_passes(spark, fs.Choice(["A"], case_sensitive=False), "a", "a")


class TestLengths:
    def test_length_exact(self, spark):
        assert_passes(spark, fs.Length(3), "abc", "abc")
        assert_errors(spark, fs.Length(3), "ab", "wrong_length")

    def test_min_length(self, spark):
        assert_passes(spark, fs.MinLength(2), "ab", "ab")
        assert_errors(spark, fs.MinLength(2), "a", "too_short")

    def test_max_length(self, spark):
        assert_passes(spark, fs.MaxLength(2), "ab", "ab")
        assert_errors(spark, fs.MaxLength(2), "abc", "too_long")

    def test_array_kind(self, spark):
        assert_passes(
            spark, fs.MinLength(1, kind="items"), ["a"], ["a"], in_type="array<string>"
        )
        assert_errors(
            spark, fs.MinLength(1, kind="items"), [], "too_short", in_type="array<string>"
        )


class TestByteArray:
    def test_encodes(self, spark):
        assert_passes(spark, fs.ByteArray(), "ab", bytearray(b"ab"))

    # run_chain builds the chain directly, so the plan-time dtype
    # specialization ValidationSchema performs is applied here by hand
    @staticmethod
    def _ints():
        from pyspark.sql.types import ArrayType, IntegerType

        return fs.ByteArray().specialize(ArrayType(IntegerType()))

    def test_int_array_packs(self, spark):
        assert_passes(
            spark, self._ints(), [0, 1, 255], bytearray(b"\x00\x01\xff"),
            in_type="array<int>",
        )

    def test_int_array_empty(self, spark):
        assert_passes(spark, self._ints(), [], bytearray(b""), in_type="array<int>")

    def test_int_array_out_of_range(self, spark):
        assert_errors(spark, self._ints(), [1, 256], "out_of_range",
                      in_type="array<int>")
        assert_errors(spark, self._ints(), [-1], "out_of_range",
                      in_type="array<int>")

    def test_binary_identity(self, spark):
        from pyspark.sql.types import BinaryType

        assert_passes(spark, fs.ByteArray().specialize(BinaryType()),
                      bytearray(b"xy"), bytearray(b"xy"), in_type="binary")

    def test_schema_specializes_int_array(self, spark):
        # end-to-end through ValidationSchema (the real dispatch path)
        df = spark.createDataFrame([([72, 105],)], "ba array<int>")
        out = fs.ValidationSchema({"ba": fs.ByteArray()}).validate(df)
        [row] = out.clean.collect()
        assert bytes(row.ba) == b"Hi"
