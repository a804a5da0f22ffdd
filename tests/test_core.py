"""Chain/core semantics (SURVEY.md §1.2, §3): None passthrough,
first-error-wins short-circuit, composition, coercion."""

import pytest
from pyspark.sql import functions as F

import filters_spark as fs
from filters_spark.core import Chain, NoOp, Transform, coerce, null_error
from tests.conftest import assert_errors, assert_passes, run_chain


def test_none_passthrough_everywhere(spark):
    chain = fs.Strip() | fs.MaxLength(10) | fs.Choice(["a", "b"])
    assert_passes(spark, chain, None, None)


def test_required_rejects_none(spark):
    assert_errors(spark, fs.Required(), None, "empty")


def test_first_error_wins(spark):
    # 'zz' fails Choice first; MaxLength(1) would also fail but must
    # not be reported (short-circuit).
    chain = fs.Choice(["a", "b"]) | fs.MaxLength(1)
    [(clean, code)] = run_chain(spark, chain, ["zz"])
    assert code == "not_valid_choice"


def test_transform_then_check(spark):
    chain = fs.Strip() | fs.Choice(["A", "N"])
    assert_passes(spark, chain, "  A  ", "A")
    assert_errors(spark, chain, "  Z  ", "not_valid_choice")


def test_chain_flattening():
    c = fs.Strip() | fs.CaseFold() | fs.MaxLength(5)
    assert isinstance(c, Chain)
    assert len(c.steps) == 3
    c2 = c | (fs.Choice(["a"]) | fs.MinLength(1))
    assert len(c2.steps) == 5


def test_coerce_class_and_factory():
    assert isinstance(coerce(fs.Required), fs.Required)
    assert isinstance(coerce(lambda: fs.Strip()), fs.Strip)
    assert isinstance(coerce(None), NoOp)
    with pytest.raises(TypeError):
        coerce(42)


def test_noop_identity(spark):
    assert_passes(spark, NoOp(), "x", "x")


def test_transform_wrapper(spark):
    upper = Transform(F.upper, name="upper")
    assert_passes(spark, upper | fs.Choice(["AB"]), "ab", "AB")


def test_filter_macro():
    @fs.filter_macro
    def clean_flag():
        return fs.Strip() | fs.Choice(["A", "N", "R"])

    assert clean_flag.__is_filter_macro__
    c = coerce(clean_flag)
    assert isinstance(c, Chain)


def test_validator_call_on_bare_column(spark):
    df = spark.createDataFrame([("  x ",), (None,)], "v string")
    out = df.select(fs.Strip()(F.col("v")).alias("r")).collect()
    assert out[0]["r"]["value"] == "x"
    assert out[1]["r"]["value"] is None
