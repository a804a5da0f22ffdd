"""Numeric validators (reference ``filters/number.py`` — SURVEY.md §2.3).

Hard-won semantics preserved (SURVEY.md §7.4):

* ``Int``: `'1.5'` must ERROR (``not_int``), never silently truncate.
  Implemented as ``try_cast → decimal`` + integrality check.
* ``Decimal``: NaN / ±Inf must ERROR (``not_finite``), not propagate.
* ``Round``: reference rounds HALF_UP — Spark ``round`` is HALF_UP
  (``bround`` is HALF_EVEN and is deliberately NOT used).

Everything is `try_cast`-based: no ANSI-off blanket casts, no silent
coercions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
)

from ..core import FieldRef, Predicate, Validator, make_error

__all__ = ["Int", "DecimalOf", "Min", "Max", "Round"]

# Wide-enough intermediate for parsing numeric strings.
_DEC = "decimal(38,18)"

_INTEGRAL = (ByteType, ShortType, IntegerType, LongType)
_FLOATING = (FloatType, DoubleType)

LONG_MIN, LONG_MAX = -(2**63), 2**63 - 1


class Int(Validator):
    """→ LongType; accepts numeric strings / decimals only if integral
    (reference ``filters/number.py::Int``: no silent truncation).

    Plan-time specialization (the 100 TB path): on an already-integral
    column this becomes a bare ``cast(long)`` with no error branch; on
    float/decimal it checks integrality natively — the
    string-roundtrip parse below only runs for string inputs.
    """

    name = "int"
    preserves_type = False

    def specialize(self, dtype) -> Validator:
        if isinstance(dtype, _INTEGRAL):
            return _IntFromIntegral()
        if isinstance(dtype, _FLOATING):
            return _IntFromFloat()
        if isinstance(dtype, DecimalType):
            return _IntFromDecimal()
        return self

    def _parsed(self, col: Column) -> Column:
        return col.try_cast(_DEC)

    def transform(self, col: Column) -> Column:
        s = F.trim(col.cast("string"))
        # '0.00e99' is value zero but overflows decimal(38,18)'s
        # exponent — the error() zero-mantissa analysis admits it, so
        # the transform must produce 0 (non-zero d-NULL cases error out
        # and null at end-of-chain anyway).
        return F.coalesce(
            self._parsed(s).cast("long"),
            F.when(s.try_cast("double") == F.lit(0.0), F.lit(0).cast("long")),
        )

    def error(self, col: Column, field: FieldRef) -> Column:
        # Two parses: decimal(38,18) for exact integrality, double as
        # the fallback classifier for magnitudes decimal can't hold
        # (property-tested against a pure-Python Decimal oracle —
        # '4.3e+40' must be too_big, not not_numeric; '1e-50' must be
        # not_int via the double's fractional part after the decimal
        # parse rounds it to zero).
        s = F.trim(col.cast("string"))
        d = s.try_cast(_DEC)
        dbl = s.try_cast("double")
        nn = col.isNotNull()
        # Strict numeric grammar (Python-Decimal's): Spark's
        # string→double cast uses Java parseDouble, which also accepts
        # '0D'/'1f' suffixes and hex floats — those must be
        # not_numeric, so syntax is checked explicitly rather than
        # inferred from cast success.  NaN/Infinity spellings fail the
        # grammar too (→ not_numeric, matching the old isnan/inf
        # branches).
        syntax_ok = s.rlike(r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$")
        not_numeric = nn & ~syntax_ok
        # Grammar-valid strings always double-parse; ±Inf here means
        # double OVERFLOW (|x| >= ~1.8e308 >> 2^63) → too_big.
        inf_overflow = F.abs(dbl) == F.lit(float("inf"))
        finite = syntax_ok & ~inf_overflow
        # F.floor(double) yields LONG — meaningless (overflowed) for
        # |x| >= 2^63, so the double integrality check only applies in
        # long range; anything finite beyond that is integral at
        # double precision and classifies as too_big.
        in_long_range = finite & (F.abs(dbl) < F.lit(float(2**63)))
        # Double UNDERFLOW: a nonzero mantissa that rounds to 0.0 (e.g.
        # '1e-999') is a tiny non-integral value, not a clean zero.
        # Exponent digits must not trigger this ('0e1' IS zero), hence
        # the mantissa-only extract.
        mantissa_nonzero = F.regexp_extract(s, r"^[+-]?([0-9.]*)", 1).rlike("[1-9]")
        not_integral = nn & (
            (d.isNotNull() & (d != F.floor(d).cast(_DEC)))
            | (in_long_range & (dbl != F.floor(dbl)))
            | (finite & (dbl == F.lit(0.0)) & mantissa_nonzero)
        )
        # d NULL with a ZERO value ('0.00e99': exponent overflows
        # decimal(38,18) but the value is 0) is not an overflow.
        overflow = nn & (
            (finite & (dbl != F.lit(0.0))
             & (d.isNull() | d.try_cast("long").isNull()))
            | (syntax_ok & inf_overflow)
        )
        return (
            F.when(not_numeric, make_error(field, "not_numeric", self.name))
            .when(not_integral, make_error(field, "not_int", self.name))
            .when(overflow, make_error(field, "too_big", self.name))
        )


class _IntFromIntegral(Validator):
    """Int over byte/short/int/long input: the type system already
    guarantees integrality — pure widening cast, zero error branches."""

    name = "int"
    preserves_type = False

    def transform(self, col: Column) -> Column:
        return col.cast("long")


class _IntFromFloat(Validator):
    """Int over float/double input: native NaN/∞/integrality/range
    checks, no string roundtrip."""

    name = "int"
    preserves_type = False

    def transform(self, col: Column) -> Column:
        return col.cast("long")

    def error(self, col: Column, field: FieldRef) -> Column:
        nn = col.isNotNull()
        bad_nan = nn & F.isnan(col)
        # float(LONG_MAX) rounds UP to exactly 2**63 (not representable as
        # long), so the upper bound must be >= — a double equal to 2**63
        # would otherwise pass and cast('long') would saturate silently.
        # float(LONG_MIN) is exactly -2**63, a valid long, so < is right.
        overflow = nn & ~F.isnan(col) & (
            (col < F.lit(float(LONG_MIN))) | (col >= F.lit(float(2**63)))
        )
        not_integral = nn & ~F.isnan(col) & (col != F.floor(col))
        return (
            F.when(bad_nan, make_error(field, "not_numeric", self.name))
            .when(overflow, make_error(field, "too_big", self.name))
            .when(not_integral, make_error(field, "not_int", self.name))
        )


class _IntFromDecimal(Validator):
    """Int over decimal input: integrality + long-range check."""

    name = "int"
    preserves_type = False

    def transform(self, col: Column) -> Column:
        return col.cast("long")

    def error(self, col: Column, field: FieldRef) -> Column:
        nn = col.isNotNull()
        not_integral = nn & (col != F.floor(col))
        overflow = nn & col.try_cast("long").isNull()
        return F.when(not_integral, make_error(field, "not_int", self.name)).when(
            overflow, make_error(field, "too_big", self.name)
        )


class DecimalOf(Validator):
    """→ DecimalType; rejects non-numeric strings and NaN/±Inf
    (reference ``Decimal(max_precision=...)``; quantize ≈ scale cast).

    Specializes per input type: numeric inputs cast natively (float
    gets a NaN/∞ guard); the string-roundtrip only parses strings.
    """

    name = "decimal"
    preserves_type = False

    def specialize(self, dtype) -> Validator:
        if isinstance(dtype, (*_INTEGRAL, DecimalType)):
            return _DecimalFromNumeric(self._t)
        if isinstance(dtype, _FLOATING):
            return _DecimalFromFloat(self._t)
        return self

    def __init__(self, precision: int = 38, scale: int = 10):
        self.precision = precision
        self.scale = scale
        self._t = f"decimal({precision},{scale})"

    def _pre(self, col: Column) -> Column:
        # Normalize to string first so float NaN/Inf become the literal
        # strings 'NaN'/'Infinity' and fail the decimal try_cast.
        return F.trim(col.cast("string"))

    def transform(self, col: Column) -> Column:
        return self._pre(col).try_cast(self._t)

    def error(self, col: Column, field: FieldRef) -> Column:
        s = self._pre(col)
        bad = col.isNotNull() & s.try_cast(self._t).isNull()
        non_finite = bad & F.upper(s).rlike("^[+-]?(NAN|INF(INITY)?)$")
        return F.when(non_finite, make_error(field, "not_finite", self.name)).when(
            bad, make_error(field, "not_numeric", self.name)
        )


class _DecimalFromNumeric(Validator):
    """Decimal over integral/decimal input: one try_cast, error only
    on precision overflow."""

    name = "decimal"
    preserves_type = False

    def __init__(self, t: str):
        self._t = t

    def transform(self, col: Column) -> Column:
        return col.try_cast(self._t)

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & col.try_cast(self._t).isNull()
        return F.when(fail, make_error(field, "not_numeric", self.name))


class _DecimalFromFloat(Validator):
    """Decimal over float/double input: native NaN/∞ guard + cast."""

    name = "decimal"
    preserves_type = False

    def __init__(self, t: str):
        self._t = t

    def transform(self, col: Column) -> Column:
        return col.try_cast(self._t)

    def error(self, col: Column, field: FieldRef) -> Column:
        nn = col.isNotNull()
        non_finite = nn & (F.isnan(col) | (F.abs(col) == F.lit(float("inf"))))
        overflow = nn & ~F.isnan(col) & col.try_cast(self._t).isNull()
        return F.when(non_finite, make_error(field, "not_finite", self.name)).when(
            overflow, make_error(field, "not_numeric", self.name)
        )


class Min(Predicate):
    """v >= min (`>` if exclusive) — reference ``Min``; code ``too_small``."""

    name = "min"
    code = "too_small"

    def __init__(self, value, exclusive: bool = False):
        self.value = value
        self.exclusive = exclusive

    def condition(self, col: Column) -> Column:
        return col > F.lit(self.value) if self.exclusive else col >= F.lit(self.value)


class Max(Predicate):
    """v <= max (`<` if exclusive) — reference ``Max``; code ``too_big``."""

    name = "max"
    code = "too_big"

    def __init__(self, value, exclusive: bool = False):
        self.value = value
        self.exclusive = exclusive

    def condition(self, col: Column) -> Column:
        return col < F.lit(self.value) if self.exclusive else col <= F.lit(self.value)


class Round(Validator):
    """Round to the nearest multiple of ``to_nearest``, HALF_UP
    (reference ``Round``).  Spark ``F.round`` is HALF_UP on decimals —
    matches; ``bround`` (HALF_EVEN) must not be used here."""

    name = "round"
    preserves_type = False

    def __init__(self, to_nearest=1, scale: int = 10):
        self.to_nearest = to_nearest
        self.scale = scale

    def transform(self, col: Column) -> Column:
        dec = f"decimal(38,{self.scale})"
        n = F.lit(str(self.to_nearest)).cast(dec)
        return (F.round((col.cast(dec) / n), 0) * n).cast(dec)
