"""Simple validators (reference ``filters/simple.py`` — SURVEY.md §2.2).

All pure Column expressions.  Length-family validators use
``length()`` for strings/binary and ``size()`` for arrays/maps via a
runtime-polymorphic helper that the schema layer specializes by the
bound column's type when known.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, MapType, StringType

from ..core import FieldRef, Predicate, Validator, make_error, null_error

__all__ = [
    "Required",
    "NotEmpty",
    "Empty",
    "Optional",
    "Choice",
    "Length",
    "MinLength",
    "MaxLength",
    "ArrayOf",
    "ByteArray",
]


def _length(col: Column) -> Column:
    """len(value) for any sized type.  ``F.length`` covers string and
    binary; ``F.size`` covers array/map.  We cannot inspect a Column's
    type here (unbound), so validators that need it take a ``kind``
    hint; default 'chars'."""
    return F.length(col)


def _size_expr(col: Column, kind: str) -> Column:
    if kind == "items":
        return F.size(col)
    return F.length(col)


class Required(Predicate):
    """Reject NULL and empty — the only NULL-rejecting validator
    (reference ``filters/simple.py::Required``)."""

    name = "required"
    code = "empty"

    def __init__(self, kind: str = "scalar"):
        # kind: 'scalar' (null check only), 'chars' (also len>0),
        # 'items' (also size>0)
        self.kind = kind

    def error(self, col: Column, field: FieldRef) -> Column:
        if self.kind == "scalar":
            fail = col.isNull()
        else:
            fail = col.isNull() | (_size_expr(col, self.kind) == 0)
        return F.when(fail, make_error(field, self.code, self.name))


class NotEmpty(Predicate):
    """Reject len==0; NULL passes by default
    (reference ``NotEmpty(allow_none=True)``)."""

    name = "not_empty"
    code = "empty"

    def __init__(self, allow_none: bool = True, kind: str = "chars"):
        self.allow_none = allow_none
        self.kind = kind

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & (_size_expr(col, self.kind) == 0)
        if not self.allow_none:
            fail = fail | col.isNull()
        return F.when(fail, make_error(field, self.code, self.name))


class Empty(Predicate):
    """Require len==0 (NULL passes) — reference ``Empty``."""

    name = "empty"
    code = "not_empty"

    def __init__(self, kind: str = "chars"):
        self.kind = kind

    def condition(self, col: Column) -> Column:
        return _size_expr(col, self.kind) == 0


class Optional(Validator):
    """Replace NULL (and optionally empty) with a default —
    reference ``Optional``.  NOTE: placed first in a chain this is the
    one validator that turns NULL into a value."""

    name = "optional"

    def __init__(self, default=None, treat_empty_as_none: bool = True, kind: str = "chars"):
        self.default = default
        self.treat_empty_as_none = treat_empty_as_none
        self.kind = kind

    def transform(self, col: Column) -> Column:
        is_missing = col.isNull()
        if self.treat_empty_as_none:
            is_missing = is_missing | (_size_expr(col, self.kind) == 0)
        return F.when(is_missing, F.lit(self.default)).otherwise(col)


class Choice(Predicate):
    """Value must be one of the allowed options — reference ``Choice``;
    error code ``not_valid_choice``."""

    name = "choice"
    code = "not_valid_choice"

    def __init__(self, choices, case_sensitive: bool = True):
        self.choices = list(choices)
        self.case_sensitive = case_sensitive

    def condition(self, col: Column) -> Column:
        if self.case_sensitive:
            return col.isin(*self.choices)
        return F.lower(col).isin(*[str(c).lower() for c in self.choices])


class Length(Predicate):
    """Exact length — reference ``Length``."""

    name = "length"
    code = "wrong_length"

    def __init__(self, n: int, kind: str = "chars"):
        self.n = n
        self.kind = kind

    def condition(self, col: Column) -> Column:
        return _size_expr(col, self.kind) == self.n


class MinLength(Predicate):
    name = "min_length"
    code = "too_short"

    def __init__(self, n: int, kind: str = "chars"):
        self.n = n
        self.kind = kind

    def condition(self, col: Column) -> Column:
        return _size_expr(col, self.kind) >= self.n


class MaxLength(Predicate):
    name = "max_length"
    code = "too_long"

    def __init__(self, n: int, kind: str = "chars"):
        self.n = n
        self.kind = kind

    def condition(self, col: Column) -> Column:
        return _size_expr(col, self.kind) <= self.n


class ArrayOf(Predicate):
    """Value must be an array — reference ``Array``.  In Spark the
    array-ness of a column is static, so this is a plan-time schema
    assertion (``expected_types``); kept as a validator for chain
    parity."""

    name = "array"
    code = "wrong_type"
    expected_types = ("array",)

    def condition(self, col: Column) -> Column:
        return F.lit(True)


class ByteArray(Validator):
    """Coerce → binary — reference ``ByteArray`` (mutable/immutable
    distinction is meaningless columnar-side; both map to BinaryType).

    Input legs, specialized at plan time from the bound column type:

    - string → utf-8 (or ``encoding``) encode;
    - binary → identity;
    - array<integral> → packed bytes (reference ``bytes(list_of_ints)``
      semantics: every element must be in [0, 255], else
      ``out_of_range``) — pure JVM expression (hex-pack + unhex), no
      Python UDF.
    """

    name = "byte_array"
    preserves_type = False

    def __init__(self, encoding: str = "UTF-8"):
        self.encoding = encoding

    def specialize(self, dtype) -> Validator:
        from pyspark.sql.types import (
            ArrayType, BinaryType, ByteType, IntegerType, LongType, ShortType,
        )

        if isinstance(dtype, ArrayType) and isinstance(
            dtype.elementType, (ByteType, ShortType, IntegerType, LongType)
        ):
            return _ByteArrayFromInts()
        if isinstance(dtype, BinaryType):
            return _Identity("byte_array")
        return self

    def transform(self, col: Column) -> Column:
        return F.encode(col, self.encoding)


class _Identity(Validator):
    """Typed no-op leg (input already has the target type)."""

    def __init__(self, name: str):
        self.name = name


class _ByteArrayFromInts(Validator):
    """array<integral> → binary, ``bytes(list)`` semantics.

    Pack: each element renders as exactly two hex digits, the digits
    concatenate, ``unhex`` decodes — whole-stage-codegen-friendly, no
    Python round trip.  The pack is guarded by the range check so the
    two-digit assumption can't truncate an out-of-range value.
    """

    name = "byte_array"
    preserves_type = False

    def _ok(self, col: Column) -> Column:
        return F.forall(
            col, lambda x: x.isNotNull() & (x >= 0) & (x <= 255)
        )

    def transform(self, col: Column) -> Column:
        packed = F.unhex(F.concat_ws(
            "", F.transform(col, lambda x: F.lpad(F.hex(x.cast("bigint")), 2, "0"))
        ))
        return F.when(self._ok(col), packed)

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & ~self._ok(col)
        return F.when(fail, make_error(field, "out_of_range", self.name))
