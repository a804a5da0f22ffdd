"""Validator core: composable, Catalyst-compiled validation chains.

Re-expresses the reference's filter/chain model (see SURVEY.md §1.1;
reference: ``filters/base.py::BaseFilter`` / ``FilterChain``) as pure
Spark Column-expression builders.  A :class:`Validator` is a builder

    ``build(col, err, field) -> (col', err')``

where ``err`` is a ``struct<field,code,filter>`` Column that is NULL
while the value is still valid.  ``a | b`` composes validators into a
:class:`Chain` (reference ``FilterChain``); the whole chain compiles
into ONE projection that Catalyst folds into whole-stage codegen —
there is no per-filter interpreter at runtime.

Semantics preserved from the reference (SURVEY.md §1.2):

* **None passthrough** — every validator passes NULL through untouched;
  only ``Required`` rejects it.  Implemented with the
  ``NOT coalesce(pred, TRUE)`` rule: an error fires only when a
  predicate evaluates to definitively FALSE, never NULL.
* **First error wins / short-circuit** — once ``err`` is non-null the
  value column becomes NULL, so every later step sees NULL and
  passes it through; ``err`` is combined with ``coalesce`` so the
  first error is kept.  This reproduces ``FilterChain``'s
  stop-at-first-error without any imperative control flow.
* **Invalid → None** — the cleaned value of an errored field is NULL,
  matching ``FilterRunner.cleaned_data``.

Scale note (100 TB): everything here is a Column expression — no
Python executes per row, no shuffle is introduced, and predicate
pushdown / column pruning apply to the validated scan unchanged.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "ERROR_DDL",
    "FilterError",
    "Validator",
    "Chain",
    "Predicate",
    "Transform",
    "NoOp",
    "make_error",
    "coerce",
    "filter_macro",
]

# Error payload carried alongside each value: which field, which
# machine-readable code (ported verbatim from the reference, e.g.
# `too_big`, `not_valid_choice`), and which validator raised it.
ERROR_DDL = "struct<field:string,code:string,filter:string>"

FieldRef = Union[str, Column]


class FilterError(Exception):
    """Raised by strict (fail-fast) validation — reference
    ``filters/base.py::FilterError`` + ``handlers.py::ExceptionHandler``."""

    def __init__(self, message: str, field: str | None = None, code: str | None = None):
        super().__init__(message)
        self.field = field
        self.code = code


def _field_col(field: FieldRef) -> Column:
    return F.lit(field) if isinstance(field, str) else field


def make_error(field: FieldRef, code: str, filter_name: str) -> Column:
    """Build a non-null error struct Column."""
    return F.struct(
        _field_col(field).alias("field"),
        F.lit(code).alias("code"),
        F.lit(filter_name).alias("filter"),
    )


def null_error() -> Column:
    return F.lit(None).cast(ERROR_DDL)


class Validator:
    """Smallest unit of validation (reference ``BaseFilter``).

    Subclasses implement :meth:`transform` (value mapping; identity by
    default) and :meth:`error` (a Column that is a non-null error
    struct exactly when this step rejects the incoming value).
    ``build`` weaves them into the chain contract described in the
    module docstring.
    """

    name = "validator"

    # Optional static type expectation, checked at plan time by
    # ValidationSchema (reference `Type` filter — schema is static in
    # Spark so the check moves from per-row to per-query).
    expected_types: tuple[str, ...] | None = None

    def transform(self, col: Column) -> Column:
        return col

    def error(self, col: Column, field: FieldRef) -> Column:
        return null_error()

    # -- plan-time type specialization ---------------------------------
    # When the bound column's Spark type is known (ValidationSchema
    # sees df.schema), a validator may return a cheaper equivalent:
    # e.g. Int() on a BIGINT column is a no-op instead of a
    # string-roundtrip parse.  This is the validation analog of
    # Catalyst constant folding — same semantics, specialized plan.

    #: True if this validator never changes the value's Spark type
    #: (predicates, identity transforms) — lets the chain keep
    #: propagating the known dtype to later steps.
    preserves_type = True

    def specialize(self, dtype) -> "Validator":
        """Return an equivalent validator specialized to the input
        Spark DataType (dtype may be None = unknown → return self)."""
        return self

    def substeps(self) -> "list[Validator]":
        """Expansion into chain steps for the STAGED projection
        (schema.py).  Default: the validator is its own single step.
        UDF-backed validators override this to split expensive work
        into one step whose output the staging select materializes as
        a named column, so later steps reference it without
        re-evaluating (see operators/udf.py)."""
        return [self]

    #: Wrap this step's transform in ``when(err.isNull(), ...)`` so it
    #: cannot execute after an upstream error.  Only set for steps with
    #: real per-row cost or side effects (pandas UDFs) — for pure
    #: expressions the final-select nulling already guarantees errored
    #: values clean to NULL, and leaving the value tree unwrapped keeps
    #: expression growth LINEAR in chain depth (embedding the err tree
    #: in the value tree at every step made plan/codegen cost grow
    #: exponentially — measured seconds of Janino compile per query).
    guard_on_error = False

    def build(self, col: Column, err: Column, field: FieldRef) -> tuple[Column, Column]:
        # First error wins: flat coalesce list, no nesting.
        new_err = F.coalesce(err, self.error(col, field))
        new_col = self.transform(col)
        if self.guard_on_error and new_col is not col:
            new_col = F.when(err.isNull(), new_col)
        # NOTE the cleaned value of an errored row is NOT nulled here —
        # the consumer (ValidationSchema's final select, __call__,
        # Each's per-element wrap) applies `when(err.isNull(), value)`
        # exactly once at the end.  Mid-chain steps may compute on a
        # value that already errored; errors they raise are absorbed by
        # the coalesce (first error wins), and transforms are pure.
        return new_col, new_err

    def __or__(self, other: "ValidatorLike") -> "Chain":
        return Chain([self, coerce(other)])

    def __ror__(self, other: "ValidatorLike") -> "Chain":
        return Chain([coerce(other), self])

    def __call__(self, col: Column, field: str = "value") -> Column:
        """Apply to a bare Column, returning struct<value, error>;
        errored values clean to NULL (invalid → None)."""
        c, e = self.build(col, null_error(), field)
        return F.struct(F.when(e.isNull(), c).alias("value"), e.alias("error"))

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{type(self).__name__}>"


ValidatorLike = Union[Validator, type, Callable[[], Validator], None]


def coerce(obj: ValidatorLike) -> Validator:
    """Reference ``FilterCompatible``: accept validator instances,
    validator classes, zero-arg factories (macros), or None (→ NoOp)."""
    if obj is None:
        return NoOp()
    if isinstance(obj, Validator):
        return obj
    if isinstance(obj, type) and issubclass(obj, Validator):
        return obj()
    if callable(obj):
        out = obj()
        if isinstance(out, Validator):
            return out
    raise TypeError(f"cannot coerce {obj!r} to a Validator")


class Chain(Validator):
    """Left-to-right composition (reference ``FilterChain``)."""

    name = "chain"

    def __init__(self, steps: list[ValidatorLike]):
        self.steps: list[Validator] = []
        for s in steps:
            v = coerce(s)
            if isinstance(v, Chain):
                self.steps.extend(v.steps)
            elif not isinstance(v, NoOp):
                self.steps.extend(v.substeps())

    @property
    def expected_types(self):  # first step's expectation governs input
        return self.steps[0].expected_types if self.steps else None

    def build(self, col: Column, err: Column, field: FieldRef):
        for step in self.steps:
            col, err = step.build(col, err, field)
        return col, err

    def specialize(self, dtype) -> "Chain":
        out, cur = [], dtype
        for step in self.steps:
            sp = step.specialize(cur) if cur is not None else step
            out.append(sp)
            if not sp.preserves_type:
                cur = None  # type changed; stop propagating
        return Chain(out)

    def __or__(self, other: ValidatorLike) -> "Chain":
        return Chain(self.steps + [coerce(other)])

    def __repr__(self) -> str:  # pragma: no cover
        return " | ".join(repr(s) for s in self.steps)


class NoOp(Validator):
    """Identity — the chain unit element (reference ``NoOp``)."""

    name = "noop"


class Predicate(Validator):
    """A check-only validator: value passes unchanged or errors.

    Subclasses provide :meth:`condition` returning a Boolean Column
    where TRUE/NULL = pass (the None-passthrough rule) and FALSE =
    reject with :attr:`code`.
    """

    code = "invalid"

    def condition(self, col: Column) -> Column:
        raise NotImplementedError

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & ~F.coalesce(self.condition(col), F.lit(True))
        return F.when(fail, make_error(field, self.code, self.name))


class Transform(Validator):
    """A mapping-only validator built from a function (see also
    ``operators.udf.Call`` for the arbitrary-Python escape hatch)."""

    name = "transform"
    preserves_type = False

    def __init__(self, fn: Callable[[Column], Column], name: str | None = None):
        self.fn = fn
        if name:
            self.name = name

    def transform(self, col: Column) -> Column:
        return self.fn(col)


def filter_macro(fn: Callable[..., Validator]) -> Callable[..., Validator]:
    """Reference ``filters/macros.py::filter_macro`` — in Spark-land a
    macro is just a function returning a (possibly parameterized)
    validator chain; no metaclass machinery is needed.  The decorator
    exists for API parity and marks intent."""
    fn.__is_filter_macro__ = True
    return fn
