"""Pandas-UDF fallback validators (SURVEY.md §4.4, §7.3 milestone 7).

These are the ONLY places Python executes per value — each is a
documented, swappable leaf used when exact reference semantics cannot
be expressed JVM-side:

* ``UnicodeNFC``     — ``unicodedata.normalize('NFC', s)`` (no builtin)
* ``CaseFoldExact``  — ``str.casefold`` (ß→ss; ``lower()`` misses it)
* ``DatetimeFuzzy``  — ``dateutil.parser.parse`` free-form dates
* ``IpV6Normalize``  — RFC 5952 compression via ``ipaddress``
* ``MaxBytesTruncate`` — byte-budget truncation at codepoint boundary
* ``Call``           — the reference's arbitrary-callable escape hatch
                       (``filters/simple.py::Call``)

All are Arrow-batched scalar pandas UDFs (never row-at-a-time Python
UDFs) and all are None-propagating, so chain short-circuit semantics
hold: an upstream error nulls the value and the UDF body is a no-op
for that row.  Determinism note: results depend on the Python/Unicode
tables of the executor image — pin one Python version cluster-wide.
"""

from __future__ import annotations

import unicodedata
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..core import FieldRef, Validator, make_error, null_error

__all__ = [
    "Call",
    "UnicodeNFC",
    "CaseFoldExact",
    "DatetimeFuzzy",
    "IpV6Normalize",
    "MaxBytesTruncate",
]


def _mapped(fn: Callable[[object], object]):
    def run(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v))
    return run


class _PandasUdfValidator(Validator):
    """Base for UDF-backed validators.

    Error-checking UDFs (``null_result_code`` set) used to invoke
    ``self._udf(col)`` in both ``transform()`` and ``error()`` —
    Spark's ExtractPythonUDFs does NOT dedupe the two occurrences
    (measured: the Python body ran 2× per row), doubling per-row cost
    on the only hot Python paths.  Fix: :meth:`substeps` splits such a
    validator into TWO chain steps — the first evaluates the UDF once
    into a packed ``struct<_nn, _res>`` that the staged projection
    (schema.py ``_staged``) materializes as a NAMED column, the second
    derives both the value and the error from that column.  One
    ArrowEvalPython, one Python execution per row.

    (The raw single-projection path — ``chain.build`` without staging,
    e.g. ``Validator.__call__`` on a bare Column — still duplicates
    the expression; the production ``ValidationSchema`` path is the
    staged one.)"""

    guard_on_error = True
    #: error code raised when the UDF maps a non-null input to null;
    #: None → a null result is not an error (pure transforms).
    null_result_code: str | None = None

    def transform(self, col: Column) -> Column:
        return self._udf(col)

    def error(self, col: Column, field: FieldRef) -> Column:
        if self.null_result_code is None:
            return null_error()
        fail = col.isNotNull() & self._udf(col).isNull()
        return F.when(fail, make_error(field, self.null_result_code, self.name))

    def substeps(self) -> list[Validator]:
        if self.null_result_code is None:
            return [self]  # pure transform: UDF appears once (value only)
        return [_UdfApply(self), _UdfCheck(self)]


class _UdfApply(Validator):
    """Substep 1 of an error-checking UDF validator: evaluate the UDF
    ONCE, packing (input-was-not-null, result) into a struct so the
    next stage can classify without re-running Python."""

    preserves_type = False

    def __init__(self, parent: "_PandasUdfValidator"):
        self._parent = parent
        self.name = parent.name
        self.expected_types = parent.expected_types

    def build(self, col: Column, err: Column, field: FieldRef) -> tuple[Column, Column]:
        packed = F.struct(col.isNotNull().alias("_nn"),
                          self._parent._udf(col).alias("_res"))
        # guard: upstream-errored rows carry a NULL pack (masks the
        # result; the batched UDF itself still evaluates every row)
        return F.when(err.isNull(), packed), err


class _UdfCheck(Validator):
    """Substep 2: unwrap the packed struct — value := _res, error when
    a non-null input mapped to a null result.  Pure expressions over
    the stage-(N−1) named column; no Python."""

    preserves_type = False

    def __init__(self, parent: "_PandasUdfValidator"):
        self._parent = parent
        self.name = parent.name

    def build(self, col: Column, err: Column, field: FieldRef) -> tuple[Column, Column]:
        fail = (col.isNotNull() & col.getField("_nn")
                & col.getField("_res").isNull())
        new_err = F.coalesce(err, F.when(
            fail, make_error(field, self._parent.null_result_code, self.name)))
        return col.getField("_res"), new_err


class Call(_PandasUdfValidator):
    """Wrap an arbitrary per-value Python callable (reference
    ``Call(fn)``).  The callable must be pure; it runs Arrow-batched.
    Returning None marks the value invalid when ``error_on_none``."""

    name = "call"
    preserves_type = False

    def __init__(self, fn: Callable, return_type: str = "string",
                 error_on_none: bool = False, code: str = "invalid"):
        self.fn = fn
        self.return_type = return_type
        self.error_on_none = error_on_none
        self.null_result_code = code if error_on_none else None
        self._udf = pandas_udf(_mapped(fn), return_type)


class UnicodeNFC(_PandasUdfValidator):
    """Exact NFC normalization (reference ``Unicode`` semantics the
    expr path approximates — SURVEY.md §7.4)."""

    name = "unicode_nfc"

    def __init__(self):
        self._udf = pandas_udf(_mapped(lambda s: unicodedata.normalize("NFC", s)), "string")


class CaseFoldExact(_PandasUdfValidator):
    """Exact ``str.casefold`` (reference ``CaseFold``)."""

    name = "case_fold_exact"

    def __init__(self):
        self._udf = pandas_udf(_mapped(lambda s: s.casefold()), "string")


class DatetimeFuzzy(_PandasUdfValidator):
    """Free-form date parsing via dateutil (reference ``Datetime``'s
    parser).  Gated import: if dateutil is absent the validator raises
    at construction, not at import of this module."""

    name = "datetime_fuzzy"
    preserves_type = False
    null_result_code = "not_datetime"

    def __init__(self, timezone: str = "UTC"):
        from dateutil import parser as du_parser  # gated
        import datetime as _dt
        try:
            from zoneinfo import ZoneInfo
            tz = ZoneInfo(timezone)
        except Exception:
            tz = _dt.timezone.utc

        def parse(s):
            try:
                d = du_parser.parse(s)
            except (ValueError, OverflowError, TypeError):
                return None
            if d.tzinfo is None:
                d = d.replace(tzinfo=tz)
            return d.astimezone(_dt.timezone.utc).replace(tzinfo=None)

        self._udf = pandas_udf(_mapped(parse), "timestamp")


class IpV6Normalize(_PandasUdfValidator):
    """RFC 5952-compressed IPv6 (reference ``IpAddress(ipv6=True)``
    output form)."""

    name = "ipv6_normalize"
    null_result_code = "not_ip_address"

    def __init__(self):
        import ipaddress

        def norm(s):
            try:
                return str(ipaddress.ip_address(s))
            except ValueError:
                return None

        self._udf = pandas_udf(_mapped(norm), "string")


class MaxBytesTruncate(_PandasUdfValidator):
    """Truncate to a UTF-8 byte budget at a codepoint boundary,
    optionally with a prefix kept (reference ``MaxBytes(prefix=...)``).
    Spark substr is char-based so the exact byte semantics need
    Python."""

    name = "max_bytes_truncate"

    def __init__(self, max_bytes: int, prefix: str = ""):
        self.max_bytes = max_bytes
        pref = prefix.encode("utf-8")

        def trunc(s: str):
            raw = s.encode("utf-8")
            if len(raw) <= max_bytes:
                return s
            budget = max_bytes - len(pref)
            if budget <= 0:
                return ""
            cut = raw[:budget]
            # back off to a codepoint boundary: strip bytes only
            # while the prefix does NOT decode cleanly.  (Stripping
            # every trailing continuation byte unconditionally — the
            # pre-r8 code — dropped a COMPLETE final codepoint when
            # the cut landed exactly on its boundary: 12-byte budget
            # on "€€€€€" returned 3 euros, not the 4 that fit.)
            while cut:
                try:
                    return prefix + cut.decode("utf-8")
                except UnicodeDecodeError:
                    cut = cut[:-1]
            return prefix

        self._udf = pandas_udf(_mapped(trunc), "string")
