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

from ..core import FieldRef, Validator, make_error

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


class Call(Validator):
    """Wrap an arbitrary per-value Python callable (reference
    ``Call(fn)``).  The callable must be pure; it runs Arrow-batched.
    Returning None marks the value invalid when ``error_on_none``."""

    name = "call"
    guard_on_error = True
    preserves_type = False

    def __init__(self, fn: Callable, return_type: str = "string",
                 error_on_none: bool = False, code: str = "invalid"):
        self.fn = fn
        self.return_type = return_type
        self.error_on_none = error_on_none
        self.code = code
        self._udf = pandas_udf(_mapped(fn), return_type)

    def transform(self, col: Column) -> Column:
        return self._udf(col)

    def error(self, col: Column, field: FieldRef) -> Column:
        if not self.error_on_none:
            return super().error(col, field)
        fail = col.isNotNull() & self._udf(col).isNull()
        return F.when(fail, make_error(field, self.code, self.name))


class UnicodeNFC(Validator):
    """Exact NFC normalization (reference ``Unicode`` semantics the
    expr path approximates — SURVEY.md §7.4)."""

    name = "unicode_nfc"
    guard_on_error = True

    def __init__(self):
        self._udf = pandas_udf(_mapped(lambda s: unicodedata.normalize("NFC", s)), "string")

    def transform(self, col: Column) -> Column:
        return self._udf(col)


class CaseFoldExact(Validator):
    """Exact ``str.casefold`` (reference ``CaseFold``)."""

    name = "case_fold_exact"
    guard_on_error = True

    def __init__(self):
        self._udf = pandas_udf(_mapped(lambda s: s.casefold()), "string")

    def transform(self, col: Column) -> Column:
        return self._udf(col)


class DatetimeFuzzy(Validator):
    """Free-form date parsing via dateutil (reference ``Datetime``'s
    parser).  Gated import: if dateutil is absent the validator raises
    at construction, not at import of this module."""

    name = "datetime_fuzzy"
    guard_on_error = True
    preserves_type = False

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

    def transform(self, col: Column) -> Column:
        return self._udf(col)

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & self._udf(col).isNull()
        return F.when(fail, make_error(field, "not_datetime", self.name))


class IpV6Normalize(Validator):
    """RFC 5952-compressed IPv6 (reference ``IpAddress(ipv6=True)``
    output form)."""

    name = "ipv6_normalize"
    guard_on_error = True

    def __init__(self):
        import ipaddress

        def norm(s):
            try:
                return str(ipaddress.ip_address(s))
            except ValueError:
                return None

        self._udf = pandas_udf(_mapped(norm), "string")

    def transform(self, col: Column) -> Column:
        return self._udf(col)

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & self._udf(col).isNull()
        return F.when(fail, make_error(field, "not_ip_address", self.name))


class MaxBytesTruncate(Validator):
    """Truncate to a UTF-8 byte budget at a codepoint boundary,
    optionally with a prefix kept (reference ``MaxBytes(prefix=...)``).
    Spark substr is char-based so the exact byte semantics need
    Python."""

    name = "max_bytes_truncate"
    guard_on_error = True

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
            # back off to a codepoint boundary
            while cut and (cut[-1] & 0xC0) == 0x80:
                cut = cut[:-1]
            return prefix + cut.decode("utf-8", errors="ignore")

        self._udf = pandas_udf(_mapped(trunc), "string")

    def transform(self, col: Column) -> Column:
        return self._udf(col)
