"""Temporal validators (reference ``filters/simple.py::Date/Datetime``
— SURVEY.md §2.2 / §7.3 milestone 4).

The reference parses free-form strings with dateutil and normalizes
tz-aware datetimes to UTC.  Expression path: ``try_to_timestamp`` over
a prioritized list of fixed formats + ``to_utc_timestamp`` for naive
inputs interpreted in an assumed zone.  The dateutil free-form parser
lives in ``udf.DatetimeFuzzy``.

Engine-wide discipline: ``spark.sql.session.timeZone`` is pinned to
UTC by :func:`filters_spark.sources.tables.get_spark` so timestamp
semantics (and the DuckDB oracle) never flap (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..core import FieldRef, Validator, make_error

__all__ = ["Datetime", "Date"]

# Prioritized fixed formats covering ISO-ish inputs.
_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "MM/dd/yyyy",
]


def _parse_any(col: Column) -> Column:
    parsed = F.try_to_timestamp(col)  # session-default parse first
    for fmt in _FORMATS:
        parsed = F.coalesce(parsed, F.try_to_timestamp(col, F.lit(fmt)))
    return parsed


# An explicit offset (or Z, or a zone id) at the end of the input
# string means the instant is fully determined by the input — the
# ``timezone`` param must NOT re-shift it (reference: explicit tzinfo
# wins over the assumed zone).  Spark's timestamp cast grammar accepts
# single-digit offset hours ('+9:00'), bare hours ('+09'), seconds
# ('+09:00:00'), 'UTC+…' forms, and region ids ('America/Los_Angeles')
# — the alternation must cover ALL of them or a matched-by-cast,
# missed-by-regex input gets double-shifted.
_OFFSET_RE = (
    r"(?i)("
    r"Z"
    # ±H:MM / ±HH:MM[:SS], optional UTC/GMT prefix ('UTC+09:00')
    r"|(UTC|UT|GMT)?[+-]\d{1,2}:\d{2}(:\d{2})?"
    r"|[+-]\d{4}"                       # compact ±HHMM
    # bare ±H/±HH ONLY right after a time component — without the
    # lookbehind a plain DATE ('2024-01-02') ends in '-02' and would
    # false-match, un-shifting every naive date input
    r"|(?<=:\d\d)[+-]\d{1,2}"
    r"|(?<=\.\d{1,9})[+-]\d{1,2}"       # bare hour after fraction ('.500+00')
    r"|(?<=\d\s)(UTC|UT|GMT)"           # bare zone word ('12:00:00 UTC')
    r"|[A-Za-z]+(/[A-Za-z0-9_+-]+)+"    # region zone ids
    r")\s*$"
)


def _interpret_in_zone(parsed: Column, raw: Column, timezone: str | None) -> Column:
    """UTC-normalize ``parsed``: with the session tz pinned to UTC,
    offset-bearing inputs already parsed to the right instant; naive
    inputs parsed as-if-UTC and are re-interpreted in ``timezone``.

    Zone detection is belt-and-braces, because a matched-by-cast,
    missed-by-detection input gets silently double-shifted:

    * NUMERIC: cast the raw string to both TIMESTAMP (zone-aware,
      session tz UTC) and TIMESTAMP_NTZ (Spark drops any zone token
      and keeps the wall clock).  If the two disagree, the input
      carried a NONZERO offset — this catches every offset syntax the
      cast grammar accepts, present or future, with no regex to keep
      in sync.
    * TEXTUAL (``_OFFSET_RE``): zero-offset markers ('Z', '+00:00',
      'UTC', 'GMT') parse to the same instant both ways and are
      invisible to the numeric probe, so they are matched by text.
    """
    if not timezone:
        return parsed
    ts = raw.try_cast("timestamp")
    ntz = raw.try_cast("timestamp_ntz")
    zoned_numeric = (
        ts.isNotNull() & ntz.isNotNull() & (ts != ntz.cast("timestamp"))
    )
    return F.when(zoned_numeric | raw.rlike(_OFFSET_RE), parsed).otherwise(
        F.to_utc_timestamp(parsed, timezone)
    )


class Datetime(Validator):
    """Parse string/timestamp → UTC timestamp (reference ``Datetime``).

    ``timezone``: zone used to interpret NAIVE inputs (reference's
    ``timezone`` param); offsets in the input itself win.  With the
    session tz pinned to UTC, naive strings parse as UTC and
    ``to_utc_timestamp`` re-interprets them when a zone is given.

    Specializes at plan time: timestamp-typed input skips the
    multi-format parse entirely (identity / single cast).
    """

    name = "datetime"
    preserves_type = False

    def specialize(self, dtype) -> Validator:
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        if isinstance(dtype, (TimestampType, TimestampNTZType)):
            return _TimestampPassthrough(self.timezone, "datetime")
        if isinstance(dtype, DateType):
            return _TimestampPassthrough(self.timezone, "datetime", cast="timestamp")
        return self

    def __init__(self, timezone: str | None = None):
        self.timezone = timezone

    def _parsed(self, col: Column) -> Column:
        raw = col.cast("string")
        return _interpret_in_zone(_parse_any(raw), raw, self.timezone)

    def transform(self, col: Column) -> Column:
        return self._parsed(col)

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & self._parsed(col).isNull()
        return F.when(fail, make_error(field, "not_datetime", self.name))


class _TimestampPassthrough(Validator):
    """Datetime/Date over an already-temporal column: no parse, at
    most one cast — the specialized plan for typed inputs."""

    preserves_type = False

    def __init__(self, timezone: str | None, name: str,
                 cast: str | None = None, shift: bool = True):
        self.timezone = timezone
        self.name = name
        self.cast_to = cast
        self.shift = shift

    def transform(self, col: Column) -> Column:
        out = col
        if self.cast_to:
            out = out.cast(self.cast_to)
        if self.timezone and self.shift:
            # typed TIMESTAMP columns carry no offset → always naive;
            # interpret in the assumed zone (Date takes the UTC date
            # of the shifted instant, mirroring the string path).
            # Typed DATE inputs to Date() set shift=False: a pure
            # date has no clock time to interpret — shifting would
            # move every date in a positive-offset zone back a day.
            out = F.to_utc_timestamp(out, self.timezone)
        if self.name == "date":
            out = out.cast("date")
        return out


class Date(Validator):
    """Parse → DateType (reference ``Date``): the datetime parse, then
    the date part (in ``timezone`` if given, else UTC)."""

    name = "date"
    preserves_type = False

    def specialize(self, dtype) -> Validator:
        from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

        if isinstance(dtype, DateType):
            # a typed date is already the answer — no zone shift
            return _TimestampPassthrough(self.timezone, "date", shift=False)
        if isinstance(dtype, (TimestampType, TimestampNTZType)):
            return _TimestampPassthrough(self.timezone, "date")
        return self

    def __init__(self, timezone: str | None = None):
        self.timezone = timezone

    def _parsed(self, col: Column) -> Column:
        # Same UTC normalization as Datetime, then the UTC date part
        # (reference ``Date`` = ``Datetime`` parse → ``.date()``).
        raw = col.cast("string")
        return F.to_date(_interpret_in_zone(_parse_any(raw), raw, self.timezone))

    def transform(self, col: Column) -> Column:
        return self._parsed(col)

    def error(self, col: Column, field: FieldRef) -> Column:
        fail = col.isNotNull() & self._parsed(col).isNull()
        return F.when(fail, make_error(field, "not_date", self.name))
