"""PII detection and redaction for training-data pipelines.

All detection/redaction is pure codegen'd column expressions
(regexp_count / regexp_replace) — no Python in the hot path, so the
scan stage absorbs the whole pass at 100 TB.  Patterns deliberately
use only the regex subset with identical semantics in Java regex
(Spark) and RE2 (DuckDB/Go): character classes, bounded repetition,
non-capturing groups, \\b anchors — no backrefs, no lookaround — so
the correctness gate can replay detection byte-for-byte in SQL.

Reference scope note: the reference validation library (`filters`,
eflglobal) has no PII surface; this module is part of the
training-data-pipeline layer the engine adds on top (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "pii_counts",
    "redact",
    "pii_profile",
    "luhn_valid_16",
]

# Order matters for redaction: the credit-card pattern must run
# before phone/ssn (a 16-digit grouped number contains phone-shaped
# substrings once partially replaced).
PII_PATTERNS: dict[str, str] = {
    "credit_card": r"\b\d{4}[ -]\d{4}[ -]\d{4}[ -]\d{4}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(col: Column, kinds: list[str] | None = None) -> list[tuple[str, Column]]:
    """(kind, match-count) column pairs — one regexp_count per kind,
    all fused into the same projection by Catalyst."""
    kinds = kinds or list(PII_PATTERNS)
    return [(k, F.regexp_count(col, F.lit(PII_PATTERNS[k]))) for k in kinds]


def redact(col: Column, kinds: list[str] | None = None,
           token_fmt: str = "[{kind}]") -> Column:
    """Chained regexp_replace in PII_PATTERNS order (credit cards
    first — see the ordering note above).  One pass per kind; the
    chain still compiles into a single projection."""
    kinds = kinds or list(PII_PATTERNS)
    out = col
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k],
                               token_fmt.format(kind=k.upper()))
    return out


def pii_profile(df: DataFrame, text_col: str = "text",
                kinds: list[str] | None = None) -> DataFrame:
    """Input plus one ``n_<kind>`` count column per kind and a
    ``has_pii`` flag — the audit projection a filtering or redaction
    stage hangs off."""
    counts = pii_counts(F.col(text_col), kinds)
    out = df
    total = F.lit(0)
    for k, c in counts:
        out = out.withColumn(f"n_{k}", c)
        total = total + F.col(f"n_{k}")
    return out.withColumn("has_pii", total > 0)


def luhn_valid_16(col: Column) -> Column:
    """Luhn checksum for a 16-digit card candidate (separators
    allowed).  The per-digit loop is UNROLLED into 16 fixed
    substring+arithmetic terms — pure codegen, no higher-order
    function (HOF lambdas are CodegenFallback; see dedup.py) — and
    the identical unrolled SQL replays in any engine.  Non-16-digit
    inputs return NULL (unknown), not false.
    """
    s = F.regexp_replace(col, r"[ -]", "")
    terms = []
    for i in range(1, 17):
        d = F.substring(s, i, 1).cast("int")
        if i % 2 == 1:  # positions 1,3,.. from the left double for 16-len
            dd = d * 2
            terms.append(F.when(dd > 9, dd - 9).otherwise(dd))
        else:
            terms.append(d)
    total = terms[0]
    for t in terms[1:]:
        total = total + t
    return F.when(F.length(s) == 16, total % 10 == 0)
