"""URL extraction / normalization / domain ops for web-corpus
pipelines.

Pure regex column expressions (no parse_url — its Java-side UDF path
breaks whole-stage codegen and has no ANSI-SQL twin); patterns stay
inside the Java-regex ∩ RE2 subset so the DuckDB gate replays them
byte-for-byte (same discipline as functions/pii.py).

Reference scope: the reference validation library has no URL surface
beyond string validators; this module is pipeline-layer (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "URL_PATTERN",
    "extract_urls",
    "url_count",
    "url_host",
    "registrable_domain",
    "normalize_url",
]

URL_PATTERN = r"https?://[^\s]+"
_HOST_PATTERN = r"https?://([^/\s:?#]+)"


def extract_urls(col: Column) -> Column:
    """All URL substrings, in document order."""
    return F.regexp_extract_all(col, F.lit(URL_PATTERN), 0)


def url_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(URL_PATTERN))


def url_host(col: Column) -> Column:
    """Lower-cased host of a single URL ('' when not a URL) —
    hostnames are case-insensitive per RFC 3986, paths are not."""
    return F.lower(F.regexp_extract(col, _HOST_PATTERN, 1))


def registrable_domain(col: Column) -> Column:
    """Naive eTLD+1: the last two dot-labels of the host.  A real
    deployment substitutes the public-suffix list via a broadcast map
    join; the column contract is identical."""
    return F.regexp_extract(url_host(col), r"([A-Za-z0-9-]+\.[A-Za-z0-9-]+)$", 1)


def normalize_url(col: Column) -> Column:
    """Canonical form for URL dedup keys: lower-case scheme+host
    (path case preserved), fragment stripped, trailing slash
    stripped.  Chained regexp_replace — one projection."""
    # lower the scheme+host prefix only: split at the first '/',
    # ':' or end after the host
    host_part = F.lower(F.regexp_extract(col, r"^(https?://[^/\s?#]*)", 1))
    rest = F.regexp_replace(col, r"^https?://[^/\s?#]*", "")
    defrag = F.regexp_replace(F.concat(host_part, rest), r"#[^\s]*$", "")
    return F.regexp_replace(defrag, r"/$", "")
