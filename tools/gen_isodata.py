"""Regenerate ``filters_spark/operators/_isodata.py`` from the
JDK's bundled CLDR/ISO data (java.util.Locale / java.util.Currency)
— public standards data, no external package.  Run after a JDK bump;
``tests/test_iso.py::TestTableIntegrity`` fails when the committed
tables drift from the live JVM.

Usage: python tools/gen_isodata.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from filters_spark.sources import get_spark


def extract(spark):
    jvm = spark.sparkContext._jvm
    Locale = jvm.java.util.Locale
    countries = []
    for a2 in sorted(Locale.getISOCountries()):
        loc = jvm.java.util.Locale("", a2)
        try:
            a3 = loc.getISO3Country()
        except Exception:
            a3 = ""
        countries.append((a2, a3))
    Currency = jvm.java.util.Currency
    curs = {}
    it = Currency.getAvailableCurrencies().iterator()
    while it.hasNext():
        c = it.next()
        curs[c.getCurrencyCode()] = c.getNumericCode()
    langs = sorted(set(Locale.getISOLanguages()))
    return countries, sorted(curs.items()), langs


def _fmt_pairs(pairs):
    items = [f'("{a}", "{b}")' if isinstance(b, str) else f'("{a}", {b})'
             for a, b in pairs]
    lines, cur = [], "    "
    for it in items:
        if len(cur) + len(it) + 2 > 78:
            lines.append(cur.rstrip())
            cur = "    "
        cur += it + ", "
    lines.append(cur.rstrip())
    return "\n".join(lines)


def _fmt_list(vals):
    items = [f'"{v}"' for v in vals]
    lines, cur = [], "    "
    for it in items:
        if len(cur) + len(it) + 2 > 78:
            lines.append(cur.rstrip())
            cur = "    "
        cur += it + ", "
    lines.append(cur.rstrip())
    return "\n".join(lines)


def main():
    countries, currencies, languages = extract(get_spark())
    src = f'''"""ISO reference tables for the extension validators
(:mod:`filters_spark.operators.iso` — SURVEY.md §2.7 extension
family; public `filters-iso` / `filters-macaddress` parity).

GENERATED from the JDK's own CLDR/ISO data (java.util.Locale /
java.util.Currency on the bundled JDK 17) by
``tools/gen_isodata.py`` — public standards data, no external
package.  ``tests/test_iso.py::TestTableIntegrity`` regenerates the
tables from the live JVM each run and asserts equality, so a JDK
bump that revises ISO data fails loudly instead of silently
diverging.

* ISO 3166-1: (alpha-2, alpha-3) pairs, {len(countries)} entries.
* ISO 4217: (alpha-3 code, numeric code) pairs, {len(currencies)} entries.
* ISO 639-1: two-letter language codes, {len(languages)} entries.
"""

# (alpha2, alpha3) — alpha3 may be "" for user-assigned ranges
COUNTRIES: tuple[tuple[str, str], ...] = (
{_fmt_pairs(countries)}
)

# (alpha code, ISO 4217 numeric)
CURRENCIES: tuple[tuple[str, int], ...] = (
{_fmt_pairs(currencies)}
)

LANGUAGES: tuple[str, ...] = (
{_fmt_list(languages)}
)
'''
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        "filters_spark", "operators", "_isodata.py")
    with open(out, "w") as f:
        f.write(src)
    print(f"wrote {out}: {len(countries)} countries, "
          f"{len(currencies)} currencies, {len(languages)} languages")


if __name__ == "__main__":
    main()
