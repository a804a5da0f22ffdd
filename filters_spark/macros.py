"""Common validator recipes as macros (reference
``filters/macros.py::filter_macro`` — SURVEY.md §2.7).  A macro is a
plain function returning a chain; ``@filter_macro`` marks intent and
keeps API parity.  These are also registry defaults for
``filters_spark.ext``.
"""

from __future__ import annotations

from .core import Chain, Validator, filter_macro
from .operators.simple import MaxLength, NotEmpty
from .operators.string import CaseFold, Matches, Strip

EMAIL_RE = r"^[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+$"
URL_RE = r"^https?://[^\s/$.?#][^\s]*$"
SLUG_RE = r"^[a-z0-9]+(?:-[a-z0-9]+)*$"
HEX_COLOR_RE = r"^#(?:[0-9a-fA-F]{3}|[0-9a-fA-F]{6})$"
PHONE_E164_RE = r"^\+[1-9][0-9]{6,14}$"


@filter_macro
def email() -> Validator:
    """Normalized email: strip, casefold, syntactic check."""
    return Strip() | CaseFold() | Matches(EMAIL_RE, code="not_email") | MaxLength(254)


@filter_macro
def url() -> Validator:
    return Strip() | Matches(URL_RE, code="not_url") | MaxLength(2048)


@filter_macro
def slug() -> Validator:
    return Strip() | CaseFold() | Matches(SLUG_RE, code="not_slug")


@filter_macro
def hex_color() -> Validator:
    return Strip() | Matches(HEX_COLOR_RE, code="not_hex_color")


@filter_macro
def phone_e164() -> Validator:
    return Strip() | Matches(PHONE_E164_RE, code="not_phone")


@filter_macro
def non_blank() -> Validator:
    """Strip then must be non-empty — the 'required text' idiom."""
    return Strip() | NotEmpty(allow_none=True)


def register_defaults(registry) -> None:
    for fn in (email, url, slug, hex_color, phone_e164, non_blank):
        registry.register(fn.__name__, fn)
    # Successor-library (phx-filters) projection ops, exposed as
    # extensions — NOT part of the eflglobal surface (SURVEY.md §2.7).
    from .operators.complex import Item, Omit, Pick

    for cls in (Item, Omit, Pick):
        registry.register(cls.__name__, cls)
    # ISO extension family (public filters-iso / filters-macaddress
    # parity — VERDICT r7 Next #3): literal-map validators, no
    # external package (tables generated from JDK CLDR data).
    from .operators.iso import Country, Currency, Locale, MacAddress

    for cls in (Country, Currency, Locale, MacAddress):
        registry.register(cls.__name__, cls)
