"""filters_spark — a PySpark-native validation & data-pipeline engine.

Re-expresses the capabilities of the reference validation library
(eflglobal/filters — see SURVEY.md) as Catalyst-compiled Column
expressions, plus the large-scale data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) a 100 TB
training-data pipeline needs.

Public surface::

    import filters_spark as fs

    schema = fs.ValidationSchema({
        "l_orderkey": fs.Required() | fs.Int(),
        "l_discount": fs.Min(0) | fs.Max(1),
        "l_returnflag": fs.Strip() | fs.Choice(["A", "N", "R"]),
    })
    result = schema.validate(df)
    result.clean / result.rejected / result.error_code_counts()
"""

from .core import (
    Chain,
    FilterError,
    NoOp,
    Predicate,
    Transform,
    Validator,
    coerce,
    filter_macro,
)
from .schema import SchemaError, ValidationResult, ValidationSchema
from .operators.simple import (
    ArrayOf,
    ByteArray,
    Choice,
    Empty,
    Length,
    MaxLength,
    MinLength,
    NotEmpty,
    Optional,
    Required,
)
from .operators.number import DecimalOf, Int, Max, Min, Round
from .operators.string import (
    Base64Decode,
    ByteString,
    CaseFold,
    IpAddress,
    JsonDecode,
    Matches,
    MaxBytes,
    Regex,
    Split,
    Strip,
    Unicode,
    Uuid,
)
from .operators.temporal import Date, Datetime
from .operators.complex import (AsStruct, Each, EachValue, Item, MapMapper,
                                Nested, Omit, Pick, Switch)
from .operators import udf
from .extensions import registry as ext
from . import macros
macros.register_defaults(ext)

__all__ = [
    "Validator", "Chain", "NoOp", "Predicate", "Transform", "FilterError",
    "coerce", "filter_macro",
    "ValidationSchema", "ValidationResult", "SchemaError",
    "Required", "NotEmpty", "Empty", "Optional", "Choice",
    "Length", "MinLength", "MaxLength", "ArrayOf", "ByteArray",
    "Int", "DecimalOf", "Min", "Max", "Round",
    "Strip", "CaseFold", "Split", "Regex", "Matches", "MaxBytes", "Base64Decode",
    "Uuid", "ByteString", "Unicode", "IpAddress", "JsonDecode",
    "Date", "Datetime",
    "Each", "EachValue", "Nested", "Switch", "AsStruct", "Item", "Omit", "Pick",
    "udf", "ext", "macros",
]
