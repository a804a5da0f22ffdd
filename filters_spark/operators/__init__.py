from . import simple, number, string, temporal, complex, udf  # noqa: F401
