from . import avroio  # noqa: F401
from . import readers  # noqa: F401
from . import warcio  # noqa: F401
from . import versioned  # noqa: F401
from .tables import TABLES, get_spark, load_all, load_table, register_views  # noqa: F401
