from . import (  # noqa: F401
    dedup,
    multimodal,
    packing,
    pii,
    profile,
    sampling,
    similarity,
    text,
    timeseries,
    url,
)
