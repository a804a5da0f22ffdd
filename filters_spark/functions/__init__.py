from . import (  # noqa: F401
    dedup,
    graph,
    multimodal,
    packing,
    pii,
    profile,
    retrieval,
    sampling,
    similarity,
    text,
    timeseries,
    url,
)
