from . import dedup, multimodal, profile, similarity, text  # noqa: F401
