from .validate import (  # noqa: F401
    dead_letter_writer,
    error_rate_by_window,
    events_stream,
    session_windows,
    validate_stream,
)
