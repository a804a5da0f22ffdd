from .change_source import (  # noqa: F401
    VersionedChangesDataSource,
    apply_changes_sink,
    change_feed_stream,
)
from .validate import (  # noqa: F401
    contract_merge_sink,
    dead_letter_writer,
    dedup_stream,
    dedup_stream_stored,
    error_rate_by_window,
    events_stream,
    expectations_monitor,
    interval_join_streams,
    running_user_stats,
    session_windows,
    validate_stream,
)
