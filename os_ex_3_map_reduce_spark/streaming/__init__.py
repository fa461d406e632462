from .events import (  # noqa: F401
    events_stream,
    run_stream_foreach_batch_parquet,
    run_stream_to_memory,
    running_user_totals,
    sentinel_events_dir,
    session_counts,
    sliding_counts,
    staged_events_dir,
    stream_stream_followup_join,
    tumbling_counts,
)
