from .events import events_stream, run_stream_to_memory  # noqa: F401
