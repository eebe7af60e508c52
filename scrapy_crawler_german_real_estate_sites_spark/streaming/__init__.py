from .stream import (  # noqa: F401
    dedup_stream,
    dup_streak_monitor,
    liveness_stream,
    page_rate_metrics,
    run_available_now,
    stream_pages,
)
