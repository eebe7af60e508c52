from .stream import (  # noqa: F401
    dup_streak_monitor,
    liveness_stream,
    page_rate_metrics,
    stream_pages,
)
