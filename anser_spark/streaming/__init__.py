from anser_spark.streaming.apm import (
    MonitorConfig,
    window_event_stats,
    event_stats_stream,
    match_command_lifecycle,
    session_stats,
    strip_statement,
    normalize_statements,
)
from anser_spark.streaming.stateful import streaming_first_seen

__all__ = [
    "MonitorConfig",
    "window_event_stats",
    "event_stats_stream",
    "match_command_lifecycle",
    "session_stats",
    "strip_statement",
    "normalize_statements",
    "streaming_first_seen",
]
