from anser_spark.streaming.apm import (
    MonitorConfig,
    window_event_stats,
    event_stats_stream,
    match_command_lifecycle,
    strip_statement,
    normalize_statements,
)

__all__ = [
    "MonitorConfig",
    "window_event_stats",
    "event_stats_stream",
    "match_command_lifecycle",
    "strip_statement",
    "normalize_statements",
]
