from cassandra_analytics_example_spark.streaming.windows import (
    run_sessionized_stream,
    run_sliding_stream,
    run_stateful_totals,
    run_stream_countmin,
    run_stream_dedup,
    run_tumbling_stream,
    running_user_totals,
    sessionized_counts,
    sliding_aggregate,
    stream_events,
    tumbling_aggregate,
)

__all__ = [
    "stream_events",
    "tumbling_aggregate",
    "sliding_aggregate",
    "sessionized_counts",
    "running_user_totals",
    "run_tumbling_stream",
    "run_sliding_stream",
    "run_sessionized_stream",
    "run_stream_countmin",
    "run_stream_dedup",
    "run_stateful_totals",
]
