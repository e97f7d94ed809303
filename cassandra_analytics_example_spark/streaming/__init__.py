from cassandra_analytics_example_spark.streaming.windows import (
    run_sessionized_stream,
    run_stream_dedup,
    run_tumbling_stream,
    sessionized_counts,
    stream_events,
    tumbling_aggregate,
)

__all__ = [
    "stream_events",
    "tumbling_aggregate",
    "sessionized_counts",
    "run_tumbling_stream",
    "run_sessionized_stream",
    "run_stream_dedup",
]
