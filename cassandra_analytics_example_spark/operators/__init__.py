from cassandra_analytics_example_spark.operators.relational import (
    asof_join,
    lww_latest,
    sessionize,
    top_k_per_group,
)

__all__ = ["top_k_per_group", "lww_latest", "sessionize", "asof_join"]
