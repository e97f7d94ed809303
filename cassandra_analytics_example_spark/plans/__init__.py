from cassandra_analytics_example_spark.plans.jobs import (
    copy_table,
    execute,
    execute_job,
    read_job,
    staged_write,
    table_to_parquet,
    two_clusters_coordinated_write,
    two_clusters_copy_table,
    write_job,
    write_read_same_table,
)

__all__ = [
    "copy_table",
    "execute",
    "execute_job",
    "read_job",
    "staged_write",
    "table_to_parquet",
    "two_clusters_coordinated_write",
    "two_clusters_copy_table",
    "write_job",
    "write_read_same_table",
]
