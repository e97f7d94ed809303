from cassandra_analytics_example_spark.sources.registry import (
    get_reader,
    get_writer,
    load_table,
    load_tables,
    read,
    write,
)

__all__ = ["get_reader", "get_writer", "load_table", "load_tables", "read", "write"]
