from cassandra_analytics_example_spark.operators.membership import (
    bloom_build,
    bloom_probe,
)
from cassandra_analytics_example_spark.operators.layout import (
    compact_files,
    write_bucketed,
    write_partitioned,
    zorder_write,
    zvalue,
)
from cassandra_analytics_example_spark.operators.profiling import (
    column_profile,
    constraint_audit,
    hot_keys,
    key_skew_report,
)
from cassandra_analytics_example_spark.operators.relational import (
    asof_join,
    banded_self_join,
    funnel_stages,
    lww_latest,
    salted_join,
    sessionize,
    top_k_per_group,
)
from cassandra_analytics_example_spark.operators.versioning import (
    merge_upsert,
    snapshot_diff,
)

__all__ = [
    "top_k_per_group",
    "banded_self_join",
    "bloom_build",
    "bloom_probe",
    "constraint_audit",
    "lww_latest",
    "sessionize",
    "asof_join",
    "salted_join",
    "funnel_stages",
    "snapshot_diff",
    "merge_upsert",
    "key_skew_report",
    "hot_keys",
    "column_profile",
    "zvalue",
    "zorder_write",
    "write_bucketed",
    "write_partitioned",
    "compact_files",
]
