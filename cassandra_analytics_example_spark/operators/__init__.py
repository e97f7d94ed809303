from cassandra_analytics_example_spark.operators.dedup import (
    BlockingSaturationError,
    SimHashSaturationError,
    combi_blocking_plan,
    combi_key_bits,
    dedup_keep_list,
    edit_distance_neardup,
    exact_dedup,
    minhash_lsh_dedup,
    overlap_join,
    rarest_gram_block_stats,
    simhash_combi_bucket_stats,
    simhash_near_dup_pairs,
    simhash_near_dup_pairs_auto,
    simhash_near_dup_pairs_combi,
)
from cassandra_analytics_example_spark.operators.membership import (
    bloom_build,
    bloom_probe,
    bloom_pruned_read,
    file_bloom_stats,
)
from cassandra_analytics_example_spark.operators.profiling import (
    k_anonymity_audit,
    observed_write,
)
from cassandra_analytics_example_spark.operators.similarity import (
    ann_recall,
)
from cassandra_analytics_example_spark.operators.text import (
    bm25_scores,
    vocab_coverage,
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
    "ann_recall",
    "bloom_pruned_read",
    "bm25_scores",
    "BlockingSaturationError",
    "SimHashSaturationError",
    "combi_blocking_plan",
    "combi_key_bits",
    "dedup_keep_list",
    "edit_distance_neardup",
    "exact_dedup",
    "file_bloom_stats",
    "k_anonymity_audit",
    "minhash_lsh_dedup",
    "rarest_gram_block_stats",
    "observed_write",
    "overlap_join",
    "simhash_combi_bucket_stats",
    "simhash_near_dup_pairs",
    "simhash_near_dup_pairs_auto",
    "simhash_near_dup_pairs_combi",
    "vocab_coverage",
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
from cassandra_analytics_example_spark.operators.dedup import (
    incremental_lsh_clusters,
)
from cassandra_analytics_example_spark.operators.graph import (
    pagerank_integer,
    triangle_participation,
)
from cassandra_analytics_example_spark.operators.profiling import (
    functional_dependency_audit,
    hourly_anomaly_flags,
)
from cassandra_analytics_example_spark.operators.similarity import (
    pq_assign,
)
from cassandra_analytics_example_spark.operators.sketches import (
    countmin_inner_product,
)
from cassandra_analytics_example_spark.operators.text import (
    duplicated_substring_spans,
)

__all__ += [
    "incremental_lsh_clusters",
    "pagerank_integer",
    "triangle_participation",
    "functional_dependency_audit",
    "hourly_anomaly_flags",
    "pq_assign",
    "countmin_inner_product",
    "duplicated_substring_spans",
]
