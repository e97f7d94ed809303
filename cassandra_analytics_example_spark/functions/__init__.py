from cassandra_analytics_example_spark.functions.numeric import (
    dec,
    money_avg,
    money_sum,
    revenue_expr,
)
from cassandra_analytics_example_spark.functions.text import (
    distinct_tokens,
    md5_u60,
    normalized_text,
    shingles,
    tokens,
)
from cassandra_analytics_example_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    sign_bucket,
)

__all__ = [
    "dec",
    "money_sum",
    "money_avg",
    "revenue_expr",
    "tokens",
    "distinct_tokens",
    "shingles",
    "md5_u60",
    "normalized_text",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "sign_bucket",
]
