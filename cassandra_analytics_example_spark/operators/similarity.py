"""Similarity search over embedding columns (``array<float>``).

Two tiers (SURVEY.md §7 M4):

* ``brute_force_topk`` — exact: broadcast the (small) query set against the
  full corpus, per-row cosine in codegen'd column algebra, top-k via window.
  The corpus side never shuffles until the final per-query top-k (which
  shuffles only (query_id, candidate, score) triples, not vectors).
* ``lsh_topk`` — approximate scale path: sign-bit LSH buckets both sides;
  only same-bucket pairs are scored. Recall is tunable via ``n_bits``
  (fewer bits → bigger buckets → higher recall, more compute).

At 100 TB the corpus stays partitioned; queries are broadcast (dim tables).
An IVF variant would replace ``sign_bucket`` with learned centroid ids — the
plumbing (bucket → join → verify → top-k) is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.vector import (
    cosine_similarity,
    sign_bucket,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (query_id, neighbor_id, cosine, rnk). Self-matches excluded.
    Ties broken by neighbor id ascending (total order → deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("qv", "cv").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's LSH bucket.

    Same output shape as ``brute_force_topk``; queries whose bucket holds
    fewer than k neighbors return fewer rows (standard ANN behavior)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("qv", "cv").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
