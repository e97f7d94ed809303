"""Benchmark-contamination detection: which training documents share word
n-grams with an evaluation set (the decontamination step every serious
pre-training pipeline runs before the data ships).

Scale shape: the eval side is tiny relative to the corpus (benchmarks are
thousands of docs; the corpus is 100 TB), so its distinct n-gram set is
BROADCAST — the corpus side is a scan + explode + broadcast-hash-join +
partial-aggregated groupBy on doc id. The corpus is never shuffled by the
join; the only exchange is the final per-doc aggregation, keyed on the
uniform doc id. If the eval gram set ever outgrows broadcast range, drop
the explicit broadcast and let AQE pick the join side — the operator shape
stays the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.text import word_ngrams


def ngram_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str = "text",
    ngram_n: int = 3,
) -> DataFrame:
    """Per-document eval-set overlap: for each corpus doc sharing at least
    one distinct word ``ngram_n``-gram with ``eval_set``, return
    (id, n_grams, n_hit_grams, contamination) where contamination =
    n_hit_grams / n_grams (share of the doc's distinct grams that appear
    anywhere in the eval set).

    Docs with zero overlap are absent (inner join) — at corpus scale the
    clean set is the overwhelming majority and materializing a zero row
    per clean doc is pure waste; anti-join this result against the corpus
    for the keep-list.
    """
    grams = F.array_distinct(word_ngrams(text_col, ngram_n))
    eval_grams = (
        eval_set.select(F.explode(grams).alias("gram")).distinct()
    )
    # materialize the gram array once before size+explode both consume it
    # (CollapseProject will not inline the non-cheap alias twice)
    corpus_grams = corpus.select(F.col(id_col), grams.alias("__g")).select(
        F.col(id_col),
        F.size("__g").alias("n_grams"),
        F.explode("__g").alias("gram"),
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col, "n_grams")
        .agg(F.count("*").alias("n_hit_grams"))
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.col("n_hit_grams"),
            (
                F.col("n_hit_grams").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("contamination"),
        )
    )
