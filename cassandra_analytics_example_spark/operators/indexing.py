"""Corpus indexing and training-order operators:

* ``inverted_index`` — term → capped posting lists with document/collection
  frequency and explicit truncation accounting (the retrieval-side build
  step BM25 / contamination checks consume).
* ``item_affinity`` — co-occurrence Jaccard affinity over (group, item)
  observations (item-item collaborative filtering / basket analysis).
* ``deterministic_shuffle`` — seeded hash permutation assigning every row a
  reproducible (shard, position, global position) training order.

Scale discipline shared by all three: no unbounded per-group buffering.
Posting lists are capped BEFORE ``collect_list`` (window rank + filter, so
a stopword's millions of postings never sit in one aggregation buffer);
co-occurrence pairs are generated per-group with an optional deterministic
per-group cap (never a cross product across groups); the global shuffle
position uses per-shard local ranks plus a broadcast shard-offset layer —
no single-partition global window, same pattern as
``operators/chunking.py:shard_packing``.

All column algebra is ANSI-portable (md5-based hashing via
``functions/text.py:md5_u60``), so every operator is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.text import md5_u60, tokens


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_postings: int = 16,
) -> DataFrame:
    """Build a capped inverted index: one row per term with document
    frequency ``df``, collection frequency ``cf``, the top-``max_postings``
    posting doc ids (by term frequency desc, doc id asc — a total order),
    and a ``truncated`` flag marking terms whose full posting list was cut.

    Postings surface as a comma-joined string (portable across engines;
    array hashing differs between Arrow and DuckDB result readers).

    100 TB shape: two term-keyed shuffles (tf aggregation, then the window
    rank over the same key) and one term-keyed stats aggregation joined
    back.  The ``row_number`` + ``rn <= K`` filter runs BEFORE
    ``collect_list``, so the per-term aggregation buffer holds at most
    ``max_postings`` structs regardless of how common the term is — a
    stopword with 10^9 postings sorts (externally, spillable) but never
    buffers.  The df/cf aggregation is map-side-combinable.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(text_col)).alias("term"),
    )
    tf = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("dfreq"),
        F.sum("tf").cast("bigint").alias("cf"),
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    ranked = tf.withColumn("rn", F.row_number().over(w))
    post = (
        ranked.where(F.col("rn") <= max_postings)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "doc_id"))),
                    lambda s: s["doc_id"].cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return stats.join(post, "term").select(
        "term",
        F.col("dfreq").cast("bigint").alias("df"),
        "cf",
        "postings",
        (F.col("dfreq") > max_postings).alias("truncated"),
    )


def item_affinity(
    df: DataFrame,
    group_col: str,
    item_col: str,
    min_cooc: int = 2,
    max_items_per_group: int | None = None,
) -> DataFrame:
    """Item-item co-occurrence affinity: for every pair of items appearing
    in the same group (order, session, basket), the co-occurrence count and
    Jaccard affinity ``cooc / (cnt_a + cnt_b - cooc)`` over group sets.

    100 TB shape: the pair generator is a self-equi-join on the GROUP key —
    per-group quadratic, never a cross product across groups.  Real baskets
    are short; for heavy groups pass ``max_items_per_group`` to cap each
    group at its deterministically-first items (by item id) with the same
    window-rank-then-filter discipline as ``inverted_index``.  Item count
    lookups are item-keyed shuffle joins (broadcastable when the item
    dimension is small).
    """
    base = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    if max_items_per_group is not None:
        wg = Window.partitionBy("g").orderBy("item")
        base = (
            base.withColumn("_rn", F.row_number().over(wg))
            .where(F.col("_rn") <= max_items_per_group)
            .drop("_rn")
        )
    a = base.alias("a")
    b = base.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("cooc"))
        .where(F.col("cooc") >= min_cooc)
    )
    cnts = base.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        pairs.join(cnts.withColumnRenamed("item", "item_a"), "item_a")
        .withColumnRenamed("cnt", "cnt_a")
        .join(cnts.withColumnRenamed("item", "item_b"), "item_b")
        .withColumnRenamed("cnt", "cnt_b")
        .select(
            "item_a",
            "item_b",
            F.col("cooc").cast("bigint").alias("cooc"),
            F.col("cnt_a").cast("bigint").alias("cnt_a"),
            F.col("cnt_b").cast("bigint").alias("cnt_b"),
            (
                F.col("cooc").cast("double")
                / (F.col("cnt_a") + F.col("cnt_b") - F.col("cooc"))
            ).alias("jaccard"),
        )
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int = 64,
    seed: str = "epoch0",
) -> DataFrame:
    """Seeded, reproducible global permutation for training-order assignment:
    every row gets ``(shard, pos_in_shard, global_pos)`` where the order is a
    pure function of ``(seed, id)`` — re-running with the same seed yields
    the identical order on any cluster size, and a new seed (epoch) yields an
    independent permutation.  The standard "global shuffle without a global
    sort" step before sharded training-data export.

    100 TB shape: rows shuffle once on their 60-bit key's shard; each shard
    sorts locally (window over the shard partition — ``n_shards`` should be
    sized so a shard fits an executor's spill budget); the shard→offset
    layer is ``n_shards`` rows computed from per-shard counts and broadcast
    back.  No single-partition window anywhere.
    """
    key = md5_u60(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    ).alias("skey")
    keyed = df.select(
        F.col(id_col),
        key,
        (F.col("skey") % n_shards).cast("bigint").alias("shard"),
    )
    ws = Window.partitionBy("shard").orderBy("skey", id_col)
    local = keyed.withColumn(
        "pos_in_shard", (F.row_number().over(ws) - 1).cast("bigint")
    )
    sizes = keyed.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    wo = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = sizes.select(
        "shard", (F.sum("n").over(wo) - F.col("n")).cast("bigint").alias("offset")
    )
    return local.join(F.broadcast(offsets), "shard").select(
        F.col(id_col),
        "shard",
        "pos_in_shard",
        (F.col("offset") + F.col("pos_in_shard")).alias("global_pos"),
    )
