"""Document chunking for context-window preparation: split each document
into fixed-size token windows with overlap — the step that turns a cleaned
corpus into model-ready training sequences.

Pure column algebra: tokenize once, generate chunk start offsets with
``sequence`` (stride = chunk_tokens - overlap_tokens), slice the token
array per offset, explode. One narrow projection + explode — no shuffle at
all until whatever consumes the chunks aggregates them; output size is
input size x (1 + overlap ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.text import md5_u60, tokens


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
) -> DataFrame:
    """Split each document into overlapping token-window chunks.

    Returns (id, chunk_index, chunk_text, n_chunk_tokens). Offsets step by
    ``chunk_tokens - overlap_tokens``; the final chunk is the (possibly
    short) tail — every token belongs to at least one chunk, consecutive
    chunks share ``overlap_tokens`` tokens, and a document shorter than
    one window yields exactly one chunk. Deterministic: chunk_index is the
    0-based offset rank.

    SQL twin (DuckDB): offsets via ``range(1, len(w) + 1, stride)``,
    slices via 1-based inclusive ``w[i : i + chunk - 1]``.
    """
    if overlap_tokens >= chunk_tokens:
        raise ValueError(
            f"overlap_tokens ({overlap_tokens}) must be < chunk_tokens "
            f"({chunk_tokens}) or the stride is not positive"
        )
    stride = chunk_tokens - overlap_tokens
    toked = df.select(F.col(id_col), tokens(text_col).alias("__w"))
    # 1-based start offsets: 1, 1+stride, ... while start <= len - overlap
    # (a chunk starting inside the final overlap region would contain ONLY
    # tokens the previous chunk already covers); a doc shorter than one
    # window still yields offset 1.
    offsets = F.sequence(
        F.lit(1),
        F.greatest(F.size("__w") - overlap_tokens, F.lit(1)),
        F.lit(stride),
    )
    exploded = toked.select(
        F.col(id_col),
        F.col("__w"),
        F.posexplode(offsets).alias("chunk_index", "__start"),
    )
    chunk = F.slice(F.col("__w"), F.col("__start"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_index").cast("bigint").alias("chunk_index"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
    )

def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    budget_tokens: int = 256,
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-chop sequence packing: lay documents end to end in a
    deterministic order and slice the concatenated token stream into
    fixed-``budget_tokens`` training sequences, reporting where each
    document lands (the GPT-style packing layout, minus the actual token
    copy, which belongs to the downstream writer).

    A single global concatenation order would funnel 100 TB through one
    sort, so documents are first hash-bucketed (``md5(id) % n_buckets``)
    and each bucket packs independently — the cumulative-sum window
    partitions by bucket and the widest partition is corpus/n_buckets.
    Packing quality is unaffected (each bucket chops into full-budget
    sequences; waste is at most one partial tail sequence per bucket).

    Returns (id, bucket, n_tokens, start_tok, first_seq, last_seq):
    ``start_tok`` is the document's 0-based offset in its bucket's token
    stream and ``first_seq``/``last_seq`` the budget-sized sequence ids
    its tokens straddle. Deterministic: within a bucket, documents order
    by (hash, id).
    """
    from pyspark.sql import Window

    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    h = md5_u60(F.col(id_col).cast("string"))
    sized = df.select(
        F.col(id_col),
        (h % n_buckets).alias("bucket"),
        h.alias("__h"),
        F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_tok")
    out = sized.select(F.col(id_col), "bucket", "n_tokens", start)
    return out.select(
        id_col,
        "bucket",
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / budget_tokens).alias("first_seq"),
        F.floor(
            (F.col("start_tok") + F.col("n_tokens") - 1) / budget_tokens
        ).alias("last_seq"),
    )


#: window sub-partitions per distinct size value — splits a hot size
#: (every doc truncated to one cap) across this many rank partitions.
_SHARD_SUBSPLITS = 16


def shard_packing(
    df: DataFrame,
    id_col: str,
    size_col: str,
    n_shards: int = 8,
) -> DataFrame:
    """Size-balanced export sharding: assign each document to one of
    ``n_shards`` output shards so shard byte/token totals come out nearly
    equal — the layout step before writing training shards, where a skewed
    shard becomes the stragglers of every epoch that reads it.

    Round-robin over the size-descending rank (rank r → shard r mod n):
    the deterministic streaming-friendly variant of first-fit-decreasing —
    each of the n largest documents lands in a different shard, the next n
    likewise, so shard totals differ by at most one document per round.

    The global rank is computed WITHOUT a single-partition window (a bare
    ``Window.orderBy`` funnels the whole corpus through one task — the
    classic 100 TB killer). The total order used is (size desc,
    md5-subkey, id): ranking partitions the corpus by the VALUE pair
    (size, subkey) — deterministic, no range-sampling, and the md5 subkey
    splits a hot size value (e.g. every doc truncated to the same cap)
    across ``_SHARD_SUBSPLITS`` window partitions — then local ranks are
    globalized by adding cumulative (size, subkey)-group offsets, a
    distinct-sizes×subsplits-sized layer (the vocab-sized-layer argument,
    q89) that joins back as a broadcast. Balance is identical to plain
    size-descending round-robin (the subkey only permutes WITHIN a size),
    and the order is plain SQL, so the oracle checks the assignment
    value-for-value.
    """
    sub = md5_u60(F.col(id_col).cast("string")) % F.lit(_SHARD_SUBSPLITS)
    sized = df.select(
        F.col(id_col),
        F.col(size_col).cast("bigint").alias(size_col),
        sub.alias("__sub"),
    )
    local = sized.withColumn(
        "__lr",
        F.row_number().over(
            Window.partitionBy(size_col, "__sub").orderBy(F.col(id_col).asc())
        ),
    )
    # cumulative offsets over the (size desc, sub asc) group sequence —
    # the only unpartitioned window, over the distinct-size-layer only
    wp = Window.orderBy(F.col(size_col).desc(), F.col("__sub").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        sized.groupBy(size_col, "__sub")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(wp), F.lit(0)))
        .select(F.col(size_col).alias("__sz"), "__sub", "__off")
    )
    return (
        local.join(
            F.broadcast(offsets),
            (local[size_col] == offsets["__sz"])
            & (local["__sub"] == offsets["__sub"]),
        )
        .select(
            F.col(id_col),
            local[size_col],
            ((F.col("__off") + F.col("__lr") - F.lit(1)) % F.lit(n_shards))
            .cast("int")
            .alias("shard"),
        )
    )
