"""LLM-training-data pipeline queries (SURVEY.md §7 M4) over the
``documents`` and ``embeddings`` fixtures: dedup (exact / MinHash-LSH /
SimHash / token-Jaccard / embedding-cosine), similarity search (brute-force
+ LSH), text analysis (lang-id, quality, tokens, fingerprints), multimodal
binary plumbing.

Oracles: the operators hash with md5 and compute similarity in ordered
float64 folds precisely so these pipelines stay SQL-expressible — each
oracle below recomputes signatures/scores from scratch in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.dedup import (
    simhash_near_dup_pairs_auto,
    connected_components,
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_dedup,
    simhash,
    token_jaccard_pairs,
)
from cassandra_analytics_example_spark.operators.multimodal import (
    attach_payload,
    extract_features,
    frame_sample,
)
from cassandra_analytics_example_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)
from cassandra_analytics_example_spark.operators.text import (
    detect_language,
    fingerprint,
    quality_features,
    rolling_fingerprint,
    token_stats,
)
from cassandra_analytics_example_spark.queries import register
from cassandra_analytics_example_spark.queries._tables import table

# ---------------------------------------------------------------- dedup ---


@register(
    "q20_exact_dedup",
    oracle="""
SELECT doc_id, content_hash FROM (
  SELECT doc_id, md5(text) AS content_hash,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents) WHERE rn = 1
""",
    doc="exact dedup by content hash (one survivor per md5)",
    tags=("llm", "dedup"),
)
def q20_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text").select("doc_id", "content_hash")


# DuckDB twin of functions.text.md5_u60
_U60 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"

_MINHASH_SEEDS = 16
_MINHASH_BANDS = 4
_SHINGLE_K = 5

# DuckDB twin of operators.dedup.minhash_signatures: md5 once per shingle,
# then the (a,b) universal-hash family over the reduced hash values.
from cassandra_analytics_example_spark.operators.dedup import (  # noqa: E402
    MINHASH_P,
    minhash_seeds,
)

_AB = minhash_seeds(_MINHASH_SEEDS)
_hv_expr = (
    "list_transform(range(1, length(text) - %d), i -> %s %% %d)"
    % (_SHINGLE_K - 2, _U60.format(expr=f"substr(text, i, {_SHINGLE_K})"), MINHASH_P)
)
_sig_cols = ",\n         ".join(
    f"list_min(list_transform(hv, h -> ({a} * h + {b}) % {MINHASH_P})) AS h{i}"
    for i, (a, b) in enumerate(_AB)
)
_band_structs = ", ".join(
    "{band: %d, bhash: md5(concat_ws(',', %s))}"
    % (b, ", ".join(f"CAST(h{b * 4 + r} AS VARCHAR)" for r in range(4)))
    for b in range(_MINHASH_BANDS)
)


# shared by q21 (pairs) and q41 (clusters over those pairs)
_Q21_ORACLE = f"""
WITH reps AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
),
hvals AS (
  SELECT doc_id, {_hv_expr} AS hv
  FROM reps
),
sig AS (
  SELECT doc_id,
         {_sig_cols}
  FROM hvals
),
bands AS (
  SELECT doc_id, b.band AS band, b.bhash AS bhash
  FROM sig, UNNEST([{_band_structs}]) AS t(b)
),
bsize AS (
  SELECT band, bhash, count(*) AS n FROM bands GROUP BY 1, 2
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.bhash = a.bhash AND s.n <= 1000
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
                                      i -> substr(text, i, {_SHINGLE_K}))) AS sh
  FROM reps
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
FROM cands c JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
         / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
"""


@register(
    "q21_minhash_lsh_neardup",
    oracle=_Q21_ORACLE,
    doc="MinHash(16)+LSH(4 bands) near-dup: exact-dedup pre-pass, bucket "
    "cap 1000, exact Jaccard ≥ 0.5 verification on 5-gram shingle sets",
    tags=("llm", "dedup"),
)
def q21_minhash_lsh_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return minhash_lsh_dedup(
        docs,
        "doc_id",
        "text",
        num_hashes=_MINHASH_SEEDS,
        shingle_k=_SHINGLE_K,
        num_bands=_MINHASH_BANDS,
        jaccard_threshold=0.5,
    )


@register(
    "q41_dedup_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS (
{_Q21_ORACLE}
),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
)
SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
""",
    doc="dedup clustering: connected components (min-label propagation) "
    "over the q21 MinHash-LSH near-dup pairs — (doc_id, cluster_id) where "
    "cluster_id is the min doc_id in the component; oracle is a recursive "
    "transitive closure",
    tags=("llm", "dedup"),
)
def q41_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(
        docs,
        "doc_id",
        "text",
        num_hashes=_MINHASH_SEEDS,
        shingle_k=_SHINGLE_K,
        num_bands=_MINHASH_BANDS,
        jaccard_threshold=0.5,
    )
    cc = connected_components(pairs)
    return cc.select(F.col("id").alias("doc_id"), F.col("cluster_id"))


@register(
    "q22_token_jaccard_neardup",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
toks AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> array_to_string(w[i:i+2], ' '))) AS toks
  FROM w
),
tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM toks
),
dfreq AS (
  SELECT tok, count(*) AS dfreq FROM tok GROUP BY tok
),
blocked AS (
  SELECT doc_id, tok AS block_tok FROM (
    SELECT t.doc_id, t.tok,
           row_number() OVER (PARTITION BY t.doc_id ORDER BY d.dfreq, t.tok) AS rn
    FROM tok t JOIN dfreq d USING (tok)) WHERE rn <= 3
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blocked a JOIN blocked b
    ON a.block_tok = b.block_tok AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
FROM cands c JOIN toks a ON c.id_a = a.doc_id JOIN toks b ON c.id_b = b.doc_id
WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         / (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.3
""",
    doc="word-3-gram Jaccard near-dup with 3-rarest-gram (min document "
    "frequency) blocking + exact Jaccard verification",
    tags=("llm", "dedup"),
)
def q22_token_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return token_jaccard_pairs(docs, "doc_id", "text", threshold=0.3, n_blocks=3)


_SIMHASH_BITS = 60
# votes over a precomputed per-feature hash list `hv` (md5 once per 3-gram)
_simhash_votes = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hv, "
    f"h -> ((h >> {b}) & 1) * 2 - 1)) > 0 "
    f"THEN {1 << b} ELSE 0 END)"
    for b in range(_SIMHASH_BITS)
)
_simhash_hv = (
    "list_transform(list_distinct(list_transform(range(1, len(w) - 1), "
    "i -> array_to_string(w[i:i+2], ' '))), g -> %s)"
    % _U60.format(expr="g")
)
# corpus-scaled band width: smallest w in [8, 15] with 2^w >= 4*N (else 15)
# — the oracle twin of operators/dedup.py:auto_band_width (margin=2,
# min_width=8, 60-bit fingerprint / 4 bands). pow(2, w) is float but exact
# for w <= 15, and the comparison against integer 4*N is exact far past any
# fixture. Hamming verifies over the FULL 60 bits, so the pair set is
# band-width-invariant; the width only sets the random-collision floor.
_SIMHASH_PARAMS_SQL = """params AS (
  SELECT w FROM range(8, 16) t(w),
              (SELECT count(*) AS n FROM documents) c
  WHERE pow(2, w) >= 4 * c.n OR w = 15
  ORDER BY w LIMIT 1
)"""
_SIMHASH_BANDED_SQL = """banded AS (
  SELECT doc_id, simhash, band,
         ((simhash >> (band * w)) & ((1::BIGINT << w) - 1)) AS bb
  FROM fp, params, UNNEST([0, 1, 2, 3]) AS t(band)
)"""


@register(
    "q23_simhash_hamming",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
hvals AS (
  SELECT doc_id, {_simhash_hv} AS hv FROM w
),
fp AS (
  -- empty feature set (< 3 tokens) => no fingerprint, excluded from banding
  -- (mirrors simhash() returning NULL instead of an all-zero "fingerprint")
  SELECT doc_id, CAST({_simhash_votes} AS BIGINT) AS simhash
  FROM hvals WHERE len(hv) > 0
),
{_SIMHASH_PARAMS_SQL},
{_SIMHASH_BANDED_SQL}
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM banded a JOIN banded b
  ON a.band = b.band AND a.bb = b.bb AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
    doc="SimHash(60-bit) near-dup pairs, hamming <= 3, via pigeonhole "
    "4-band blocking with corpus-scaled band width (w ~ log2(4N), "
    "auto_band_width — full recall at any width, random-collision floor "
    "linear in N) + exact hamming verify",
    tags=("llm", "dedup"),
)
def q23_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs_auto(
        docs, "doc_id", "text", n_bits=_SIMHASH_BITS, n_bands=4, max_hamming=3
    )


@register(
    "q24_embedding_neardup",
    oracle="""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END)
       + (CASE WHEN embedding[5] >= 0 THEN 16 ELSE 0 END)
       + (CASE WHEN embedding[6] >= 0 THEN 32 ELSE 0 END)
       + (CASE WHEN embedding[7] >= 0 THEN 64 ELSE 0 END)
       + (CASE WHEN embedding[8] >= 0 THEN 128 ELSE 0 END) AS bucket
  FROM embeddings
)
SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
       list_cosine_similarity(a.v, b2.v) AS cosine
FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
WHERE list_cosine_similarity(a.v, b2.v) >= 0.4
""",
    doc="embedding-cosine near-dup: 8-bit sign-LSH blocking + exact verify",
    tags=("llm", "dedup"),
)
def q24_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.4, n_bits=8)


# ----------------------------------------------------------- similarity ---


@register(
    "q25_knn_bruteforce",
    oracle="""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT q.query_id, c.neighbor_id,
         list_cosine_similarity(q.qv, c.cv) AS cosine,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                                     c.neighbor_id ASC) AS rnk
  FROM q JOIN c ON q.query_id <> c.neighbor_id
) WHERE rnk <= 5
""",
    doc="exact ANN baseline: brute-force cosine top-5 for 10 query vectors",
    tags=("llm", "similarity"),
)
def q25_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5)


@register(
    "q26_knn_lsh",
    oracle="""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, c.v) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                     c.vec_id ASC) AS rnk
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
) WHERE rnk <= 5
""",
    doc="LSH-bucketed approximate ANN (4 sign bits) — the scale path",
    tags=("llm", "similarity"),
)
def q26_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries, k=5, n_bits=4)


@register(
    "q32_knn_ivf",
    oracle="""
WITH cents AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS centv
  FROM embeddings WHERE vec_id < 8
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cells AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT v.vec_id, v.v, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_cosine_similarity(v.v, c.centv) DESC,
                                       c.cent_id ASC) AS rn
    FROM v, cents c) WHERE rn = 1
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, c.v) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                     c.vec_id ASC) AS rnk
  FROM cells q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
) WHERE rnk <= 5
""",
    doc="IVF(1-probe) approximate ANN: 8 Voronoi cells around deterministic "
    "centroids, search within the query's cell only",
    tags=("llm", "similarity"),
)
def q32_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, queries, k=5, n_cells=8)


# ------------------------------------------------------------- text ------


@register(
    "q27_text_quality",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS DOUBLE) AS n_chars_calc,
       len(string_split(text, ' ')) AS n_tokens,
       (CAST(length(text) AS DOUBLE) - (len(string_split(text, ' ')) - 1))
         / len(string_split(text, ' ')) AS mean_tok_len,
       (CAST(length(text) AS DOUBLE)
         - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
         / length(text) AS punct_ratio,
       CAST(len(list_filter(string_split(text, ' '),
                t -> list_contains(['the','and','of','to','a'], t))) AS DOUBLE)
         / len(string_split(text, ' ')) AS stop_ratio,
       least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
         + (1.0 - (CAST(length(text) AS DOUBLE)
              - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
              / length(text)) * 0.3
         + CAST(len(list_filter(string_split(text, ' '),
                  t -> list_contains(['the','and','of','to','a'], t))) AS DOUBLE)
              / len(string_split(text, ' ')) * 0.3 AS quality_score
FROM documents
""",
    doc="quality-filter features: length/token/punct/stopword signals",
    tags=("llm", "text"),
)
def q27_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return quality_features(docs, "text").select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "mean_tok_len",
        "punct_ratio",
        "stop_ratio",
        "quality_score",
    )


_LANG_CASES = """
SELECT doc_id, lang,
  len(list_intersect(toks, ['the','and','of','to','a'])) AS s_en,
  len(list_intersect(toks, ['der','die','und','das','ist'])) AS s_de,
  len(list_intersect(toks, ['le','la','et','les','des'])) AS s_fr,
  len(list_intersect(toks, ['el','la','de','y','que'])) AS s_es,
  len(list_intersect(toks, ['de5','shi4','le5','zai4','he2'])) AS s_zh
FROM (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks FROM documents)
"""


@register(
    "q28_langid_confusion",
    oracle=f"""
WITH scored AS ({_LANG_CASES}),
pred AS (
  SELECT doc_id, lang,
    CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'und'
         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
         WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
         ELSE 'zh' END AS pred_lang
  FROM scored
)
SELECT lang, pred_lang, count(*) AS n FROM pred GROUP BY 1, 2
""",
    doc="heuristic language-ID (stopword-marker voting) confusion matrix",
    tags=("llm", "text"),
)
def q28_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        detect_language(docs, "text")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q29_fingerprint_groups",
    oracle="""
SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g'))) AS fingerprint,
       count(*) AS n_docs,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY 1
""",
    doc="canonical-form fingerprint groups (case/punct-insensitive dedup)",
    tags=("llm", "text"),
)
def q29_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        fingerprint(docs, "doc_id", "text")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@register(
    "q33_token_stats",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT)
         AS n_re_tokens,
       CAST(length(text) AS DOUBLE)
         / len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))
         AS chars_per_tok
FROM documents
""",
    doc="token accounting: whitespace vs BPE-ish regex tokenization + "
    "chars-per-token, per document",
    tags=("llm", "text"),
)
def q33_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return token_stats(docs, "doc_id", "text")


@register(
    "q34_rolling_fingerprint",
    oracle="""
WITH fp AS (
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                                  list_transform(string_split(substr(text, 1, 64), ''),
                                                 c -> CAST(ascii(c) AS BIGINT))),
                     (acc, x) -> (acc * 31 + x) % 2147483647) AS rhash
  FROM documents
)
SELECT rhash, count(*) AS n_docs, min(doc_id) AS first_doc
FROM fp GROUP BY rhash HAVING count(*) > 1
""",
    doc="Rabin-Karp rolling-hash fingerprint of the leading 64-char chunk "
    "(shared-boilerplate detection); duplicate groups (n>1) with first doc",
    tags=("llm", "text"),
)
def q34_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        rolling_fingerprint(docs, "doc_id", "text", prefix_len=64)
        .groupBy("rhash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------- multimodal ---


@register(
    "q30_multimodal_features",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(length(text) % 640 + 1 AS DOUBLE)
         / CAST(length(text) % 480 + 1 AS DOUBLE) AS aspect
FROM documents
""",
    doc="multimodal plumbing: binary payload + metadata → mapInPandas "
    "feature extraction (Arrow-batched); container decode is REAL for "
    "netpbm via decode_image — this query exercises the byte-level "
    "fake-feature path whose oracle is SQL-expressible",
    tags=("llm", "multimodal"),
)
def q30_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    feats = extract_features(attach_payload(docs))
    return feats.select("doc_id", "n_bytes", "payload_md5", "aspect")


@register(
    "q31_frame_sampling",
    oracle="""
SELECT doc_id,
       CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT) AS n_frames,
       octet_length(encode(text)) AS total_bytes
FROM documents
""",
    doc="frame-sampling plumbing: payload → byte-stride samples via "
    "mapInPandas, re-aggregated",
    tags=("llm", "multimodal"),
)
def q31_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    frames = frame_sample(attach_payload(docs), every_n_bytes=64)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.length("frame_bytes")).alias("total_bytes"),
    )


# ------------------------------------------------- pipeline operations ---
# split / decontamination / filter: the steps between "corpus" and
# "training set" that every pre-training pipeline runs after dedup.


@register(
    "q42_hash_split",
    oracle="""
SELECT doc_id,
       CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 10000 < 9000 THEN 'train'
            WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    doc="deterministic train/val/test split (90/5/5) by md5 hash-bucket of "
    "doc_id — no RNG, stable under repartitioning and corpus growth, pure "
    "projection (no shuffle)",
    tags=("llm", "sampling"),
)
def q42_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import hash_split

    docs = table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id").select("doc_id", "split")


_CONTAM_N = 4


@register(
    "q43_eval_contamination",
    oracle=f"""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - {_CONTAM_N - 2}),
             i -> array_to_string(w[i:i+{_CONTAM_N - 1}], ' '))) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
ev AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
),
cg AS (
  SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
  FROM g WHERE doc_id % 97 <> 0
)
SELECT cg.doc_id, cg.n_grams, count(*) AS n_hit_grams,
       CAST(count(*) AS DOUBLE) / cg.n_grams AS contamination
FROM cg JOIN ev USING (gram)
GROUP BY cg.doc_id, cg.n_grams
""",
    doc=f"benchmark decontamination: corpus docs sharing any word "
    f"{_CONTAM_N}-gram with the eval slice (doc_id % 97 = 0) — broadcast "
    f"eval-gram join, corpus never shuffled by the join",
    tags=("llm", "contamination"),
)
def q43_eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.contamination import (
        ngram_contamination,
    )

    docs = table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    out = ngram_contamination(corpus, eval_set, "doc_id", "text", _CONTAM_N)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("bigint").alias("n_grams"),
        "n_hit_grams",
        "contamination",
    )


@register(
    "q44_quality_filter",
    oracle="""
WITH f AS (
  SELECT doc_id,
    len(string_split(text, ' ')) AS n_tokens,
    CAST(len(list_filter(string_split(text, ' '),
             t -> list_contains(['the','and','of','to','a'], t))) AS DOUBLE)
      / len(string_split(text, ' ')) AS stop_ratio,
    (CAST(length(text) AS DOUBLE)
      - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
      / length(text) AS punct_ratio
  FROM documents)
SELECT doc_id, n_tokens, stop_ratio,
       CASE WHEN n_tokens < 15 THEN 'too_short'
            WHEN punct_ratio > 0.2 THEN 'too_much_punct'
            WHEN stop_ratio = 0 THEN 'no_stopwords'
            ELSE 'keep' END AS verdict
FROM f
""",
    doc="C4/Gopher-style quality filter verdicts: first failing rule wins "
    "(too_short < 15 tokens, punct > 0.2, zero stopwords), else keep — "
    "composition of quality_features, pure codegen projection",
    tags=("llm", "text"),
)
def q44_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    f = quality_features(docs, "text")
    verdict = (
        F.when(F.col("n_tokens") < 15, F.lit("too_short"))
        .when(F.col("punct_ratio") > 0.2, F.lit("too_much_punct"))
        .when(F.col("stop_ratio") == 0, F.lit("no_stopwords"))
        .otherwise(F.lit("keep"))
    )
    return f.select("doc_id", "n_tokens", "stop_ratio", verdict.alias("verdict"))


@register(
    "q46_dedup_keep_list",
    oracle=f"""
WITH RECURSIVE pairs AS (
{_Q21_ORACLE}
),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
),
clusters AS (
  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
),
reps AS (
  SELECT doc_id FROM (
    SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
)
SELECT doc_id FROM reps
WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)
""",
    doc="end-to-end dedup keep-list: exact-dedup representatives minus "
    "non-representative near-dup cluster members — the surviving training "
    "set (exact_dedup -> MinHash-LSH pairs -> connected components -> "
    "anti-join)",
    tags=("llm", "dedup"),
)
def q46_dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import dedup_keep_list

    docs = table(spark, sf_dir, "documents")
    return dedup_keep_list(
        docs,
        "doc_id",
        "text",
        num_hashes=_MINHASH_SEEDS,
        shingle_k=_SHINGLE_K,
        num_bands=_MINHASH_BANDS,
        jaccard_threshold=0.5,
    )


@register(
    "q47_embedding_dim_stats",
    oracle="""
WITH ex AS (
  SELECT label, CAST(t.i AS BIGINT) AS dim,
         CAST(embedding[t.i + 1] AS DOUBLE) AS x
  FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)
)
SELECT label, dim,
       (CAST(sum(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE) / count(*)) / 1e9
         AS centroid,
       min(x) AS dmin, max(x) AS dmax, count(*) AS n
FROM ex GROUP BY label, dim
""",
    doc="per-label per-dimension embedding stats (centroid/min/max/count) — "
    "posexplode + map-side partial aggregation; fixed-point (1e-9) integer "
    "accumulation makes the mean parallelism- and engine-invariant",
    tags=("llm", "similarity"),
)
def q47_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        embedding_dim_stats,
    )

    emb = table(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb, "label", "embedding")


@register(
    "q48_top_ngrams_per_lang",
    oracle="""
WITH g AS (
  SELECT lang, unnest(list_distinct(list_transform(range(1, len(w) - 1),
         i -> array_to_string(w[i:i+2], ' ')))) AS gram
  FROM (SELECT lang, string_split(text, ' ') AS w FROM documents)
),
df AS (
  SELECT lang, gram, count(*) AS dfreq FROM g GROUP BY lang, gram
)
SELECT lang, gram, dfreq, CAST(rnk AS INT) AS rnk FROM (
  SELECT lang, gram, dfreq,
         row_number() OVER (PARTITION BY lang
                            ORDER BY dfreq DESC, gram ASC) AS rnk
  FROM df) WHERE rnk <= 5
""",
    doc="corpus vocabulary profile: top-5 word-3-grams per language by "
    "document frequency (deterministic tiebreak), explode + count + "
    "windowed top-k",
    tags=("llm", "text"),
)
def q48_top_ngrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import word_ngrams
    from cassandra_analytics_example_spark.operators.relational import (
        top_k_per_group,
    )

    docs = table(spark, sf_dir, "documents")
    g = docs.select(
        "lang", F.explode(F.array_distinct(word_ngrams("text", 3))).alias("gram")
    )
    dfreq = g.groupBy("lang", "gram").agg(F.count("*").alias("dfreq"))
    top = top_k_per_group(
        dfreq, ["lang"], [F.desc("dfreq"), F.asc("gram")], 5, rank_col="rnk"
    )
    return top.select("lang", "gram", "dfreq", F.col("rnk").cast("int").alias("rnk"))


@register(
    "q52_kmeans_cells",
    oracle="""
SELECT 'all_assigned' AS check_name, true AS ok,
       CAST(count(*) AS BIGINT) AS n FROM embeddings
UNION ALL SELECT 'assignment_is_argmax', true, 0
UNION ALL SELECT 'objective_non_decreasing', true, 0
UNION ALL SELECT 'cells_within_k', true, 0
""",
    doc="Lloyd's KMeans (3 fixed iterations, fixed-point means) over the "
    "embeddings, value-gated via its INVARIANTS (learned floats aren't "
    "SQL-matchable; booleans the math guarantees are): every vector "
    "assigned, assignment == an independently-computed argmax, spherical "
    "objective non-decreasing across iterations, cell count <= k "
    "(operators/similarity.py:kmeans_invariants); per-cell profile stays "
    "available via kmeans_cell_profile + pytest determinism gates",
    tags=("llm", "similarity", "iterative"),
)
def q52_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        kmeans_invariants,
    )

    emb = table(spark, sf_dir, "embeddings")
    return kmeans_invariants(emb, k=8, n_iter=3)


@register(
    "q54_knn_multiprobe",
    oracle="""
WITH b AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM embeddings
),
probes AS (
  SELECT vec_id, v, unnest([bucket,
                            xor(bucket, 1), xor(bucket, 2),
                            xor(bucket, 4), xor(bucket, 8)]) AS bucket
  FROM b WHERE vec_id < 10
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, c.v) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                     c.vec_id ASC) AS rnk
  FROM probes q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
) WHERE rnk <= 5
""",
    doc="multi-probe sign-LSH ANN (own bucket + all hamming-1 buckets): "
    "the recall fix for near-hyperplane vectors, at (n_bits+1)x scoring "
    "cost — corpus still lives in exactly one bucket (no dedup needed)",
    tags=("llm", "similarity"),
)
def q54_knn_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        multiprobe_lsh_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return multiprobe_lsh_topk(emb, queries, k=5, n_bits=4)


@register(
    "q55_document_chunking",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
off AS (
  SELECT doc_id, w, CAST(t.o AS BIGINT) AS start
  FROM w, UNNEST(range(1, greatest(len(w) - 8, 1) + 1, 56)) AS t(o)
)
SELECT doc_id, (start - 1) // 56 AS chunk_index,
       array_to_string(w[start : start + 63], ' ') AS chunk_text,
       CAST(len(w[start : start + 63]) AS BIGINT) AS n_chunk_tokens
FROM off
""",
    doc="context-window chunking: 64-token windows, 8-token overlap "
    "(stride 56) — turns the cleaned corpus into model-ready sequences; "
    "pure projection + explode, zero shuffle",
    tags=("llm", "text"),
)
def q55_document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.chunking import (
        chunk_documents,
    )

    docs = table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", 64, 8)


# ------------------------------------------------- privacy / repetition ---


@register(
    "q56_pii_redaction",
    oracle="""
WITH p AS (
  SELECT doc_id, text ||
    CASE WHEN doc_id % 2 = 0
         THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@example.com'
         ELSE '' END ||
    CASE WHEN doc_id % 3 = 0
         THEN ' from 10.' || CAST(doc_id % 250 AS VARCHAR) || '.0.1'
         ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN ' call +1 555-000-1234' ELSE '' END AS t
  FROM documents)
SELECT doc_id,
  CAST(len(regexp_extract_all(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
    AS n_email,
  CAST(len(regexp_extract_all(t,
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS n_ip,
  CAST(len(regexp_extract_all(t,
      '\\+\\d{1,3} \\d{3}-\\d{3}-\\d{4}')) AS BIGINT) AS n_phone,
  regexp_replace(regexp_replace(regexp_replace(t,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '[IP]', 'g'),
      '\\+\\d{1,3} \\d{3}-\\d{3}-\\d{4}', '[PHONE]', 'g') AS redacted
FROM p
""",
    doc="PII redaction pass: per-class match counts + placeholder-redacted "
    "text (emails, IPv4, phone numbers; deterministic synthetic PII "
    "planted per doc_id residue so the scrub is exercised non-trivially) — "
    "pure regexp projection, zero shuffle, RE2-safe patterns",
    tags=("llm", "privacy"),
)
def q56_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import redact_pii

    docs = table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    planted = F.concat(
        F.col("text"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit(" contact u"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" from 10."), (d % 250).cast("string"), F.lit(".0.1")),
        ).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit(" call +1 555-000-1234")).otherwise(F.lit("")),
    )
    return redact_pii(docs.select("doc_id", planted.alias("text"))).select(
        "doc_id", "n_email", "n_ip", "n_phone", "redacted"
    )


@register(
    "q57_repetition_signals",
    oracle="""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
           FROM documents),
c AS (SELECT doc_id, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             count(*) AS n_distinct, max(cnt) AS top_cnt
      FROM c GROUP BY 1),
g AS (SELECT doc_id, len(grams) AS ng, len(list_distinct(grams)) AS ndg
      FROM (SELECT doc_id,
                   list_transform(range(1, len(w)),
                                  i -> array_to_string(w[i:i+1], ' ')) AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM documents)))
SELECT a.doc_id, a.n_tokens,
       1.0 - CAST(n_distinct AS DOUBLE) / n_tokens AS dup_token_ratio,
       CAST(top_cnt AS DOUBLE) / n_tokens AS top_token_share,
       CASE WHEN ng > 0 THEN 1.0 - CAST(ndg AS DOUBLE) / ng END
         AS dup_2gram_ratio
FROM a JOIN g USING (doc_id)
""",
    doc="Gopher-style repetition filters: duplicate-token fraction, "
    "top-token share, duplicate word-2-gram fraction — all three as a "
    "zero-shuffle projection (sorted-array run-length fold per doc); "
    "the oracle recomputes them via explode + groupBy",
    tags=("llm", "quality"),
)
def q57_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import (
        repetition_signals,
    )

    docs = table(spark, sf_dir, "documents")
    return repetition_signals(docs, "doc_id")


@register(
    "q58_stratified_sample",
    oracle="""
WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY 1),
m AS (SELECT min(cnt) AS mn FROM c)
SELECT d.doc_id, d.lang
FROM documents d JOIN c USING (lang), m
WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
       % 10000) * cnt < mn * 10000
""",
    doc="class-balancing stratified downsample: every language stratum "
    "kept at the smallest stratum's rate via exact integer cross-product "
    "compare (bucket*count < min*10000) — tiny groupBy broadcast back, "
    "keep decision is a pure hash projection, corpus never shuffled",
    tags=("llm", "sampling"),
)
def q58_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import (
        stratified_downsample,
    )

    docs = table(spark, sf_dir, "documents")
    return stratified_downsample(docs, "lang", "doc_id").select(
        "doc_id", "lang"
    )


@register(
    "q59_tfidf_top_terms",
    oracle="""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
pd AS (SELECT doc_id, term, count(*) AS tf_cnt FROM t GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(sum(tf_cnt) AS BIGINT) AS len FROM pd GROUP BY 1),
f AS (SELECT term, count(*) AS dfreq FROM pd GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT pd.doc_id, pd.term,
             (CAST(tf_cnt AS DOUBLE) / len) * (CAST(n AS DOUBLE) / dfreq)
               AS tfidf
      FROM pd JOIN dl USING (doc_id) JOIN f USING (term), n)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
  FROM s) WHERE rank <= 3
""",
    doc="top-3 characteristic terms per document by tf-idf (rarity as the "
    "exact rational N/df — same ranking as log idf, bit-reproducible "
    "across engines); document-frequency table broadcast back, top-k "
    "window over the uniform doc id",
    tags=("llm", "text"),
)
def q59_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import (
        tf_idf_top_terms,
    )

    docs = table(spark, sf_dir, "documents")
    return tf_idf_top_terms(docs, "doc_id", "text", 3)


@register(
    "q60_sequence_packing",
    oracle="""
WITH s AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
o AS (
  SELECT doc_id, h % 64 AS bucket, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY h % 64 ORDER BY h, doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start_tok
  FROM s)
SELECT doc_id, bucket, n_tokens, start_tok,
       start_tok // 256 AS first_seq,
       (start_tok + n_tokens - 1) // 256 AS last_seq
FROM o
""",
    doc="concat-and-chop sequence packing layout: documents hash-bucketed "
    "(64 buckets) then laid end to end per bucket, 256-token training "
    "sequences — cumulative-sum window partitioned by bucket so no global "
    "sort; reports each doc's stream offset and straddled sequence ids",
    tags=("llm", "chunking"),
)
def q60_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.chunking import (
        pack_sequences,
    )

    docs = table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", 256, 64)


@register(
    "q61_incremental_dedup",
    oracle="""
WITH seen AS (SELECT md5(text) AS content_hash FROM documents
              WHERE doc_id % 7 = 0),
batch AS (SELECT doc_id, md5(text) AS content_hash FROM documents
          WHERE doc_id % 3 = 0)
SELECT b.doc_id, b.content_hash FROM batch b
WHERE NOT EXISTS (SELECT 1 FROM seen s
                  WHERE s.content_hash = b.content_hash)
""",
    doc="incremental exact dedup of a new batch (doc_id % 3) against a "
    "prior corpus hash inventory (doc_id % 7) — models a partially "
    "overlapping recrawl; LEFT ANTI join on the uniform md5 key, "
    "inventory is 32 bytes/doc so it broadcasts",
    tags=("llm", "dedup"),
)
def q61_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import dedup_against

    docs = table(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    seen = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.md5("text").alias("content_hash")
    )
    return dedup_against(batch, seen, "doc_id").select("doc_id", "content_hash")


# ----------------------------------------------------- balancing / caps ---


@register(
    "q64_language_upsample",
    oracle="""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
m AS (SELECT max(n) AS mx FROM c),
r AS (SELECT lang, least(30000, mx * 10000 // n) AS tk FROM c, m),
d AS (SELECT doc_id, d.lang,
             tk // 10000 +
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                       AS BIGINT) % 10000 < tk % 10000
                  THEN 1 ELSE 0 END AS nc
      FROM documents d JOIN r USING (lang))
SELECT doc_id, lang, CAST(unnest(range(1, nc + 1)) AS BIGINT) AS copy_idx
FROM d
""",
    doc="temperature-style language rebalancing: every language upsampled "
    "toward the largest one by deterministic row replication, capped at "
    "3x — exact integer rates, hash-selected fractional copies, "
    "explode(sequence) fan-out with zero corpus shuffle",
    tags=("llm", "sampling"),
)
def q64_language_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import (
        weighted_upsample,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang")
    up = weighted_upsample(docs, "lang", "doc_id", cap=3.0)
    return up.select(
        "doc_id", "lang", F.col("copy_idx").cast("bigint").alias("copy_idx")
    )


@register(
    "q65_domain_caps",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'http://site' || CAST(doc_id % 7 AS VARCHAR) ||
         '.example.com/page/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents WHERE doc_id % 2 = 0),
d AS (SELECT doc_id, regexp_extract(url, 'https?://([^/]+)', 1) AS domain
      FROM u),
rk AS (SELECT doc_id, domain,
              row_number() OVER (
                PARTITION BY domain
                ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                              AS BIGINT), doc_id) AS rnk
       FROM d)
SELECT doc_id, domain, CAST(rnk AS BIGINT) AS rnk
FROM rk WHERE rnk <= 20
""",
    doc="per-domain document caps (web-pipeline boilerplate defense): "
    "extract the registrable host, keep a deterministic hash-ordered "
    "sample of at most 20 docs per domain — one shuffle on the domain "
    "key, md5 order makes the kept set reproducible",
    tags=("llm", "sampling"),
)
def q65_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import md5_u60
    from cassandra_analytics_example_spark.operators.relational import (
        top_k_per_group,
    )

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("http://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    domains = with_url.select(
        "doc_id",
        F.regexp_extract("url", r"https?://([^/]+)", 1).alias("domain"),
    )
    capped = top_k_per_group(
        domains,
        ["domain"],
        [md5_u60(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()],
        20,
    )
    return capped.select(
        "doc_id", "domain", F.col("rnk").cast("bigint").alias("rnk")
    )


# ------------------------------------------------------- snapshot diff ---


@register(
    "q66_snapshot_diff",
    oracle="""
WITH old AS (
  SELECT doc_id, md5(concat_ws(chr(31), text, lang)) AS h
  FROM documents WHERE doc_id % 7 != 0),
new AS (
  SELECT doc_id,
         md5(concat_ws(chr(31),
             CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]' ELSE text END,
             lang)) AS h
  FROM documents WHERE doc_id % 11 != 0)
SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
       CASE WHEN o.h IS NULL THEN 'added'
            WHEN n.h IS NULL THEN 'removed'
            WHEN o.h != n.h THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
WHERE NOT (o.h IS NOT NULL AND n.h IS NOT NULL AND o.h = n.h)
""",
    doc="snapshot diff for incremental corpus refreshes: full-outer join "
    "of two snapshot hash inventories (32 bytes/doc, never the payload) "
    "classifying added/removed/changed — old drops doc_id%7, new drops "
    "doc_id%11 and revises doc_id%5",
    tags=("llm", "versioning"),
)
def q66_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.versioning import (
        snapshot_diff,
    )

    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 0).select("doc_id", "text", "lang")
    new = docs.filter(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    return snapshot_diff(old, new, "doc_id", ["text", "lang"])


# --------------------------------------------------- unigram LM scoring ---


@register(
    "q67_unigram_logprob",
    oracle="""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
pd AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
v AS (SELECT term, sum(tf) AS cnt FROM pd GROUP BY 1),
tot AS (SELECT sum(cnt) AS total FROM v),
sv AS (SELECT term,
              CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                         * 10000) AS BIGINT) AS logp_q
       FROM v, tot)
SELECT pd.doc_id,
       CAST(sum(pd.tf * sv.logp_q) AS BIGINT) AS score_qnats,
       CAST(sum(pd.tf) AS BIGINT) AS n_tokens
FROM pd JOIN sv USING (term)
GROUP BY pd.doc_id
""",
    doc="unigram LM quality score: per-token ln(count/total) quantized to "
    "integer deci-millinats so per-doc sums are order-independent and "
    "engine-exact — vocabulary broadcast, corpus shuffled only on "
    "(doc, term) then doc id",
    tags=("llm", "quality"),
)
def q67_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import (
        unigram_logprob_scores,
    )

    docs = table(spark, sf_dir, "documents")
    return unigram_logprob_scores(docs, "doc_id")


# -------------------------------------------------- vector quantization ---


@register(
    "q71_int8_quantization",
    oracle="""
WITH b AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings)
SELECT vec_id,
       CASE WHEN mx = 0 THEN array_to_string(list_transform(x, v -> 0), ',')
            ELSE array_to_string(list_transform(x,
                   v -> CAST(floor(v * 127 / mx + 0.5) AS BIGINT)), ',')
       END AS q_csv,
       CASE WHEN mx = 0 THEN 0.0 ELSE mx / 127 END AS scale,
       CASE WHEN mx = 0 THEN 0.0
            ELSE list_max(list_transform(
                   list_zip(x, list_transform(x,
                     v -> CAST(floor(v * 127 / mx + 0.5) AS BIGINT))),
                   p -> abs(CAST(p[2] AS DOUBLE) * (mx / 127) - p[1])))
       END AS max_abs_err
FROM b
""",
    doc="symmetric per-vector int8 quantization (4x ANN memory reduction): "
    "round-half-up via floor arithmetic so tie-breaking is engine-exact; "
    "per-vector scale + order-independent max reconstruction error",
    tags=("llm", "similarity", "scale"),
)
def q71_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        quantize_int8,
    )

    return quantize_int8(table(spark, sf_dir, "embeddings"), "vec_id")


# --------------------------------------------- duplicated-span coverage ---


@register(
    "q73_duplicate_ngram_coverage",
    oracle="""
WITH g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 3),
         i -> array_to_string(w[i:i+4], ' ')))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
f AS (SELECT doc_id, gram,
             count(*) OVER (PARTITION BY gram) AS dfreq
      FROM g)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       CAST(sum(CASE WHEN dfreq >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS dup_coverage
FROM f GROUP BY doc_id
""",
    doc="duplicated-span coverage: fraction of each doc's distinct word "
    "5-grams occurring in another document (Lee-et-al-style substring-"
    "dedup signal) — dfreq as a window over the single gram lineage, "
    "ratio as one exact-integer division",
    tags=("llm", "dedup"),
)
def q73_duplicate_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import (
        duplicate_ngram_coverage,
    )

    docs = table(spark, sf_dir, "documents")
    return duplicate_ngram_coverage(docs, "doc_id", "text", 5)


# ------------------------------------------------ deletion propagation ---


@register(
    "q76_forget_propagation",
    oracle="""
WITH forget AS (SELECT doc_id FROM documents WHERE doc_id % 13 = 0),
chunks AS (
  SELECT doc_id, (start - 1) // 56 AS chunk_index
  FROM (SELECT doc_id, unnest(range(1, greatest(len(string_split(text,' ')) - 7, 1), 56)) AS start
        FROM documents)),
kept_docs AS (
  SELECT d.doc_id FROM documents d
  WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.doc_id = d.doc_id)),
kept_chunks AS (
  SELECT c.doc_id FROM chunks c
  WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.doc_id = c.doc_id)),
kept_vecs AS (
  SELECT e.vec_id FROM embeddings e
  WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.doc_id = e.vec_id))
SELECT 'documents' AS table_name,
       CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_before,
       CAST((SELECT count(*) FROM kept_docs) AS BIGINT) AS n_after
UNION ALL
SELECT 'chunks',
       CAST((SELECT count(*) FROM chunks) AS BIGINT),
       CAST((SELECT count(*) FROM kept_chunks) AS BIGINT)
UNION ALL
SELECT 'embeddings',
       CAST((SELECT count(*) FROM embeddings) AS BIGINT),
       CAST((SELECT count(*) FROM kept_vecs) AS BIGINT)
""",
    doc="right-to-be-forgotten propagation: a forget list (doc_id % 13) "
    "anti-joined through every derived table — raw documents, their "
    "64-token chunks, and doc-keyed embeddings — emitting per-table "
    "before/after counts; the forget list broadcasts, each table is "
    "scanned once, nothing shuffles",
    tags=("llm", "governance"),
)
def q76_forget_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.chunking import (
        chunk_documents,
    )

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    chunks = chunk_documents(docs, "doc_id", "text", 64, 8).select("doc_id")
    forget = docs.filter(F.col("doc_id") % 13 == 0).select("doc_id")

    def purge(df: DataFrame, key: str, name: str) -> DataFrame:
        before = df.agg(F.count(F.lit(1)).alias("n_before"))
        after = df.join(
            F.broadcast(forget),
            df[key] == forget["doc_id"],
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n_after"))
        return (
            before.crossJoin(after)
            .select(
                F.lit(name).alias("table_name"),
                F.col("n_before").cast("bigint"),
                F.col("n_after").cast("bigint"),
            )
        )

    return (
        purge(docs.select("doc_id"), "doc_id", "documents")
        .unionByName(purge(chunks, "doc_id", "chunks"))
        .unionByName(
            purge(emb.select("vec_id"), "vec_id", "embeddings")
        )
    )


# ------------------------------------------- two-stage quantized ANN ---


@register(
    "q77_knn_quantized",
    oracle="""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings),
z AS (
  SELECT vec_id, v,
         CASE WHEN mx = 0
              THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v,
                     x -> CAST(floor(x * 127 / mx + 0.5) AS BIGINT)) END AS q,
         CASE WHEN mx = 0 THEN 0.0 ELSE mx / 127 END AS s
  FROM base),
qs AS (SELECT vec_id AS query_id, v AS qv, q AS qq, s AS qsc
       FROM z WHERE vec_id < 10),
cs AS (SELECT vec_id AS neighbor_id, v AS cv, q AS cq, s AS csc FROM z),
coarse AS (
  SELECT query_id, neighbor_id, qv, cv,
         CAST(list_sum(list_transform(list_zip(qq, cq),
                                      p -> p[1] * p[2])) AS DOUBLE)
           * qsc * csc AS approx
  FROM qs JOIN cs ON query_id <> neighbor_id),
cand AS (
  SELECT query_id, neighbor_id, qv, cv FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx DESC, neighbor_id ASC)
                AS crnk
    FROM coarse) WHERE crnk <= 20)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT query_id, neighbor_id,
         list_cosine_similarity(qv, cv) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY list_cosine_similarity(qv, cv) DESC,
                                     neighbor_id ASC) AS rnk
  FROM cand) WHERE rnk <= 5
""",
    doc="two-stage quantized retrieval: int8 integer dot products (exact "
    "bigint arithmetic, 1/4 the scan bytes) pick 20 coarse candidates "
    "per query, exact float cosine rescores only those — the "
    "memory-bandwidth shape of production vector search",
    tags=("llm", "similarity", "scale"),
)
def q77_knn_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        knn_quantized,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return knn_quantized(emb, queries, k=5, coarse_k=20)


# ------------------------------------------------------- batch MERGE ---


@register(
    "q81_merge_upsert",
    oracle="""
WITH target AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars FROM documents),
updates AS (
  SELECT doc_id, lang, CAST(n_chars + 1000 AS BIGINT) AS n_chars,
         FALSE AS is_delete
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id, lang, CAST(n_chars AS BIGINT), TRUE
  FROM documents WHERE doc_id % 4 = 1
  UNION ALL
  SELECT doc_id + 100000, lang, CAST(n_chars AS BIGINT), FALSE
  FROM documents WHERE doc_id % 10 = 0)
SELECT COALESCE(u.doc_id, t.doc_id) AS doc_id,
       CASE WHEN u.doc_id IS NOT NULL THEN u.lang ELSE t.lang END AS lang,
       CASE WHEN u.doc_id IS NOT NULL THEN u.n_chars
            ELSE t.n_chars END AS n_chars
FROM target t FULL OUTER JOIN updates u ON t.doc_id = u.doc_id
WHERE NOT COALESCE(u.is_delete, FALSE)
""",
    doc="batch MERGE onto a snapshot: updates overwrite matched keys, "
    "inserts add new keys, delete flags drop keys, untouched target "
    "rows survive — one full-outer equi-join on the uniform key, the "
    "write surface the reference's append-only bulk writer lacks",
    tags=("llm", "versioning"),
)
def q81_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.versioning import (
        merge_upsert,
    )

    docs = table(spark, sf_dir, "documents")
    target = docs.select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    updates = (
        docs.filter(F.col("doc_id") % 4 == 0)
        .select(
            "doc_id",
            "lang",
            (F.col("n_chars") + 1000).cast("bigint").alias("n_chars"),
            F.lit(False).alias("is_delete"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 1).select(
                "doc_id",
                "lang",
                F.col("n_chars").cast("bigint").alias("n_chars"),
                F.lit(True).alias("is_delete"),
            )
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 10 == 0).select(
                (F.col("doc_id") + 100000).alias("doc_id"),
                "lang",
                F.col("n_chars").cast("bigint").alias("n_chars"),
                F.lit(False).alias("is_delete"),
            )
        )
    )
    return merge_upsert(target, updates, "doc_id", delete_col="is_delete")


# ------------------------------------- end-to-end training pipeline ---


@register(
    "q85_training_pipeline_e2e",
    oracle="""
WITH kept AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
      len(string_split(text, ' ')) AS n_tokens,
      CAST(len(list_filter(string_split(text, ' '),
               t -> list_contains(['the','and','of','to','a'], t))) AS DOUBLE)
        / len(string_split(text, ' ')) AS stop_ratio,
      (CAST(length(text) AS DOUBLE)
        - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
        / length(text) AS punct_ratio
    FROM documents)
  WHERE NOT (n_tokens < 15) AND NOT (punct_ratio > 0.2)
    AND NOT (stop_ratio = 0)),
deduped AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1),
train AS (
  SELECT doc_id, text FROM deduped
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
             AS BIGINT) % 10000 < 9000),
w AS (SELECT doc_id, string_split(text, ' ') AS w FROM train),
off AS (
  SELECT doc_id, w, CAST(t.o AS BIGINT) AS start
  FROM w, UNNEST(range(1, greatest(len(w) - 8, 1) + 1, 56)) AS t(o))
SELECT doc_id, (start - 1) // 56 AS chunk_index,
       md5(array_to_string(w[start : start + 63], ' ')) AS chunk_hash,
       CAST(len(w[start : start + 63]) AS BIGINT) AS n_chunk_tokens
FROM off
""",
    doc="the end-to-end training-data pipeline as ONE composed lineage: "
    "quality gate (C4/Gopher rules) → exact dedup (min-id per md5) → "
    "90% train hash-split → 64/8 token chunking, emitting chunk hashes "
    "— each stage is the already-verified operator, composed; Catalyst "
    "fuses the gate+split projections into the scan side of the single "
    "dedup shuffle",
    tags=("llm", "pipeline"),
)
def q85_training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.chunking import (
        chunk_documents,
    )
    from cassandra_analytics_example_spark.operators.dedup import exact_dedup
    from cassandra_analytics_example_spark.operators.sampling import hash_split
    from cassandra_analytics_example_spark.operators.text import (
        quality_features,
    )

    docs = table(spark, sf_dir, "documents")
    feats = quality_features(docs, "text")
    kept = (
        docs.join(
            feats.select("doc_id", "n_tokens", "stop_ratio", "punct_ratio"),
            "doc_id",
        )
        .filter(
            ~(F.col("n_tokens") < 15)
            & ~(F.col("punct_ratio") > 0.2)
            & ~(F.col("stop_ratio") == 0)
        )
        .select("doc_id", "text")
    )
    deduped = exact_dedup(kept, "doc_id", "text").select("doc_id", "text")
    train = (
        hash_split(deduped, "doc_id")
        .filter(F.col("split") == "train")
        .select("doc_id", "text")
    )
    chunks = chunk_documents(train, "doc_id", "text", 64, 8)
    return chunks.select(
        "doc_id",
        "chunk_index",
        F.md5("chunk_text").alias("chunk_hash"),
        "n_chunk_tokens",
    )


# ------------------------------------------------- edit-distance near-dup ---


@register(
    "q87_edit_distance_neardup",
    oracle="""
WITH d AS (
  SELECT doc_id, lang,
         substring(text, 1, 32) AS p32,
         substring(text, 1, 4)  AS blk
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS lang,
       levenshtein(a.p32, b.p32) AS lev
FROM d a JOIN d b
  ON a.lang = b.lang AND a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.p32, b.p32) <= 8
""",
    doc="edit-distance near-dup (typo-grade mutations token-set methods "
    "miss): (lang, 4-char prefix) equi-join blocking, threshold "
    "levenshtein <= 8 over 32-char prefixes — exact integer distances, "
    "Spark's 3-arg levenshtein early-exits above the bound "
    "(operators/dedup.py:edit_distance_neardup)",
    tags=("llm", "dedup"),
)
def q87_edit_distance_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import (
        edit_distance_neardup,
    )

    docs = table(spark, sf_dir, "documents")
    return edit_distance_neardup(
        docs.select("doc_id", "lang", "text"),
        "doc_id",
        "text",
        block_cols=["lang"],
        prefix_len=32,
        block_prefix=4,
        max_dist=8,
    )


# --------------------------------------------------- vocabulary coverage ---


@register(
    "q89_vocab_coverage",
    oracle="""
WITH counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term ASC) AS rnk
  FROM counts
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts)
SELECT CASE WHEN rnk <= 100 THEN 'top_100'
            WHEN rnk <= 1000 THEN 'top_101_1000'
            ELSE 'rest' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_terms,
       CAST(sum(cnt) AS BIGINT) AS sum_freq,
       CAST(sum(cnt) AS DOUBLE) / CAST(max(total) AS DOUBLE) AS coverage
FROM ranked, tot
GROUP BY 1
""",
    doc="tokenizer-vocabulary sizing: global term ranks (cnt desc, term "
    "asc total order), coverage of top-100 / top-1000 / rest as single "
    "divisions of exact integer sums — the rank window orders a "
    "VOCABULARY-sized layer, never the corpus "
    "(operators/text.py:vocab_coverage)",
    tags=("llm", "text"),
)
def q89_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import vocab_coverage

    docs = table(spark, sf_dir, "documents")
    return vocab_coverage(docs, "text")


# ------------------------------------------------------------------ BM25 ---

_BM25_TERMS = ("spark", "query", "window", "hash", "merge")


@register(
    "q95_bm25_retrieval",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf_all AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf_all GROUP BY 1),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_tokens
  FROM dl
),
tf_q AS (
  SELECT * FROM tf_all
  WHERE term IN ('spark', 'query', 'window', 'hash', 'merge')
),
dfreq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf_q GROUP BY 1
)
SELECT t.doc_id,
       CAST(sum(CAST(floor(
         ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
            / (CAST(df AS DOUBLE) + 0.5) + 1.0)
         * (CAST(tf AS DOUBLE) * 2.2)
         / (CAST(tf AS DOUBLE)
            + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                     / (CAST(total_tokens AS DOUBLE)
                        / CAST(n_docs AS DOUBLE))))
         * 10000) AS BIGINT)) AS BIGINT) AS score_q,
       CAST(count(*) AS BIGINT) AS n_hit_terms
FROM tf_q t JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
GROUP BY t.doc_id
""",
    doc="BM25 sparse retrieval (k1=1.2, b=0.75) against a fixed 5-term "
    "query: per-(doc,term) contributions quantized to integer 1e-4 nats "
    "before the per-doc sum (q67 discipline, order-independent and "
    "engine-exact) — df/score table broadcast, corpus shuffles once on "
    "doc id (operators/text.py:bm25_scores)",
    tags=("llm", "text", "retrieval"),
)
def q95_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import bm25_scores

    docs = table(spark, sf_dir, "documents")
    return bm25_scores(docs, "doc_id", "text", list(_BM25_TERMS))


# ------------------------------------------------------ ANN recall audit ---


@register(
    "q96_ann_recall_audit",
    oracle="""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                       c.vec_id ASC) AS rnk
    FROM v q JOIN v c ON q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
  ) WHERE rnk <= 5
),
b AS (
  SELECT vec_id, v,
         (CASE WHEN v[1] >= 0 THEN 1 ELSE 0 END)
       + (CASE WHEN v[2] >= 0 THEN 2 ELSE 0 END)
       + (CASE WHEN v[3] >= 0 THEN 4 ELSE 0 END)
       + (CASE WHEN v[4] >= 0 THEN 8 ELSE 0 END) AS bucket
  FROM v
),
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                       c.vec_id ASC) AS rnk
    FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
  ) WHERE rnk <= 5
),
probes AS (
  SELECT vec_id, v, unnest([bucket,
                            xor(bucket, 1), xor(bucket, 2),
                            xor(bucket, 4), xor(bucket, 8)]) AS bucket
  FROM b WHERE vec_id < 10
),
mp AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                       c.vec_id ASC) AS rnk
    FROM probes q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  ) WHERE rnk <= 5
),
cents AS (
  SELECT vec_id AS cent_id, v AS centv FROM v WHERE vec_id < 8
),
cells AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT x.vec_id, x.v, c.cent_id,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY list_cosine_similarity(x.v, c.centv) DESC,
                                       c.cent_id ASC) AS rn
    FROM v x, cents c) WHERE rn = 1
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                       c.vec_id ASC) AS rnk
    FROM cells q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id
    WHERE q.vec_id < 10
  ) WHERE rnk <= 5
),
qs AS (SELECT DISTINCT query_id FROM bf),
methods AS (
  SELECT 'lsh' AS method, * FROM lsh
  UNION ALL SELECT 'multiprobe', * FROM mp
  UNION ALL SELECT 'ivf', * FROM ivf
),
h AS (
  SELECT m.method, bf.query_id, CAST(count(*) AS BIGINT) AS n
  FROM bf JOIN methods m USING (query_id, neighbor_id)
  GROUP BY m.method, bf.query_id
)
SELECT qs.query_id, mm.method,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
       CAST(5 AS BIGINT) AS k,
       CAST(coalesce(h.n, 0) AS DOUBLE) / 5.0 AS recall
FROM qs CROSS JOIN (SELECT 'lsh' AS method UNION ALL SELECT 'multiprobe'
                    UNION ALL SELECT 'ivf') mm
LEFT JOIN h ON h.query_id = qs.query_id AND h.method = mm.method
""",
    doc="recall@5 audit of ALL THREE approximate ANN paths (single-probe "
    "sign-LSH, hamming-1 multi-probe, IVF 1-probe) against the exact "
    "brute-force baseline — the measured quality gate for the "
    "approximate family; multi-probe recall strictly dominates "
    "single-probe at (n_bits+1)x scoring cost "
    "(operators/similarity.py:ann_recall)",
    tags=("llm", "similarity", "quality"),
)
def q96_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        ivf_topk,
        lsh_topk,
        multiprobe_lsh_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    lsh = lsh_topk(emb, queries, k=5, n_bits=4).select(
        "query_id", "neighbor_id"
    )
    mp = multiprobe_lsh_topk(emb, queries, k=5, n_bits=4).select(
        "query_id", "neighbor_id"
    )
    ivf = ivf_topk(emb, queries, k=5, n_cells=8).select(
        "query_id", "neighbor_id"
    )
    return (
        ann_recall(exact, lsh, k=5, method="lsh")
        .unionByName(ann_recall(exact, mp, k=5, method="multiprobe"))
        .unionByName(ann_recall(exact, ivf, k=5, method="ivf"))
    )


# ------------------------------------------------------ audio multimodal ---


@register(
    "q97_audio_frame_energy",
    oracle="""
WITH ascii_docs AS (
  SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS t
  FROM documents
),
chars AS (
  SELECT doc_id, unnest(range(1, length(t)+1)) AS i, t
  FROM ascii_docs
)
SELECT doc_id,
       CAST((i-1) // 64 AS INT) AS frame_no,
       CAST(count(*) AS INT) AS n_samples,
       CAST(sum((ord(substr(t, i, 1)) - 96)
                * (ord(substr(t, i, 1)) - 96)) AS BIGINT) AS energy,
       CAST(max(abs(ord(substr(t, i, 1)) - 96)) AS INT) AS peak
FROM chars
GROUP BY 1, 2
""",
    doc="audio-shaped multimodal plumbing: deterministic 8-bit-PCM "
    "interpretation of the payload bytes, framed into 64-sample windows "
    "inside Arrow-batched mapInPandas (numpy per batch, never per-row "
    "UDF) — integer energy/peak features, engine-exact; the REAL "
    "RIFF/WAVE container path is frame_energies_wav via decode_audio "
    "(operators/multimodal.py), twinned in test_multimodal_decode",
    tags=("llm", "multimodal"),
)
def q97_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.multimodal import (
        attach_audio_payload,
        frame_energies,
    )

    docs = table(spark, sf_dir, "documents")
    return frame_energies(attach_audio_payload(docs), frame_size=64)


# --------------------------------------------------- curriculum binning ---


@register(
    "q98_curriculum_binning",
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         ntile(4) OVER (PARTITION BY lang
                        ORDER BY n_chars DESC, doc_id ASC) AS shard
  FROM documents
)
SELECT lang, CAST(shard AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM scored
GROUP BY 1, 2
""",
    doc="curriculum binning: per-language quartile shards over a quality "
    "proxy (n_chars desc, doc_id tiebreak = total order) via ntile — "
    "training-order construction as one keyed window + aggregate; the "
    "window sorts per language partition, never globally",
    tags=("llm", "sampling"),
)
def q98_curriculum_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("shard", F.ntile(4).over(w).cast("int"))
        .groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


# ------------------------------------------- prefix-filter overlap join ---


@register(
    "q104_overlap_prefix_join",
    oracle="""
WITH arr AS (
  SELECT doc_id, list_distinct(string_split(text, ' ')) AS ts
  FROM documents
),
tok AS (SELECT doc_id, unnest(ts) AS t FROM arr),
freq AS (SELECT t, count(*) AS df FROM tok GROUP BY t),
ranked AS (
  SELECT doc_id, t,
         row_number() OVER (PARTITION BY doc_id ORDER BY df ASC, t ASC)
           AS rn,
         count(*) OVER (PARTITION BY doc_id) AS sz
  FROM tok JOIN freq USING (t)
),
pref AS (SELECT doc_id, t FROM ranked WHERE rn <= sz - 30 + 1),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM pref a JOIN pref b ON a.t = b.t AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(x.ts, y.ts)) AS BIGINT) AS overlap
FROM cand c
JOIN arr x ON x.doc_id = c.id_a
JOIN arr y ON y.doc_id = c.id_b
WHERE len(list_intersect(x.ts, y.ts)) >= 30
""",
    doc="set-overlap join with PPJoin-style prefix filtering: pairs "
    "sharing >= 30 distinct tokens, candidates restricted to documents "
    "agreeing on a RAREST-(sz-T+1)-prefix token (pigeonhole-complete, "
    "shortest postings) — the absolute-overlap complement of the "
    "Jaccard family (operators/dedup.py:overlap_join)",
    tags=("llm", "dedup"),
)
def q104_overlap_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import overlap_join

    docs = table(spark, sf_dir, "documents")
    return overlap_join(docs, "doc_id", "text", min_overlap=30)


# ------------------------------------------------- weighted sampling ---


@register(
    "q105_weighted_sample",
    oracle="""
WITH tot AS (
  SELECT CAST(sum(CAST(n_chars AS BIGINT)) AS DECIMAL(38,0)) AS tw
  FROM documents
)
SELECT doc_id, lang, n_chars
FROM documents, tot
WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 1073741824 AS DECIMAL(38,0)) * tw
    < CAST(n_chars AS DECIMAL(38,0)) * CAST(100 AS DECIMAL(38,0))
      * CAST(1073741824 AS DECIMAL(38,0))
""",
    doc="deterministic weighted sampling (expected 100 docs, probability "
    "proportional to n_chars): integer cross-multiplied keep-decision in "
    "DECIMAL(38,0) — no division, no floats, bit-identical across "
    "engines, zero corpus shuffle "
    "(operators/sampling.py:weighted_sample)",
    tags=("llm", "sampling"),
)
def q105_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import (
        weighted_sample,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    return weighted_sample(docs, "doc_id", "n_chars", target=100)


# ------------------------------------------------ dedup drop accounting ---


@register(
    "q108_dedup_drop_audit",
    oracle="""
SELECT 'lsh_reps_audited' AS check_name, true AS ok,
       CAST(count(DISTINCT text) AS BIGINT) AS n FROM documents
UNION ALL SELECT 'embedding_vectors_audited', true,
       CAST(count(*) AS BIGINT) FROM embeddings
UNION ALL SELECT 'caps_respected', true, 0
UNION ALL SELECT 'candidates_bounded_by_kept_pairs', true, 0
""",
    doc="capped candidate-generation accounting made driver-visible: the "
    "lsh_bucket_stats / embedding_bucket_stats twins reduced to "
    "conservation invariants (bucket membership bounds, dropped-flag "
    "consistency, emitted-pairs <= kept-pair budget) the oracle asserts "
    "uniformly true — dropped recall stays auditable, never silent "
    "(operators/dedup.py:dedup_drop_audit)",
    tags=("llm", "dedup", "quality"),
)
def q108_dedup_drop_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import (
        dedup_drop_audit,
    )

    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    return dedup_drop_audit(docs, emb, max_bucket_size=50)


# ------------------------------------------------- count-min sketch -------


@register(
    "q109_countmin_heavy_hitters",
    oracle="""
WITH t AS (
  SELECT tok FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
),
true_counts AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_n FROM t GROUP BY tok),
top AS (SELECT tok, true_n FROM true_counts ORDER BY true_n DESC, tok ASC LIMIT 20),
ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
cells AS (
  SELECT d,
         CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || tok), 1, 15)) AS BIGINT)
           % 256 AS cell,
         count(*) AS c
  FROM t CROSS JOIN ds
  GROUP BY 1, 2
),
est AS (
  SELECT top.tok, top.true_n, CAST(min(cells.c) AS BIGINT) AS est_n
  FROM top CROSS JOIN ds
  JOIN cells ON cells.d = ds.d
   AND cells.cell =
       CAST(('0x' || substr(md5(CAST(ds.d AS VARCHAR) || top.tok), 1, 15))
            AS BIGINT) % 256
  GROUP BY 1, 2
)
SELECT tok, true_n, est_n, est_n >= true_n AS no_underestimate FROM est
""",
    doc="count-min sketch heavy hitters: a DETERMINISTIC mergeable "
    "frequency sketch (md5-derived hash rows, 4x256 cells — the "
    "complement of q37's approximate HLL) built in one partial-aggregated "
    "shuffle; top-20 true-frequency tokens point-estimated from the cell "
    "table, never underestimated by construction. Cell table is "
    "depth*width rows whatever the corpus size; shards merge by cell "
    "addition (operators/sketches.py)",
    tags=("llm", "text", "sketch"),
)
def q109_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sketches import (
        countmin_cells,
        countmin_estimate,
    )

    docs = table(spark, sf_dir, "documents")
    # two scans of the token stream (true counts + sketch cells) — at scale
    # the sketch pass is the cheap one (depth*width partials); caching the
    # exploded occurrence stream would cost more than the rescan.
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    true_counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_n")
    )
    top = true_counts.orderBy(F.desc("true_n"), F.asc("tok")).limit(20)
    cells = countmin_cells(toks, "tok", depth=4, width=256)
    est = countmin_estimate(cells, top.select("tok"), "tok", depth=4, width=256)
    return top.join(est, "tok").select(
        "tok",
        "true_n",
        "est_n",
        (F.col("est_n") >= F.col("true_n")).alias("no_underestimate"),
    )


# --------------------------------------------------- mixture planning -----


@register(
    "q110_mixture_plan",
    oracle="""
WITH avail AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS available
  FROM documents GROUP BY lang
),
w AS (
  SELECT lang, available,
         CAST(floor(sqrt(available)) AS BIGINT) AS weight
  FROM avail
),
tot AS (
  SELECT CAST(sum(available) AS HUGEINT) AS ta,
         CAST(sum(weight) AS HUGEINT) AS tw
  FROM w
),
planned AS (
  SELECT w.lang, w.available, w.weight,
         CASE WHEN tw = 0 THEN CAST(0 AS HUGEINT)
              ELSE least(CAST(w.available AS HUGEINT),
                         CAST(w.weight AS HUGEINT) * ((ta * 1) // 2) // tw)
         END AS q
  FROM w, tot
)
SELECT lang, available, weight,
       CAST(q AS BIGINT) AS quota,
       CASE WHEN available = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(q * 1000000 // available AS BIGINT) END AS rate_ppm
FROM planned
""",
    doc="temperature-style data-mixture planning (T=2: budget shares "
    "proportional to sqrt of per-language volume, upweighting low-resource "
    "languages) with an all-integer quota/rate pipeline — integral DIV on "
    "DECIMAL cross-products, no fractional division, bit-identical across "
    "engines; the plan is a broadcast-sized table the sampling pass "
    "consumes (operators/sampling.py:mixture_plan)",
    tags=("llm", "sampling"),
)
def q110_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import (
        mixture_plan,
    )

    docs = table(spark, sf_dir, "documents")
    return mixture_plan(docs, "lang", "n_chars", budget_num=1, budget_den=2)


# ----------------------------------------------------- shard packing ------


@register(
    "q111_shard_packing",
    oracle="""
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST((row_number() OVER (
               ORDER BY n_chars DESC,
                        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                             1, 15)) AS BIGINT) % 16 ASC,
                        doc_id ASC) - 1) % 8
            AS INT) AS shard
FROM documents
""",
    doc="size-balanced export sharding: round-robin over the size-"
    "descending rank (deterministic first-fit-decreasing variant) so "
    "training-shard totals differ by at most one doc per round — the "
    "layout step before writing epoch shards; rank computed WITHOUT a "
    "single-partition window (value-banded local ranks + broadcast "
    "cumulative offsets), assignment oracle-checked per document "
    "(operators/chunking.py:shard_packing)",
    tags=("llm", "layout"),
)
def q111_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.chunking import (
        shard_packing,
    )

    docs = table(spark, sf_dir, "documents")
    return shard_packing(docs, "doc_id", "n_chars", n_shards=8)


# ----------------------------------------------- tokenizer / contrastive ---


@register(
    "q115_bpe_pair_merges",
    oracle="""
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]'))
           AS word
  FROM documents
),
vocab AS (
  SELECT word, count(*) AS wfreq FROM words
  WHERE length(word) >= 2 GROUP BY word
),
pairs AS (
  SELECT substr(word, i, 1) AS left_sym, substr(word, i + 1, 1) AS right_sym,
         wfreq
  FROM vocab, UNNEST(range(1, length(word))) AS t(i)
),
agg AS (
  SELECT left_sym, right_sym, CAST(sum(wfreq) AS BIGINT) AS pair_count
  FROM pairs GROUP BY 1, 2
)
SELECT left_sym, right_sym, pair_count,
       CAST(row_number() OVER (ORDER BY pair_count DESC, left_sym, right_sym)
            AS INT) AS rnk
FROM agg
ORDER BY pair_count DESC, left_sym, right_sym
LIMIT 20
""",
    doc="BPE merge-candidate statistics (first merge iteration): adjacent "
    "character-pair counts over the distinct word vocabulary weighted by "
    "word frequency — pair counting shuffles |vocab| rows, not corpus "
    "tokens (operators/text.py:bpe_pair_counts)",
    tags=("llm", "text", "tokenizer"),
)
def q115_bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import (
        bpe_pair_counts,
    )

    docs = table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, "text", top_n=20)


@register(
    "q116_semdedup",
    oracle="""
WITH nk AS (
  SELECT greatest(8, (count(*) + 63) // 64) AS k FROM embeddings
),
mm AS (
  SELECT k, greatest(0, CAST(floor(log2(k)) AS BIGINT) - 3) AS m FROM nk
),
cents AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS centv,
         coalesce(list_sum(list_transform(range(1, m + 1),
                    i -> CASE WHEN embedding[CAST(i AS INT)] >= 0
                              THEN (1 << (i - 1)) ELSE 0 END)), 0) AS cbucket
  FROM embeddings, mm WHERE vec_id < k
),
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         coalesce(list_sum(list_transform(range(1, m + 1),
                    i -> CASE WHEN embedding[CAST(i AS INT)] >= 0
                              THEN (1 << (i - 1)) ELSE 0 END)), 0) AS bucket
  FROM embeddings, mm
),
cand AS (
  SELECT v.vec_id, v.v, c.cent_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY list_cosine_similarity(v.v, c.centv) DESC,
                                     c.cent_id ASC) AS rn
  FROM v JOIN cents c ON v.bucket = c.cbucket
),
fb AS (
  SELECT v.vec_id, v.v, c.cent_id,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY list_cosine_similarity(v.v, c.centv) DESC,
                                     c.cent_id ASC) AS rn
  FROM v, cents c
  WHERE v.vec_id NOT IN (SELECT vec_id FROM cand)
),
cells AS (
  SELECT vec_id, v, cent_id AS cell FROM cand WHERE rn = 1
  UNION ALL
  SELECT vec_id, v, cent_id FROM fb WHERE rn = 1
),
drops AS (
  SELECT DISTINCT a.vec_id
  FROM cells a JOIN cells b ON a.cell = b.cell AND b.vec_id < a.vec_id
  WHERE list_cosine_similarity(a.v, b.v) >= 0.35
)
SELECT c.vec_id, c.cell, (d.vec_id IS NULL) AS kept
FROM cells c LEFT JOIN drops d ON c.vec_id = d.vec_id
""",
    doc="semantic dedup (SemDeDup): corpus-sized cell count "
    "(k = ceil(N/64)) with sign-bucket-filtered centroid assignment "
    "(constant per-row cost, empty-bucket fallback), then within-cell "
    "cosine prune as an equi-self-join on the cell id — both halves "
    "linear in N (operators/similarity.py:semdedup_prune)",
    tags=("llm", "dedup", "similarity"),
)
def q116_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        semdedup_prune,
    )

    emb = table(spark, sf_dir, "embeddings")
    return semdedup_prune(emb, target_cell_size=64, min_cells=8,
                          threshold=0.35)


@register(
    "q117_ring_negatives",
    oracle="""
WITH ring AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('neg:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
),
b AS (SELECT doc_id, h, h % 16 AS bucket FROM ring),
ranked AS (
  SELECT doc_id, bucket,
         row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS r
  FROM b
),
counts AS (SELECT bucket, count(*) AS n FROM ranked GROUP BY bucket),
cand AS (
  SELECT a.doc_id AS anchor_id, a.bucket, t.i AS neg_rank,
         ((a.r - 1 + t.i) % c.n) + 1 AS tr
  FROM ranked a JOIN counts c USING (bucket), UNNEST(range(1, 4)) AS t(i)
)
SELECT cand.anchor_id, CAST(cand.neg_rank AS INT) AS neg_rank,
       r2.doc_id AS neg_id
FROM cand JOIN ranked r2 ON cand.bucket = r2.bucket AND cand.tr = r2.r
WHERE r2.doc_id <> cand.anchor_id
""",
    doc="deterministic contrastive negative sampling: md5 hash ring split "
    "into 16 arcs, each anchor takes its 3 arc-local ring successors "
    "(wrapping) as negatives — reproducible across runs/engines, "
    "bucket-local windows only (operators/sampling.py:hash_ring_negatives)",
    tags=("llm", "sampling"),
)
def q117_ring_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import (
        hash_ring_negatives,
    )

    docs = table(spark, sf_dir, "documents")
    return hash_ring_negatives(docs, "doc_id", k=3, n_buckets=16)


@register(
    "q118_containment_neardup",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
toks AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> array_to_string(w[i:i+2], ' '))) AS toks
  FROM w
),
tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM toks
),
dfreq AS (
  SELECT tok, count(*) AS dfreq FROM tok GROUP BY tok
),
blocked AS (
  SELECT doc_id, tok AS block_tok FROM (
    SELECT t.doc_id, t.tok,
           row_number() OVER (PARTITION BY t.doc_id ORDER BY d.dfreq, t.tok) AS rn
    FROM tok t JOIN dfreq d USING (tok)) WHERE rn <= 3
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blocked a JOIN blocked b
    ON a.block_tok = b.block_tok AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         / least(len(a.toks), len(b.toks)) AS containment
FROM cands c JOIN toks a ON c.id_a = a.doc_id JOIN toks b ON c.id_b = b.doc_id
WHERE least(len(a.toks), len(b.toks)) > 0
  AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
         / least(len(a.toks), len(b.toks)) >= 0.6
""",
    doc="asymmetric containment near-dup (overlap coefficient >= 0.6 over "
    "word 3-grams): catches short-doc-inside-long-doc duplication that "
    "Jaccard misses; same rarest-gram blocking as q22 "
    "(operators/dedup.py:token_containment_pairs)",
    tags=("llm", "dedup"),
)
def q118_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import (
        token_containment_pairs,
    )

    docs = table(spark, sf_dir, "documents")
    return token_containment_pairs(docs, "doc_id", "text", threshold=0.6,
                                   n_blocks=3)


# --------------------------------------------------- governance / gating ---


@register(
    "q119_source_leakage_matrix",
    oracle=f"""
WITH pairs AS (
{_Q21_ORACLE}
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs p
JOIN documents da ON p.id_a = da.doc_id
JOIN documents db ON p.id_b = db.doc_id
GROUP BY 1, 2
""",
    doc="cross-source near-dup leakage matrix: q21's MinHash-LSH pairs "
    "rolled up by unordered source pair — the train/eval leakage "
    "governance view (a nonzero off-diagonal cell means content crosses "
    "source boundaries); pair generation reuses the bucketed LSH "
    "discipline, the source lookup is two equi-joins on doc_id",
    tags=("llm", "dedup", "governance"),
)
def q119_source_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(
        docs,
        "doc_id",
        "text",
        num_hashes=_MINHASH_SEEDS,
        shingle_k=_SHINGLE_K,
        num_bands=_MINHASH_BANDS,
        jaccard_threshold=0.5,
    )
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("src_a"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("src_b"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


@register(
    "q120_boilerplate_coverage",
    oracle="""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
toks AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> array_to_string(w[i:i+2], ' '))) AS toks
  FROM w
),
tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM toks
),
dfreq AS (
  SELECT tok, count(*) AS dfc FROM tok GROUP BY tok
),
nd AS (SELECT count(*) AS n_docs FROM documents),
boiler AS (
  SELECT tok FROM dfreq, nd
  WHERE dfc >= greatest(2, (n_docs * 1 + 99) // 100)
),
counts AS (
  SELECT t.doc_id, count(*) AS n_boiler
  FROM tok t JOIN boiler USING (tok) GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_grams,
       CAST(coalesce(c.n_boiler, 0) AS BIGINT) AS n_boiler,
       CASE WHEN len(t.toks) > 0
            THEN CAST(coalesce(c.n_boiler, 0) AS DOUBLE) / len(t.toks)
            ELSE 0.0 END AS boiler_frac
FROM toks t LEFT JOIN counts c USING (doc_id)
""",
    doc="boilerplate gram coverage: word 3-grams hitting >= 1%-of-corpus "
    "document frequency are template chrome; per-doc fraction of grams "
    "that are boilerplate — the qualifying set is bounded by "
    "grams-per-doc / df-fraction regardless of corpus size, so the "
    "membership probe broadcasts (operators/text.py:"
    "boilerplate_gram_coverage)",
    tags=("llm", "text", "governance"),
)
def q120_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import (
        boilerplate_gram_coverage,
    )

    docs = table(spark, sf_dir, "documents")
    return boilerplate_gram_coverage(docs, "doc_id", "text", ngram_n=3)


@register(
    "q121_token_budget_selection",
    oracle="""
WITH q AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         least(len(string_split(text, ' ')) / 100.0, 1.0) * 0.4
           + (1.0 - (CAST(length(text) AS DOUBLE)
                - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                / length(text)) * 0.3
           + CAST(len(list_filter(string_split(text, ' '),
                    t -> list_contains(['the','and','of','to','a'], t))) AS DOUBLE)
                / len(string_split(text, ' ')) * 0.3 AS quality_score
  FROM documents
),
b AS (
  SELECT *,
         CAST(floor(quality_score * 64) AS BIGINT) AS band,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 4 AS sub
  FROM q
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens,
       (sum(n_tokens) OVER w) <= 2000 AS selected
FROM b
WINDOW w AS (PARTITION BY lang
             ORDER BY band DESC, sub ASC, quality_score DESC, doc_id ASC
             ROWS UNBOUNDED PRECEDING)
""",
    doc="quality-greedy selection under a 2000-token-per-language budget: "
    "banded scale-safe rank (quality band desc, md5 subkey, quality desc, "
    "id) — windows partition by (lang, band, subkey), never by the "
    "low-cardinality lang alone; cumulative tokens globalized via a "
    "broadcast offset layer (operators/sampling.py:token_budget_selection)",
    tags=("llm", "sampling", "governance"),
)
def q121_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import (
        token_budget_selection,
    )

    docs = table(spark, sf_dir, "documents")
    return token_budget_selection(docs, "doc_id", "lang", "text",
                                  budget_tokens=2000)


@register(
    "q122_cluster_weights",
    oracle=f"""
WITH RECURSIVE pairs AS (
{_Q21_ORACLE}
),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
),
cc AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
mapping AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(text)) AS rep_id
  FROM documents
),
dc AS (
  SELECT m.doc_id, coalesce(c.cluster_id, m.rep_id) AS cluster_id
  FROM mapping m LEFT JOIN cc c ON m.rep_id = c.id
),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM dc GROUP BY 1)
SELECT dc.doc_id, dc.cluster_id,
       CAST(s.cluster_size AS BIGINT) AS cluster_size,
       CAST(1.0 AS DOUBLE) / s.cluster_size AS weight
FROM dc JOIN sizes s USING (cluster_id)
""",
    doc="soft dedup: inverse-duplicate-cluster-size sampling weights for "
    "EVERY document — exact copies map to their content-hash rep, reps "
    "cluster via MinHash-LSH + connected components, singletons weigh "
    "1.0; the downweight-instead-of-drop form of deduplication "
    "(operators/dedup.py:cluster_weights)",
    tags=("llm", "dedup", "sampling"),
)
def q122_cluster_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import (
        cluster_weights,
    )

    docs = table(spark, sf_dir, "documents")
    return cluster_weights(docs, "doc_id", "text")


@register(
    "q123_jsonl_ingest_digest",
    oracle="""
SELECT count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       count(DISTINCT md5(text)) AS n_distinct_text,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       count(DISTINCT lang) AS n_langs
FROM documents
""",
    doc="JSONL ingestion round trip: documents exported to JSON-lines and "
    "re-read through the explicit-schema PERMISSIVE reader (corrupt-record "
    "quarantine column), digest proving zero loss vs the parquet source "
    "(sources/files.py:read_jsonl/write_jsonl)",
    tags=("llm", "sources"),
)
def q123_jsonl_ingest_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cassandra_analytics_example_spark.sources.files import (
        read_jsonl,
        split_corrupt,
        write_jsonl,
    )

    docs = table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="jsonl_ingest_")
    write_jsonl(docs, out)
    back = read_jsonl(
        spark,
        out,
        "doc_id BIGINT, text STRING, lang STRING, source STRING, "
        "n_chars BIGINT",
    )
    clean, _quarantine = split_corrupt(back)
    return clean.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.countDistinct(F.md5("text")).alias("n_distinct_text"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "q124_inverted_index",
    oracle="""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY term
                               ORDER BY tf DESC, doc_id) AS rn
  FROM tf
),
stats AS (
  SELECT term, count(*) AS dfreq, CAST(sum(tf) AS BIGINT) AS cf
  FROM tf GROUP BY 1
),
post AS (
  SELECT term,
         array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY rn), ',')
           AS postings
  FROM ranked WHERE rn <= 16 GROUP BY 1
)
SELECT s.term, CAST(s.dfreq AS BIGINT) AS df, s.cf, p.postings,
       s.dfreq > 16 AS truncated
FROM stats s JOIN post p USING (term)
""",
    doc="capped inverted index: term -> df/cf + top-16 postings (tf desc, "
    "doc_id asc) with truncation accounting; the window-rank-then-filter "
    "runs BEFORE collect_list so a stopword's posting list never sits in "
    "one aggregation buffer (operators/indexing.py:inverted_index)",
    tags=("llm", "text", "retrieval"),
)
def q124_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.indexing import (
        inverted_index,
    )

    docs = table(spark, sf_dir, "documents")
    return inverted_index(docs, "doc_id", "text", max_postings=16)


@register(
    "q126_deterministic_shuffle",
    oracle="""
WITH keyed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS skey
  FROM documents
),
sharded AS (SELECT doc_id, skey, skey % 64 AS shard FROM keyed),
local AS (
  SELECT doc_id, shard,
         CAST(row_number() OVER (PARTITION BY shard
                                 ORDER BY skey, doc_id) - 1 AS BIGINT)
           AS pos_in_shard
  FROM sharded
),
sizes AS (SELECT shard, count(*) AS n FROM sharded GROUP BY 1),
offsets AS (
  SELECT shard,
         CAST(sum(n) OVER (ORDER BY shard
                           ROWS UNBOUNDED PRECEDING) - n AS BIGINT)
           AS off
  FROM sizes
)
SELECT l.doc_id, l.shard, l.pos_in_shard,
       o.off + l.pos_in_shard AS global_pos
FROM local l JOIN offsets o USING (shard)
""",
    doc="seeded reproducible global permutation for training order: "
    "(shard, pos, global_pos) as a pure function of (seed, id); per-shard "
    "local window + broadcast shard-offset layer, no single-partition "
    "global sort (operators/indexing.py:deterministic_shuffle)",
    tags=("llm", "layout", "sampling"),
)
def q126_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.indexing import (
        deterministic_shuffle,
    )

    docs = table(spark, sf_dir, "documents")
    return deterministic_shuffle(docs, "doc_id", n_shards=64, seed="epoch0")


@register(
    "q127_compression_quality",
    oracle="""
SELECT 'all_scored' AS check_name, true AS ok,
       CAST(count(*) AS BIGINT) AS n FROM documents
UNION ALL SELECT 'compressed_bounds', true, 0
UNION ALL SELECT 'median_ratio_sane', true, 0
UNION ALL SELECT 'partition_invariant', true, 0
""",
    doc="zlib compression-ratio quality signal (noise vs boilerplate "
    "filter) via Arrow-batched mapInPandas — no ANSI engine has zlib, so "
    "the gate is q52-style invariants: full coverage, compressed-size "
    "bounds, sane median, and partition-invariance (pure-function proof) "
    "(operators/compression.py:compression_scores)",
    tags=("llm", "text", "quality", "python"),
)
def q127_compression_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.compression import (
        compression_quality_checks,
    )

    docs = table(spark, sf_dir, "documents")
    return compression_quality_checks(docs, "doc_id", "text")


@register(
    "q128_orc_ingest_digest",
    oracle="""
SELECT count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       count(DISTINCT md5(text)) AS n_distinct_text,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       count(DISTINCT lang) AS n_langs
FROM documents
""",
    doc="ORC ingestion round trip: documents exported to ORC and re-read "
    "through the footer-described scan (pushdown/pruning parity with "
    "parquet), digest proving zero loss vs the parquet source "
    "(sources/files.py:read_orc/write_orc)",
    tags=("llm", "sources"),
)
def q128_orc_ingest_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cassandra_analytics_example_spark.sources.files import (
        read_orc,
        write_orc,
    )

    docs = table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="orc_ingest_")
    write_orc(docs, out)
    back = read_orc(spark, out)
    return back.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").cast("bigint").alias("id_sum"),
        F.countDistinct(F.md5("text")).alias("n_distinct_text"),
        F.sum("n_chars").cast("bigint").alias("chars_sum"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "q130_bigram_logprob",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> array_to_string(w[i:i+1], ' '))) AS bg
  FROM w WHERE len(w) >= 2
),
per_doc AS (SELECT doc_id, bg, count(*) AS bf FROM bg GROUP BY 1, 2),
train AS (SELECT * FROM per_doc WHERE doc_id % 2 = 0),
bgv AS (SELECT bg, CAST(sum(bf) AS BIGINT) AS cbg FROM train GROUP BY 1),
uni AS (
  SELECT string_split(bg, ' ')[1] AS w, CAST(sum(bf) AS BIGINT) AS cu
  FROM train GROUP BY 1
),
tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_total FROM uni),
scored AS (
  SELECT p.doc_id, p.bf,
         CAST(floor(CASE WHEN v.cbg IS NOT NULL
           THEN ln(CAST(v.cbg AS DOUBLE) / CAST(u1.cu AS DOUBLE))
           ELSE ln((2.0 * greatest(coalesce(u2.cu, 0), 1))
                   / (5.0 * CAST(t.n_total AS DOUBLE))) END
           * 10000) AS BIGINT) AS logp_q
  FROM per_doc p
  LEFT JOIN bgv v USING (bg)
  LEFT JOIN uni u1 ON u1.w = string_split(p.bg, ' ')[1]
  LEFT JOIN uni u2 ON u2.w = string_split(p.bg, ' ')[2]
  CROSS JOIN tot t
),
sums AS (
  SELECT doc_id, CAST(sum(bf * logp_q) AS BIGINT) AS score_qnats,
         CAST(sum(bf) AS BIGINT) AS n_bigrams
  FROM scored GROUP BY 1
)
SELECT d.doc_id,
       coalesce(s.score_qnats, 0) AS score_qnats,
       coalesce(s.n_bigrams, 0) AS n_bigrams
FROM documents d LEFT JOIN sums s USING (doc_id)
""",
    doc="bigram LM quality score with stupid backoff (CCNet-style middle "
    "tier): trains on the even-doc_id half, scores every document — "
    "held-out docs exercise the unseen-bigram backoff to the unigram "
    "distribution (alpha=2/5, OOV continuation counts as 1); integer-"
    "quantized log-probs, vocab-sized broadcast layers only "
    "(operators/text.py:bigram_logprob_scores)",
    tags=("llm", "quality", "text"),
)
def q130_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import (
        bigram_logprob_scores,
    )

    docs = table(spark, sf_dir, "documents")
    return bigram_logprob_scores(docs, "doc_id")


@register(
    "q131_source_wilson_ranking",
    oracle="""
WITH f AS (
  SELECT source,
         CASE WHEN len(string_split(text, ' ')) < 15 THEN 0
              WHEN (CAST(length(text) AS DOUBLE)
                    - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
                   / length(text) > 0.2 THEN 0
              WHEN len(list_filter(string_split(text, ' '),
                       t -> list_contains(['the','and','of','to','a'], t)))
                   = 0 THEN 0
              ELSE 1 END AS keep
  FROM documents),
g AS (
  SELECT source, count(*) AS n, CAST(sum(keep) AS BIGINT) AS k
  FROM f GROUP BY 1),
wil AS (
  SELECT source, n, k,
         CAST(k AS DOUBLE) / n AS phat,
         1.96 * 1.96 AS z2
  FROM g)
SELECT source, CAST(n AS BIGINT) AS n_docs, k AS n_keep,
       CAST(floor(
         ((phat + z2 / (2.0 * n))
          - 1.96 * sqrt((phat * (1.0 - phat) + z2 / (4.0 * n)) / n))
         / (1.0 + z2 / n) * 1000000000) AS BIGINT) AS wilson_lb_q
FROM wil
""",
    doc="source-level curation ranking by Wilson lower confidence bound on "
    "the quality-keep rate (q44's verdict rules): small sources with "
    "perfect rates rank below large sources with near-perfect rates — the "
    "statistically honest ordering for keep/drop-by-source decisions; "
    "one source-keyed aggregate, Wilson arithmetic on the source-count "
    "layer only, quantized to integer 1e-9 for engine-exact comparison",
    tags=("llm", "governance", "quality"),
)
def q131_source_wilson_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import tokens

    docs = table(spark, sf_dir, "documents")
    c = F.col("text")
    toks = tokens("text")
    n_tok = F.size(toks)
    punct_ratio = (
        F.length(c).cast("double")
        - F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    ) / F.length(c)
    stop = F.array(*[F.lit(m) for m in ("the", "and", "of", "to", "a")])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    keep = (
        F.when(n_tok < 15, F.lit(0))
        .when(punct_ratio > 0.2, F.lit(0))
        .when(n_stop == 0, F.lit(0))
        .otherwise(F.lit(1))
    )
    g = docs.select(F.col("source"), keep.alias("keep")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("keep").cast("bigint").alias("k"),
    )
    n = F.col("n").cast("double")
    phat = F.col("k").cast("double") / n
    z = F.lit(1.96)
    z2 = z * z
    lb = (
        (phat + z2 / (F.lit(2.0) * n))
        - z
        * F.sqrt(
            (phat * (F.lit(1.0) - phat) + z2 / (F.lit(4.0) * n)) / n
        )
    ) / (F.lit(1.0) + z2 / n)
    return g.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("k").alias("n_keep"),
        F.floor(lb * F.lit(1_000_000_000)).cast("bigint").alias(
            "wilson_lb_q"
        ),
    )


@register(
    "q132_source_lang_drift",
    oracle="""
WITH sl AS (
  SELECT source, lang, count(*) AS nsl FROM documents GROUP BY 1, 2),
s AS (SELECT source, CAST(sum(nsl) AS BIGINT) AS ns FROM sl GROUP BY 1),
l AS (SELECT lang, CAST(sum(nsl) AS BIGINT) AS nl FROM sl GROUP BY 1),
t AS (SELECT CAST(sum(nl) AS BIGINT) AS n FROM l),
terms AS (
  SELECT sl.source,
         CAST(floor(
           (CAST(sl.nsl AS DOUBLE) / s.ns)
           * ln((CAST(sl.nsl AS DOUBLE) / s.ns)
                / (CAST(l.nl AS DOUBLE) / t.n)) * 1000000000) AS BIGINT)
           AS term_q
  FROM sl JOIN s USING (source) JOIN l USING (lang) CROSS JOIN t)
SELECT source, CAST(sum(term_q) AS BIGINT) AS kl_q
FROM terms GROUP BY 1
""",
    doc="per-source language-mixture drift: KL(source lang distribution || "
    "corpus lang distribution) — the mixture-monitoring signal that flags "
    "a source whose language composition diverges from the corpus plan; "
    "every layer is (source x lang)-sized, KL terms quantized to integer "
    "1e-9 nats BEFORE summing so the fold is order-independent and "
    "engine-exact",
    tags=("llm", "governance", "sampling"),
)
def q132_source_lang_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    sl = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("nsl"))
    from cassandra_analytics_example_spark.session import pin_small

    sl = pin_small(sl)
    s = sl.groupBy("source").agg(F.sum("nsl").cast("bigint").alias("ns"))
    lcounts = sl.groupBy("lang").agg(
        F.sum("nsl").cast("bigint").alias("nl")
    )
    t = lcounts.agg(F.sum("nl").cast("bigint").alias("n"))
    ps = F.col("nsl").cast("double") / F.col("ns")
    pl = F.col("nl").cast("double") / F.col("n")
    term = ps * F.log(ps / pl)
    return (
        sl.join(F.broadcast(s), "source")
        .join(F.broadcast(lcounts), "lang")
        .crossJoin(F.broadcast(t))
        .select(
            "source",
            F.floor(term * F.lit(1_000_000_000))
            .cast("bigint")
            .alias("term_q"),
        )
        .groupBy("source")
        .agg(F.sum("term_q").cast("bigint").alias("kl_q"))
    )


@register(
    "q133_temporal_embargo_split",
    oracle="""
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
cut AS (
  SELECT lo + (hi - lo) * 3 // 5 AS t_cut,
         lo + (hi - lo) * 3 // 5
           + CAST(43200000000 AS BIGINT) AS t_test
  FROM b)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       CASE WHEN epoch_us(e.ts) < c.t_cut THEN 'train'
            WHEN epoch_us(e.ts) >= c.t_test THEN 'test'
            ELSE 'embargo' END AS split
FROM events e CROSS JOIN cut c
""",
    doc="temporal train/test split with a 12h embargo gap at the cut "
    "(time-series leakage control: rows inside the gap are excluded so "
    "train-adjacent information cannot bleed into test); the cut is "
    "integer arithmetic on the min/max bounds — a two-value broadcast, "
    "rows never shuffle",
    tags=("llm", "sampling", "governance"),
)
def q133_temporal_embargo_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    b = ev.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    ).select(
        # exact integer floor-division on both engines (Spark `div`,
        # DuckDB `//`) — float division + cast would round differently
        F.expr("lo + (hi - lo) * 3 div 5").cast("bigint").alias("t_cut")
    ).select(
        "t_cut",
        (F.col("t_cut") + F.lit(12 * 3600 * 1_000_000)).alias("t_test"),
    )
    return ev.crossJoin(F.broadcast(b)).select(
        "event_id",
        "user_id",
        F.col("ts_us").cast("bigint").alias("ts_us"),
        F.when(F.col("ts_us") < F.col("t_cut"), F.lit("train"))
        .when(F.col("ts_us") >= F.col("t_test"), F.lit("test"))
        .otherwise(F.lit("embargo"))
        .alias("split"),
    )


@register(
    "q134_grouped_split",
    oracle="""
WITH assigned AS (
  SELECT doc_id, source,
         CASE WHEN CAST(('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 15))
                   AS BIGINT) % 10000 < 9000 THEN 'train'
              WHEN CAST(('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 15))
                   AS BIGINT) % 10000 < 9500 THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT source, split, count(*) AS n_docs,
       count(DISTINCT split) OVER (PARTITION BY source) AS n_splits_for_source
FROM assigned GROUP BY source, split
""",
    doc="group-aware train/val/test split: the md5 bucket hashes the GROUP "
    "key (source), so every document of a source lands in the same split — "
    "the standard defense against near-duplicate leakage across splits "
    "(within-source near-dups can never straddle train/test); "
    "n_splits_for_source == 1 for every row is the auditable invariant",
    tags=("llm", "sampling", "governance"),
)
def q134_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sampling import (
        hash_split,
    )

    docs = table(spark, sf_dir, "documents")
    assigned = hash_split(docs.select("doc_id", "source"), "source")
    g = assigned.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("source")
    return g.select(
        "source",
        "split",
        "n_docs",
        F.size(F.collect_set("split").over(w))
        .cast("bigint")
        .alias("n_splits_for_source"),
    )


from cassandra_analytics_example_spark.operators.sketches import (  # noqa: E402
    HLL_EST_NUM as _HLL_NUM,
)


@register(
    "q135_hll_shard_merge",
    oracle=f"""
WITH h AS (
  SELECT (doc_id % 4) AS shard,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h
  FROM documents),
rho AS (
  SELECT shard, h >> 52 AS bucket, h % 4503599627370496 AS rem FROM h),
rr AS (
  SELECT shard, bucket,
         CASE WHEN rem = 0 THEN 53
              ELSE 53 - length(bin(rem)) END AS rho
  FROM rho),
shard_regs AS (
  SELECT shard, bucket, max(rho) AS r FROM rr GROUP BY 1, 2),
merged_regs AS (
  SELECT bucket, max(r) AS r FROM shard_regs GROUP BY 1),
est_shard AS (
  SELECT 'shard_' || CAST(shard AS VARCHAR) AS scope,
         CAST(sum(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT) AS sp,
         count(*) AS np
  FROM shard_regs GROUP BY shard),
est_merged AS (
  SELECT 'merged' AS scope,
         CAST(sum(CAST(1 AS BIGINT) << (53 - r)) AS BIGINT) AS sp,
         count(*) AS np
  FROM merged_regs),
scopes AS (SELECT * FROM est_shard UNION ALL SELECT * FROM est_merged),
est AS (
  SELECT scope,
         CASE WHEN (256 - np) > 0
                   AND {_HLL_NUM!r} / (CAST(sp AS DOUBLE)
                       + (256 - np) * 9007199254740992.0) < 640.0
              THEN 256.0 * ln(256.0 / CAST(256 - np AS DOUBLE))
              ELSE {_HLL_NUM!r} / (CAST(sp AS DOUBLE)
                       + (256 - np) * 9007199254740992.0) END AS est
  FROM scopes)
SELECT scope, est FROM est
UNION ALL
SELECT 'exact' AS scope, CAST(count(DISTINCT text) AS DOUBLE) AS est
FROM documents
""",
    doc="portable mergeable HyperLogLog (p=8, md5-deterministic): per-shard "
    "register tables max-merge into the global registers — the associative/"
    "idempotent merge identity that lets 1000 executors sketch "
    "independently and combine in 256 rows; harmonic mean in EXACT scaled-"
    "integer arithmetic so the estimate is bit-identical in any engine at "
    "any parallelism; per-shard + merged + exact rows "
    "(operators/sketches.py:hll_registers/hll_estimate)",
    tags=("llm", "sketch"),
)
def q135_hll_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    docs = table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 4).alias("shard"), "text"
    )
    shard_regs = hll_registers(docs, "text", ("shard",))
    merged_regs = shard_regs.groupBy("bucket").agg(
        F.max("r").alias("r")
    )
    per_shard = hll_estimate(shard_regs, ("shard",)).select(
        F.concat(F.lit("shard_"), F.col("shard").cast("string")).alias(
            "scope"
        ),
        "est",
    )
    merged = hll_estimate(merged_regs).select(
        F.lit("merged").alias("scope"), "est"
    )
    exact = table(spark, sf_dir, "documents").agg(
        F.lit("exact").alias("scope"),
        F.countDistinct("text").cast("double").alias("est"),
    )
    return per_shard.unionByName(merged).unionByName(exact)


@register(
    "q136_hybrid_rrf_retrieval",
    oracle="""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
dense AS (
  SELECT query_id, nid, rnk FROM (
    SELECT q.query_id, c.nid,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qv, c.cv)
                                       DESC, c.nid ASC) AS rnk
    FROM q JOIN c ON q.query_id <> c.nid
  ) WHERE rnk <= 10
),
qd AS (SELECT doc_id AS query_id, list_distinct(string_split(text, ' '))
              AS qtok FROM documents WHERE doc_id < 3),
sparse AS (
  SELECT query_id, nid, rnk FROM (
    SELECT qd.query_id, d.doc_id AS nid,
           row_number() OVER (PARTITION BY qd.query_id
             ORDER BY len(list_filter(list_distinct(string_split(d.text, ' ')),
                          t -> list_contains(qd.qtok, t))) DESC,
                      d.doc_id ASC) AS rnk
    FROM qd JOIN documents d ON qd.query_id <> d.doc_id
  ) WHERE rnk <= 10
),
fused AS (
  SELECT coalesce(dn.query_id, sp.query_id) AS query_id,
         coalesce(dn.nid, sp.nid) AS doc_id,
         coalesce(1.0 / (60 + dn.rnk), 0.0)
           + coalesce(1.0 / (60 + sp.rnk), 0.0) AS rrf
  FROM dense dn FULL OUTER JOIN sparse sp
    ON dn.query_id = sp.query_id AND dn.nid = sp.nid
)
SELECT query_id, doc_id, rrf, fused_rank FROM (
  SELECT query_id, doc_id, rrf,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rrf DESC, doc_id ASC) AS fused_rank
  FROM fused
) WHERE fused_rank <= 5
""",
    doc="hybrid retrieval via reciprocal-rank fusion (k=60): dense "
    "cosine top-10 (query side broadcast, corpus never reshuffled) fused "
    "with sparse distinct-token-overlap top-10 by full-outer rank join; "
    "RRF score is two single divisions in a fixed expression order — "
    "deterministic without quantization; final top-5 per query",
    tags=("llm", "similarity", "retrieval"),
)
def q136_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import (
        distinct_tokens,
    )
    from cassandra_analytics_example_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    dense = (
        brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=10)
        .select("query_id", F.col("neighbor_id").alias("doc_id"),
                F.col("rnk").alias("rd"))
    )
    docs = table(spark, sf_dir, "documents")
    qd = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        distinct_tokens("text").alias("qtok"),
    )
    scored = docs.join(
        F.broadcast(qd), F.col("query_id") != F.col("doc_id")
    ).select(
        "query_id",
        "doc_id",
        F.size(
            F.filter(
                distinct_tokens("text"),
                lambda t: F.array_contains(F.col("qtok"), t),
            )
        ).alias("ovl"),
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.desc("ovl"), F.asc("doc_id")
    )
    sparse = (
        scored.withColumn("rs", F.row_number().over(ws))
        .where(F.col("rs") <= 10)
        .select("query_id", "doc_id", "rs")
    )
    fused = dense.join(sparse, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rd")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rs")), F.lit(0.0))
        ).alias("rrf"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("rrf"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf))
        .where(F.col("fused_rank") <= 5)
        .select("query_id", "doc_id", "rrf", "fused_rank")
    )


_SIG_MATCHES = " + ".join(
    f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)"
    for i in range(_MINHASH_SEEDS)
)


@register(
    "q137_minhash_calibration",
    oracle=f"""
WITH reps AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents) WHERE rn = 1
),
hvals AS (
  SELECT doc_id, {{hv}} AS hv FROM reps
),
sig AS (
  SELECT doc_id,
         {{sig}}
  FROM hvals
),
bands AS (
  SELECT doc_id, b.band AS band, b.bhash AS bhash
  FROM sig, UNNEST([{{bandstructs}}]) AS t(b)
),
bsize AS (
  SELECT band, bhash, count(*) AS n FROM bands GROUP BY 1, 2
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bhash = b.bhash AND a.doc_id < b.doc_id
  JOIN bsize s ON s.band = a.band AND s.bhash = a.bhash AND s.n <= 1000
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, length(text) - {_SHINGLE_K - 2}),
                                      i -> substr(text, i, {_SHINGLE_K}))) AS sh
  FROM reps
)
SELECT c.id_a, c.id_b,
       CAST({_SIG_MATCHES} AS BIGINT) AS sig_matches,
       CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
       CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
            AS BIGINT) AS uni
FROM cands c
JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
JOIN sh a ON c.id_a = a.doc_id JOIN sh b ON c.id_b = b.doc_id
""".format(hv=_hv_expr, sig=_sig_cols, bandstructs=_band_structs),
    doc="MinHash estimator calibration audit over the LSH candidate pairs: "
    "per pair the signature agreement count (the 16-trial estimate of "
    "Jaccard) next to the EXACT shingle intersection/union — the audit "
    "that turns 'we trust MinHash' into measured estimator error, exactly "
    "as q96 audits the ANN ladder; all columns exact integers, shingle "
    "sets materialized ONCE and shared by signatures and verification "
    "(operators/dedup.py:signatures_from_shingles)",
    tags=("llm", "dedup", "audit"),
)
def q137_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import shingles
    from cassandra_analytics_example_spark.operators.dedup import (
        lsh_candidate_pairs,
        signatures_from_shingles,
    )

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    reps = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    sh_df = reps.select(
        "doc_id", F.array_distinct(shingles("text", 5)).alias("__sh")
    )
    from cassandra_analytics_example_spark.session import pin_small

    sh_df = pin_small(sh_df)
    sigs = pin_small(signatures_from_shingles(sh_df, "doc_id"))
    pairs = lsh_candidate_pairs(sigs, "doc_id", 4, 4, max_bucket_size=1000)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    ha = sh_df.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("sh_a"))
    hb = sh_df.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(sa, "id_a").join(sb, "id_b").join(ha, "id_a").join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with(
                    "sig_a", "sig_b",
                    lambda x, y: (x == y).cast("bigint"),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("sig_matches"),
            inter.cast("bigint").alias("inter"),
            (F.size("sh_a") + F.size("sh_b") - inter)
            .cast("bigint")
            .alias("uni"),
        )
    )


# IVF cell-partitioned vector index, written ONCE per (session, sf_dir) —
# the query must not pay the layout write per invocation (the q101 layout
# cache discipline).
_IVF_ROOTS: dict[tuple[str, str], str] = {}


def _ivf_index_root(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    from cassandra_analytics_example_spark.operators.similarity import (
        assign_cells,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    root = _IVF_ROOTS.get(key)
    if root is not None and os.path.isdir(root):
        return root
    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("centv")
    )
    cells = assign_cells(emb, cents)
    root = tempfile.mkdtemp(prefix="ivf_index-")
    cells.select("vec_id", "embedding", "cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(root)
    _IVF_ROOTS[key] = root
    return root


def ivf_partitioned_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAZY cell-routed search over the PERSISTED index; caller owns the
    DPP conf scope (q101 discipline)."""
    from cassandra_analytics_example_spark.functions.vector import (
        cosine_similarity,
    )
    from cassandra_analytics_example_spark.operators.similarity import (
        assign_cells,
    )

    root = _ivf_index_root(spark, sf_dir)
    corpus = spark.read.parquet(root)  # cell = hive partition column
    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("centv")
    )
    q = assign_cells(emb.filter(F.col("vec_id") < 10), cents).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "cell",
    )
    scored = (
        corpus.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_similarity("qv", "embedding").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 5
    )


@register(
    "q138_ivf_partitioned_index",
    oracle="""
WITH cents AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS centv
  FROM embeddings WHERE vec_id < 8
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cells AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT v.vec_id, v.v, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_cosine_similarity(v.v, c.centv) DESC,
                                       c.cent_id ASC) AS rn
    FROM v, cents c) WHERE rn = 1
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, c.v) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                     c.vec_id ASC) AS rnk
  FROM cells q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
) WHERE rnk <= 5
""",
    doc="IVF index PERSISTED as a cell-partitioned parquet layout (the "
    "vector-store shape: one directory per Voronoi cell), searched by "
    "joining the broadcast query-cell assignment against the partition "
    "column so dynamic partition pruning skips every unprobed cell's "
    "directory at scan time; write paid once per session, results "
    "identical to the in-flight IVF (q32 oracle verbatim) "
    "(queries/llm.py:ivf_partitioned_plan; layout cache: _ivf_index_root)",
    tags=("llm", "similarity", "layout"),
)
def q138_ivf_partitioned_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        return ivf_partitioned_plan(spark, sf_dir).localCheckpoint(
            eager=True
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


@register(
    "q141_ivf_incremental_maintenance",
    oracle="""
WITH cents AS (
  SELECT vec_id AS cent_id, CAST(embedding AS DOUBLE[]) AS centv
  FROM embeddings WHERE vec_id < 8
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cells AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT v.vec_id, v.v, c.cent_id,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY list_cosine_similarity(v.v, c.centv) DESC,
                                       c.cent_id ASC) AS rn
    FROM v, cents c) WHERE rn = 1
)
SELECT query_id, neighbor_id, cosine, rnk FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.v, c.v) AS cosine,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY list_cosine_similarity(q.v, c.v) DESC,
                                     c.vec_id ASC) AS rnk
  FROM cells q JOIN cells c ON q.cell = c.cell AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 10
) WHERE rnk <= 5
""",
    doc="incremental IVF index maintenance: the base corpus (all but the "
    "last 50 vectors) is written as the cell-partitioned layout, the "
    "delta assigns against the SAME frozen centroids and APPENDS into "
    "only its own cell directories (dynamic partitionBy append — "
    "untouched cells' files are never rewritten), and the post-append "
    "search over the persisted index is IDENTICAL to an index built from "
    "the full corpus at once (q32 oracle verbatim); the maintenance cost "
    "tracks the delta, not the corpus",
    tags=("llm", "similarity", "layout", "incremental"),
)
def q141_ivf_incremental_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import tempfile

    from cassandra_analytics_example_spark.functions.vector import (
        cosine_similarity,
    )
    from cassandra_analytics_example_spark.operators.similarity import (
        assign_cells,
    )

    emb = table(spark, sf_dir, "embeddings")
    n_total = emb.count()
    cut = n_total - 50
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("centv")
    )
    root = tempfile.mkdtemp(prefix="ivf_incr-")
    base = assign_cells(emb.filter(F.col("vec_id") < cut), cents)
    base.select("vec_id", "embedding", "cell").write.partitionBy(
        "cell"
    ).mode("overwrite").parquet(root)
    # the delta assigns against the SAME frozen centroids and appends —
    # only the delta's cells gain files, the rest of the layout is
    # untouched (no read-modify-write of existing directories)
    delta = assign_cells(emb.filter(F.col("vec_id") >= cut), cents)
    delta.select("vec_id", "embedding", "cell").write.partitionBy(
        "cell"
    ).mode("append").parquet(root)

    corpus = spark.read.parquet(root)
    q = assign_cells(emb.filter(F.col("vec_id") < 10), cents).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "cell",
    )
    scored = (
        corpus.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_similarity("qv", "embedding").alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 5
    )


# ------------------------------------------------- substring dedup --------
# q142 — exact duplicated-substring spans (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better": the ExactSubstr pass): every
# 32-char window shared by >= 2 distinct docs is duplicated; overlapping
# windows merge into per-doc spans via gaps-and-islands; each doc reports
# its duplicated-character budget.  Distinct from q73 (which counts
# DISTINCT grams corpus-wide): this is positional — it localizes WHERE the
# duplication sits and how many characters a substring-dedup rewrite would
# cut from each document.
# --------------------------------------------------------------------------

_SPAN_K = 32


@register(
    "q142_substring_dup_spans",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, CAST(i AS INTEGER) AS i,
         md5(substr(text, CAST(i AS INTEGER), {_SPAN_K})) AS h
  FROM documents,
       LATERAL unnest(generate_series(1, length(text) - {_SPAN_K} + 1)) t(i)
  WHERE length(text) >= {_SPAN_K}
),
dup AS (
  SELECT h FROM pos GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
dwin AS (SELECT doc_id, i FROM pos JOIN dup USING (h)),
marked AS (
  SELECT doc_id, i,
         CASE WHEN lag(i) OVER w IS NULL OR i - lag(i) OVER w > {_SPAN_K}
              THEN 1 ELSE 0 END AS new_span
  FROM dwin WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
isl AS (
  SELECT doc_id, i,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY i
                             ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
),
spans AS (
  SELECT doc_id, island, min(i) AS s, max(i) AS e, count(*) AS nw
  FROM isl GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id,
         CAST(sum(nw) AS BIGINT) AS n_dup_windows,
         CAST(count(*) AS BIGINT) AS n_spans,
         CAST(sum(e + {_SPAN_K} - s) AS BIGINT) AS dup_chars
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(coalesce(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_chars, 0) AS BIGINT) AS dup_chars,
       CAST(coalesce(p.dup_chars, 0) * 1000 // length(d.text) AS BIGINT)
         AS dup_permille
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""",
    doc="exact duplicated-substring spans (ExactSubstr dedup audit): "
    "32-char windows shared across >= 2 docs, merged into per-doc spans, "
    "per-doc duplicated-char budget in exact integer permille; window "
    "table is linear in corpus chars, duplicate detection is one "
    "md5-keyed groupBy + same-key join-back, span merge is one doc-keyed "
    "window — no all-pairs anywhere",
    tags=("llm", "dedup", "substring"),
)
def q142_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.text import (
        duplicated_substring_spans,
    )

    docs = table(spark, sf_dir, "documents")
    # dup_detection="aggregate" (the fast single-lineage form, 2.2x over
    # the streamed default) is safe HERE: the fixture corpus has no
    # degenerate boilerplate (q120's audit bounds shared-window
    # multiplicity), so no window hash's (doc, pos) buffer can approach
    # corpus size. The operator default is the streamed "join" form.
    return duplicated_substring_spans(
        docs, id_col="doc_id", text_col="text", k=_SPAN_K, min_docs=2,
        dup_detection="aggregate",
    )


# ------------------------------------------------- product quantization ---
# q146 — PQ code assignment + distortion audit: 64-dim vectors split into
# 4x16-dim subspaces, each subvector quantized to the nearest of 16
# deterministic codewords (the lowest-id vectors' slices), distortion
# floor-quantized to integer nanos.  The memory-compression tier under
# IVF (q32/q138): 64 floats -> 4 bytes per vector at search time.
# --------------------------------------------------------------------------


def _pq_oracle(n_sub: int = 4, sub_dim: int = 16, n_codes: int = 16) -> str:
    parts = []
    for s in range(n_sub):
        lo, hi = s * sub_dim + 1, (s + 1) * sub_dim
        parts.append(
            f"SELECT vec_id, {s} AS sub,"
            f" (CAST(embedding AS DOUBLE[]))[{lo}:{hi}] AS sv"
            f" FROM embeddings"
        )
    subs = " UNION ALL ".join(parts)
    return f"""
WITH subs AS ({subs}),
cents AS (
  SELECT sub, CAST(vec_id AS INTEGER) AS code, sv AS cv
  FROM subs WHERE vec_id < {n_codes}
),
scored AS (
  SELECT s.vec_id, s.sub, c.code,
         list_sum(list_transform(generate_series(1, {sub_dim}),
                  i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS d2
  FROM subs s JOIN cents c USING (sub)
)
SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
       CAST(floor(d2 * 1000000000) AS BIGINT) AS d2_q
FROM scored
QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                           ORDER BY d2 ASC, code ASC) = 1
"""


@register(
    "q146_pq_codes",
    oracle=_pq_oracle(),
    doc="product-quantization assignment: 4x16-dim subspaces, 16 "
    "deterministic codewords each (lowest-id vector slices), squared-L2 "
    "argmin with code-id tie-break, distortion floor-quantized to "
    "integer nanos; the codebook (64 rows) broadcasts, the corpus is "
    "never reshuffled, and the fold order matches the oracle "
    "bit-for-bit (functions/vector.py discipline)",
    tags=("llm", "ann", "compression"),
)
def q146_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.similarity import (
        pq_assign,
    )

    emb = table(spark, sf_dir, "embeddings")
    return pq_assign(emb)


# ------------------------------------------- join-size estimation audit ---
# q148 — sketch-based join-cardinality estimation, audited against the
# exact answer: the self-join size of lineitem on l_partkey (the dedup /
# candidate-pair blowup number: sum_k c(k)^2) next to the count-min
# inner-product estimate computed ONLY from the depth*width cell table.
# The estimate a planner (or a dedup pre-flight) uses to refuse a
# quadratic bucket before paying for it.
# --------------------------------------------------------------------------


@register(
    "q148_join_size_estimate",
    oracle="""
WITH k AS (SELECT CAST(l_partkey AS VARCHAR) AS key FROM lineitem),
cnt AS (SELECT key, count(*) AS n FROM k GROUP BY key),
exact_t AS (SELECT CAST(sum(n * n) AS BIGINT) AS exact_size FROM cnt),
ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
cells AS (
  SELECT d,
         CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || key), 1, 15))
              AS BIGINT) % 256 AS cell,
         count(*) AS c
  FROM k, ds GROUP BY 1, 2
),
ip AS (SELECT d, CAST(sum(c * c) AS BIGINT) AS ip FROM cells GROUP BY d),
est_t AS (SELECT CAST(min(ip) AS BIGINT) AS est_size FROM ip)
SELECT exact_size, est_size,
       CAST(est_size * 1000 // exact_size AS BIGINT) AS over_permille
FROM exact_t, est_t
""",
    doc="join-cardinality estimation audit: exact self-join size on "
    "l_partkey (sum of squared key counts — the candidate-pair blowup "
    "metric) vs the count-min inner-product estimate computed from the "
    "depth*width cell table alone; the estimate never underestimates, "
    "and over_permille quantifies its slack in exact integers — the "
    "pre-flight a planner runs before risking a skewed join "
    "(operators/sketches.py:countmin_inner_product)",
    tags=("llm", "sketch", "planning"),
)
def q148_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sketches import (
        countmin_cells,
        countmin_inner_product,
    )

    from cassandra_analytics_example_spark.session import spread

    # the sketch explodes each key x depth and md5-hashes every row: spread
    # first so a single-split parquet doesn't serialize the hash pipeline
    keys = spread(
        table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").cast("string").alias("key")
        )
    )
    exact = (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * F.col("n")).cast("bigint").alias("exact_size"))
    )
    cells = countmin_cells(keys, "key")
    est = countmin_inner_product(cells, cells)
    return (
        exact.crossJoin(F.broadcast(est))
        .select(
            "exact_size",
            "est_size",
            F.expr("est_size * 1000 div exact_size")
            .cast("bigint")
            .alias("over_permille"),
        )
    )


# --------------------------------------- incremental cluster maintenance --
# q152 — fold a delta batch (doc_id % 5 == 0) into the base MinHash-LSH
# clustering via rep-graph CONTRACTION (operators/dedup.py:
# incremental_lsh_clusters): base pairs come from the base-only band
# index, the delta pass joins only delta band rows against the full
# index, and components re-run only over delta docs + touched base reps.
# The oracle is a FULL recompute (recursive transitive closure over the
# q21 pair SQL) — the incremental result must hash-match it exactly.
# --------------------------------------------------------------------------


@register(
    "q152_incremental_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS (
{_Q21_ORACLE}
),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
),
cc AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
fl AS (
  SELECT doc_id, cluster_id, doc_id % 5 = 0 AS is_delta FROM cc
)
SELECT doc_id, cluster_id, is_delta,
       (sum(CASE WHEN is_delta THEN 1 ELSE 0 END)
          OVER (PARTITION BY cluster_id) > 0
        AND sum(CASE WHEN is_delta THEN 0 ELSE 1 END)
          OVER (PARTITION BY cluster_id) > 0) AS bridged
FROM fl
""",
    doc="incremental near-dup cluster maintenance: delta docs (id % 5 == "
    "0) fold into the base clustering by joining only delta band rows "
    "against the band index and re-running components on the CONTRACTED "
    "graph (delta docs + touched base reps — never base x base); "
    "contraction preserves min-labels exactly, so the result hash-matches "
    "the oracle's full recursive-closure recompute; bridged flags the "
    "merge events",
    tags=("llm", "dedup", "incremental"),
)
def q152_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.dedup import (
        incremental_lsh_clusters,
    )

    docs = table(spark, sf_dir, "documents")
    return incremental_lsh_clusters(
        docs,
        "doc_id",
        "text",
        delta_pred=(F.col("doc_id") % 5 == 0),
        num_hashes=_MINHASH_SEEDS,
        shingle_k=_SHINGLE_K,
        num_bands=_MINHASH_BANDS,
        jaccard_threshold=0.5,
    )


# --------------------------------------------- matryoshka truncation ------
# q153 — dimension-truncation quality audit (the matryoshka-embedding
# question): for the exact top-5 neighbors of each query (q25's pairs),
# recompute cosine over only the FIRST d components (d = 16, 32, 64) and
# re-rank — how much of the neighborhood structure survives a cheaper
# truncated index.  Per-pair nano-quantized cosines (the ordered-fold
# doubles are engine-identical, so floor-quantization is exact); the
# re-rank inversions against the full-dim order are the quality signal.
# --------------------------------------------------------------------------

_MATRYOSHKA_DIMS = (16, 32, 64)


def _q153_oracle() -> str:
    dims_sql = []
    for d in _MATRYOSHKA_DIMS:
        dims_sql.append(f"""
SELECT query_id, neighbor_id, rnk AS rnk_full, {d} AS dim,
       list_cosine_similarity(qv[1:{d}], cv[1:{d}]) AS tc
FROM pairs""")
    body = " UNION ALL ".join(dims_sql)
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
pairs AS (
  SELECT query_id, neighbor_id, qv, cv, rnk FROM (
    SELECT q.query_id, c.neighbor_id, q.qv, c.cv,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                                       c.neighbor_id ASC) AS rnk
    FROM q JOIN c ON q.query_id <> c.neighbor_id
  ) WHERE rnk <= 5
),
truncd AS ({body})
SELECT query_id, neighbor_id,
       CAST(rnk_full AS BIGINT) AS rnk_full,
       CAST(dim AS BIGINT) AS dim,
       CAST(floor(tc * 1000000000) AS BIGINT) AS cos_q,
       CAST(row_number() OVER (PARTITION BY query_id, dim
                               ORDER BY tc DESC, neighbor_id ASC)
            AS BIGINT) AS rnk_trunc
FROM truncd
"""


@register(
    "q153_matryoshka_truncation",
    oracle=_q153_oracle(),
    doc="matryoshka dimension-truncation audit: the exact top-5 cosine "
    "neighbors per query re-scored and re-ranked at dims 16/32/64 — "
    "per-pair nano-quantized truncated cosines plus the truncated rank "
    "next to the full-dim rank; the 50-pair layer is tiny, so every "
    "truncation re-rank is a window over 5 rows — the index-cheapening "
    "decision (shorter vectors = smaller IVF/PQ index) made measurable",
    tags=("llm", "similarity", "audit"),
)
def q153_matryoshka_truncation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.vector import (
        cosine_similarity,
    )
    from cassandra_analytics_example_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    top = brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id", F.col("rnk").alias("rnk_full")
    )
    qv = emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    pairs = top.join(F.broadcast(qv), "query_id").join(
        F.broadcast(cv), "neighbor_id"
    )
    parts = []
    for d in _MATRYOSHKA_DIMS:
        parts.append(
            pairs.select(
                "query_id",
                "neighbor_id",
                F.col("rnk_full").cast("bigint").alias("rnk_full"),
                F.lit(d).cast("bigint").alias("dim"),
                cosine_similarity(
                    F.slice("qv", 1, d), F.slice("cv", 1, d)
                ).alias("tc"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.partitionBy("query_id", "dim").orderBy(
        F.desc("tc"), F.asc("neighbor_id")
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "rnk_full",
        "dim",
        F.expr("cast(floor(tc * 1000000000) as bigint)").alias("cos_q"),
        F.row_number().over(w).cast("bigint").alias("rnk_trunc"),
    )


# ------------------------------------------------ chunk-store dedup -------
# q155 — binary chunk-store dedup accounting: payloads split into 64-byte
# chunks, content-addressed by digest; the refcount histogram with exact
# logical-vs-unique byte totals is what a content-addressable blob store
# saves at 100 TB.  Payloads are ASCII-stripped before encoding (the q97
# convention) so the SQL oracle's character arithmetic equals the Spark
# side's byte arithmetic on any fixture.
# --------------------------------------------------------------------------

_CHUNK_B = 64


@register(
    "q155_chunk_store_dedup",
    oracle=f"""
WITH a AS (
  SELECT regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS t FROM documents
),
c AS (
  SELECT md5(substr(t, CAST(1 + {_CHUNK_B} * i AS INTEGER), {_CHUNK_B})) AS h,
         length(substr(t, CAST(1 + {_CHUNK_B} * i AS INTEGER), {_CHUNK_B})) AS b
  FROM a, LATERAL unnest(generate_series(
       0, CAST(ceil(length(t) / {_CHUNK_B}.0) AS INTEGER) - 1)) s(i)
  WHERE length(t) > 0
),
store AS (
  SELECT h, count(*) AS refcount, max(b) AS b FROM c GROUP BY h
)
SELECT CAST(refcount AS BIGINT) AS refcount,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(b) AS BIGINT) AS unique_bytes,
       CAST(sum(b) * refcount AS BIGINT) AS logical_bytes
FROM store GROUP BY refcount
""",
    doc="content-addressable chunk-store accounting: 64-byte payload "
    "chunks digested and refcounted, histogram of refcounts with exact "
    "logical/unique byte totals — logical minus unique is the dedup "
    "saving a blob store realizes; one bounded explode, one digest-keyed "
    "groupBy, one vocabulary-sized histogram "
    "(operators/multimodal.py:chunk_dedup_stats)",
    tags=("llm", "multimodal", "dedup", "storage"),
)
def q155_chunk_store_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.multimodal import (
        attach_audio_payload,
        chunk_dedup_stats,
    )

    docs = table(spark, sf_dir, "documents")
    payloads = attach_audio_payload(docs).select("doc_id", "payload")
    return chunk_dedup_stats(payloads, "payload", chunk_bytes=_CHUNK_B)


# --------------------------------------------------------------------------
# q166 — lang x source contingency lift: for every (lang, source) cell,
# observed count vs the independence expectation, with lift reported in
# exact integer permille (obs * N * 1000 div (row_total * col_total)).
# The corpus-composition independence audit: which sources are secretly
# single-language, which languages cluster in one crawl.  Marginals are
# two vocabulary-sized aggregates broadcast back onto the cell table —
# the corpus is scanned once and shuffled once on the cell key.
# --------------------------------------------------------------------------


@register(
    "q166_contingency_lift",
    oracle="""
WITH cells AS (
  SELECT lang, source, count(*) AS n_obs
  FROM documents GROUP BY lang, source
),
r AS (SELECT lang, sum(n_obs) AS n_lang FROM cells GROUP BY lang),
c AS (SELECT source, sum(n_obs) AS n_source FROM cells GROUP BY source),
t AS (SELECT sum(n_obs) AS n_total FROM cells)
SELECT cells.lang, cells.source,
       CAST(cells.n_obs AS BIGINT) AS n_obs,
       CAST(r.n_lang AS BIGINT) AS n_lang,
       CAST(c.n_source AS BIGINT) AS n_source,
       CAST(cells.n_obs * t.n_total * 1000 // (r.n_lang * c.n_source)
            AS BIGINT) AS lift_permille,
       cells.n_obs * t.n_total * 1000 // (r.n_lang * c.n_source) > 1500
         AS over_represented
FROM cells JOIN r USING (lang) JOIN c USING (source) CROSS JOIN t
""",
    doc="lang x source contingency lift in exact integer permille: cell "
    "counts vs the independence expectation, over-representation flag at "
    "1.5x — marginals derive from the cell table itself (no second corpus "
    "scan) and broadcast back; the corpus-composition independence audit",
    tags=("llm", "profiling", "audit"),
)
def q166_contingency_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("lang", "source")
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    cells = cells.localCheckpoint(eager=True)
    r = cells.groupBy("lang").agg(F.sum("n_obs").alias("n_lang"))
    c = cells.groupBy("source").agg(F.sum("n_obs").alias("n_source"))
    t = cells.agg(F.sum("n_obs").alias("n_total"))
    return (
        cells.join(F.broadcast(r), "lang")
        .join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .select(
            "lang",
            "source",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.col("n_lang").cast("bigint").alias("n_lang"),
            F.col("n_source").cast("bigint").alias("n_source"),
            # decimal: n_obs*n_total is O(corpus^2) — bigint raises at
            # ~3e7 docs, far below scale (same class as the rank fix)
            F.expr(
                "cast(cast(n_obs as decimal(38,0)) * n_total * 1000 "
                "div (cast(n_lang as decimal(38,0)) * n_source) as bigint)"
            ).alias("lift_permille"),
            F.expr(
                "cast(n_obs as decimal(38,0)) * n_total * 1000 "
                "div (cast(n_lang as decimal(38,0)) * n_source) > 1500"
            ).alias("over_represented"),
        )
    )


# --------------------------------------------------------------------------
# q170 — normalization-aware dedup gain: how many extra duplicates does
# exact dedup find AFTER canonical text normalization (lowercase, strip
# non-alphanumerics, collapse whitespace)?  The pre-dedup normalization
# decision quantified: one corpus scan, digests computed inline, two
# distinct-counts sharing it — no second scan, no string shuffle (only
# 16-byte digests move).
# --------------------------------------------------------------------------


@register(
    "q170_normalization_gain",
    oracle="""
WITH d AS (
  SELECT text,
         md5(text) AS h_raw,
         md5(trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g'))) AS h_norm,
         trim(regexp_replace(
               regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
               ' +', ' ', 'g')) != text AS changed
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN changed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed,
       CAST(count(DISTINCT h_raw) AS BIGINT) AS groups_raw,
       CAST(count(DISTINCT h_norm) AS BIGINT) AS groups_norm,
       CAST(count(*) - count(DISTINCT h_raw) AS BIGINT) AS dups_raw,
       CAST(count(*) - count(DISTINCT h_norm) AS BIGINT) AS dups_norm,
       CAST(count(DISTINCT h_raw) - count(DISTINCT h_norm) AS BIGINT)
         AS gain
FROM d
""",
    doc="normalization-aware exact-dedup gain: md5 digests of raw vs "
    "canonicalized text (lower, non-alnum -> space, collapse runs, trim) "
    "in ONE scan; extra duplicate mass surfaced by normalization in "
    "exact counts — only digests shuffle, never text",
    tags=("llm", "dedup", "text"),
)
def q170_normalization_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    d = docs.select(
        F.md5("text").alias("h_raw"),
        F.md5(norm).alias("h_norm"),
        (norm != F.col("text")).alias("changed"),
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("changed").cast("bigint"))
        .cast("bigint")
        .alias("n_changed"),
        F.countDistinct("h_raw").cast("bigint").alias("groups_raw"),
        F.countDistinct("h_norm").cast("bigint").alias("groups_norm"),
        (F.count(F.lit(1)) - F.countDistinct("h_raw"))
        .cast("bigint")
        .alias("dups_raw"),
        (F.count(F.lit(1)) - F.countDistinct("h_norm"))
        .cast("bigint")
        .alias("dups_norm"),
        (F.countDistinct("h_raw") - F.countDistinct("h_norm"))
        .cast("bigint")
        .alias("gain"),
    )


# --------------------------------------------------------------------------
# q171 — sequence-length bucketing / padding-waste audit: documents land
# in the smallest power-of-two token bucket that fits them (capped), and
# the report prices the padding a fixed-shape training batch would burn.
# Bucket assignment is a broadcast join against a constant edge table —
# the corpus never shuffles for it; the per-bucket report is one
# vocabulary-sized aggregate.  Exact integer token counts (whitespace
# tokens, the q33 convention) and exact permille waste.
# --------------------------------------------------------------------------


@register(
    "q171_padding_waste",
    oracle="""
WITH t AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
  FROM documents
),
edges AS (
  SELECT CAST(b AS BIGINT) AS bucket
  FROM (VALUES (16), (32), (64), (128), (256), (512), (1024), (2048),
               (4096), (8192)) e(b)
),
assigned AS (
  SELECT t.toks, min(edges.bucket) AS bucket
  FROM t JOIN edges ON edges.bucket >= least(t.toks, 8192)
  GROUP BY t.toks
),
fat AS (
  SELECT t.toks, a.bucket,
         CASE WHEN t.toks > 8192
              THEN ((t.toks + 8191) // 8192) * 8192
              ELSE a.bucket END AS padded
  FROM t JOIN assigned a ON a.toks = t.toks
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS tokens,
       CAST(sum(padded) AS BIGINT) AS padded_slots,
       CAST((sum(padded) - sum(toks)) * 1000 // sum(padded) AS BIGINT)
         AS waste_permille
FROM fat GROUP BY bucket
""",
    doc="power-of-two sequence-length bucketing with exact padding-waste "
    "accounting: smallest bucket >= token count via a broadcast "
    "constant-edge join (corpus unshuffled), per-bucket docs/tokens/"
    "padded-slots and integer-permille waste — the batch-shape cost "
    "model for fixed-length training. Documents longer than the top "
    "edge land in the top bucket with chunked-slot accounting "
    "(ceil(toks/8192) sequences of 8192 slots) — no doc silently "
    "vanishes from the audit",
    tags=("llm", "packing", "audit"),
)
def q171_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = docs.select(
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks")
    )
    edges = spark.createDataFrame(
        [(16,), (32,), (64,), (128,), (256,), (512,), (1024,), (2048,),
         (4096,), (8192,)],
        "bucket bigint",
    )
    # Distinct token counts first (vocabulary-sized), THEN the edge join:
    # the >= join fans out one row per fitting bucket, so it must run on
    # the distinct-toks table with min(bucket) folding the fan-out back.
    # Token counts are clamped to the top edge for ASSIGNMENT only, so
    # over-long docs fall in the top bucket instead of dropping out of
    # the inner join; their slot cost is the real chunked cost.
    tc = t.groupBy("toks").agg(F.count(F.lit(1)).alias("m"))
    fat = (
        tc.join(
            F.broadcast(edges),
            F.col("bucket") >= F.least(F.col("toks"), F.lit(8192)),
        )
        .groupBy("toks", "m")
        .agg(F.min("bucket").alias("bucket"))
        .withColumn(
            "padded",
            F.when(
                F.col("toks") > 8192,
                F.expr("((toks + 8191) div 8192) * 8192"),
            ).otherwise(F.col("bucket")),
        )
    )
    return fat.groupBy("bucket").agg(
        F.sum("m").cast("bigint").alias("n_docs"),
        F.sum(F.col("toks") * F.col("m")).cast("bigint").alias("tokens"),
        F.sum(F.col("padded") * F.col("m"))
        .cast("bigint")
        .alias("padded_slots"),
        # decimal scaling: the *1000 on a corpus-sized token sum is the
        # same bigint-overflow class as the rank-metric fix
        F.expr(
            "cast((cast(sum(padded * m) as decimal(38,0)) - sum(toks * m))"
            " * 1000 div sum(padded * m) as bigint)"
        ).alias("waste_permille"),
    )


# --------------------------------------------------------------------------
# q172 — label-balance audit with inverse-frequency class weights: per
# label, share of the corpus in exact permille plus the reweighting
# factor (uniform-target inverse frequency, in exact permille) a
# training loop would apply.  One vocabulary-sized aggregate + one
# broadcast scalar; imbalance verdict at 2x over/under uniform.
# --------------------------------------------------------------------------


@register(
    "q172_label_balance",
    oracle="""
WITH l AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
t AS (SELECT sum(n) AS n_total, count(*) AS n_labels FROM l)
SELECT l.label,
       CAST(l.n AS BIGINT) AS n,
       CAST(l.n * 1000 // t.n_total AS BIGINT) AS share_permille,
       CAST(t.n_total * 1000 // (t.n_labels * l.n) AS BIGINT)
         AS weight_permille,
       2 * l.n * t.n_labels > 4 * t.n_total
         OR 2 * l.n * t.n_labels < t.n_total AS imbalanced
FROM l CROSS JOIN t
""",
    doc="label-balance audit: per-label share and uniform-target "
    "inverse-frequency class weight in exact integer permille, 2x "
    "over/under-uniform imbalance verdict — one label-keyed aggregate "
    "and one broadcast total; the class-weight table a trainer consumes",
    tags=("llm", "sampling", "audit"),
)
def q172_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select("label")
    l = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = l.agg(
        F.sum("n").alias("n_total"), F.count(F.lit(1)).alias("n_labels")
    )
    return l.crossJoin(F.broadcast(t)).select(
        "label",
        F.col("n").cast("bigint").alias("n"),
        F.expr("n * 1000 div n_total").cast("bigint").alias(
            "share_permille"
        ),
        F.expr("n_total * 1000 div (n_labels * n)")
        .cast("bigint")
        .alias("weight_permille"),
        F.expr(
            "2 * n * n_labels > 4 * n_total OR 2 * n * n_labels < n_total"
        ).alias("imbalanced"),
    )


# --------------------------------------------------------------------------
# q174 — retrieval quality against label ground truth: for 20 probe
# vectors, exact cosine top-10 (the q25 brute baseline), scored against
# the labels a supervised eval would use — per label: probes, hits@10,
# precision in exact permille, probes with at least one relevant hit,
# and the reciprocal-rank mass of the first relevant neighbor in exact
# milli-units (1000 div rank; misses contribute 0).  The eval-harness
# row of an embedding pipeline — corpus broadcast-joined once, label
# attachment is two vocabulary joins, every metric integer-exact.
# --------------------------------------------------------------------------


@register(
    "q174_retrieval_label_eval",
    oracle="""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                  label AS q_label
           FROM embeddings WHERE vec_id < 20),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
             label AS n_label
      FROM embeddings),
topk AS (
  SELECT query_id, q_label, n_label, rnk FROM (
    SELECT q.query_id, q.q_label, c.n_label,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                      c.neighbor_id ASC) AS rnk
    FROM q JOIN c ON q.query_id <> c.neighbor_id
  ) WHERE rnk <= 10
),
per_q AS (
  SELECT query_id, q_label,
         sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS hits,
         min(CASE WHEN n_label = q_label THEN rnk END) AS first_rel
  FROM topk GROUP BY query_id, q_label
)
SELECT q_label AS label,
       CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(hits) AS BIGINT) AS hits_at_10,
       CAST(sum(hits) * 1000 // (count(*) * 10) AS BIGINT)
         AS prec_permille,
       CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_hit,
       CAST(sum(coalesce(1000 // first_rel, 0)) AS BIGINT)
         AS rr_milli_sum
FROM per_q GROUP BY q_label
""",
    doc="retrieval eval vs label ground truth: exact cosine top-10 for 20 "
    "probes (q25 baseline machinery), per-label precision@10 in exact "
    "permille, hit coverage, and first-relevant reciprocal-rank mass in "
    "integer milli-units — the supervised eval row with no floats in "
    "any metric",
    tags=("llm", "similarity", "eval"),
)
def q174_retrieval_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    labels = emb.select("vec_id", "label")
    probes = emb.filter(F.col("vec_id") < 20)
    topk = (
        brute_force_topk(emb, probes, k=10)
        .join(
            F.broadcast(
                labels.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("label").alias("q_label"),
                )
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
    )
    per_q = topk.groupBy("query_id", "q_label").agg(
        F.sum((F.col("n_label") == F.col("q_label")).cast("bigint")).alias(
            "hits"
        ),
        F.min(
            F.when(F.col("n_label") == F.col("q_label"), F.col("rnk"))
        ).alias("first_rel"),
    )
    return per_q.groupBy(F.col("q_label").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum("hits").cast("bigint").alias("hits_at_10"),
        F.expr("sum(hits) * 1000 div (count(*) * 10)")
        .cast("bigint")
        .alias("prec_permille"),
        F.sum(F.col("first_rel").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_with_hit"),
        F.sum(F.coalesce(F.expr("1000 div first_rel"), F.lit(0)))
        .cast("bigint")
        .alias("rr_milli_sum"),
    )


# --------------------------------------------------------------------------
# q176 — max-min fair token budget allocation (exact water-filling): a
# training run has a global token budget (here 40% of the corpus);
# languages with small corpora are fully satisfied, the rest share the
# remaining budget at a common integer water level.  The analytic
# water-level solution — sort demands, prefix sums, one feasibility
# count — in exact integer arithmetic; demands are ONE corpus aggregate,
# everything after runs on the vocabulary-sized demand table.  The
# max-min generalization of the capped mixture plans (q65/q110/q121).
# --------------------------------------------------------------------------


@register(
    "q176_fair_share_allocation",
    oracle="""
WITH d AS (
  SELECT lang,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS demand
  FROM documents GROUP BY lang
),
tot AS (
  SELECT count(*) AS n_langs, sum(demand) AS total,
         2 * sum(demand) // 5 AS budget
  FROM d
),
s AS (
  SELECT lang, demand,
         row_number() OVER (ORDER BY demand, lang) AS i,
         sum(demand) OVER (ORDER BY demand, lang
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS prefix
  FROM d
),
f AS (
  SELECT s.*, tot.n_langs, tot.budget,
         (s.prefix - s.demand) + (tot.n_langs - s.i + 1) * s.demand
           <= tot.budget AS feasible
  FROM s CROSS JOIN tot
),
lvl AS (
  SELECT count(CASE WHEN feasible THEN 1 END) AS k,
         coalesce(max(CASE WHEN feasible THEN prefix END), 0) AS prefix_k,
         any_value(n_langs) AS n_langs,
         any_value(budget) AS budget
  FROM f
),
w AS (
  SELECT CASE WHEN k = n_langs THEN NULL
              ELSE (budget - prefix_k) // (n_langs - k) END AS level,
         k
  FROM lvl
)
SELECT f.lang,
       CAST(f.demand AS BIGINT) AS demand_tokens,
       CAST(CASE WHEN f.feasible THEN f.demand ELSE w.level END
            AS BIGINT) AS alloc_tokens,
       f.feasible AS satisfied,
       CAST(w.level AS BIGINT) AS water_level
FROM f CROSS JOIN w
""",
    doc="max-min fair token allocation under a 40%-of-corpus budget: "
    "exact integer water-filling — sorted demands, prefix sums, "
    "feasibility count, common level (budget - prefix_k) div (n - k); "
    "small languages fully satisfied, the rest capped at the level; one "
    "corpus aggregate, then vocabulary-sized algebra only",
    tags=("llm", "sampling", "mixture"),
)
def q176_fair_share_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("demand")
        )
    )
    d = d.localCheckpoint(eager=True)
    tot = d.agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.sum("demand").alias("total"),
        F.expr("2 * sum(demand) div 5").alias("budget"),
    )
    w_ord = Window.orderBy("demand", "lang")
    s = d.select(
        "lang",
        "demand",
        F.row_number().over(w_ord).alias("i"),
        F.sum("demand")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("prefix"),
    )
    f = s.crossJoin(F.broadcast(tot)).withColumn(
        "feasible",
        (F.col("prefix") - F.col("demand"))
        + (F.col("n_langs") - F.col("i") + 1) * F.col("demand")
        <= F.col("budget"),
    )
    lvl = f.agg(
        F.count(F.when(F.col("feasible"), 1)).alias("k"),
        F.coalesce(
            F.max(F.when(F.col("feasible"), F.col("prefix"))), F.lit(0)
        ).alias("prefix_k"),
        F.min("n_langs").alias("n_langs"),
        F.min("budget").alias("budget"),
    )
    w = lvl.select(
        F.when(F.col("k") == F.col("n_langs"), F.lit(None))
        .otherwise(
            F.expr("(budget - prefix_k) div (n_langs - k)")
        )
        .cast("bigint")
        .alias("level"),
    )
    return f.crossJoin(F.broadcast(w)).select(
        "lang",
        F.col("demand").cast("bigint").alias("demand_tokens"),
        F.when(F.col("feasible"), F.col("demand"))
        .otherwise(F.col("level"))
        .cast("bigint")
        .alias("alloc_tokens"),
        F.col("feasible").alias("satisfied"),
        F.col("level").cast("bigint").alias("water_level"),
    )


# --------------------------------------------------------------------------
# q177 — incremental inverted-index maintenance audit: the stored base
# index (90% of docs) and the new-batch delta index (10%) are built as
# SEPARATE lineages — exactly what an incremental pipeline holds — then
# merged by term-stat addition (full outer join + coalesced sums) and
# gated against a fresh full-corpus recount.  df/cf conservation must be
# exact; the report also prices the delta: terms touched, brand-new
# terms, touch rate.  At 100 TB only the delta lineage and the
# term-keyed merge run per batch — the full recount here is the AUDIT.
# --------------------------------------------------------------------------


@register(
    "q177_index_delta_merge",
    oracle="""
WITH base AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents WHERE doc_id % 10 != 0
  ) GROUP BY term
),
delta AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents WHERE doc_id % 10 = 0
  ) GROUP BY term
),
full_ AS (
  SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term
    FROM documents
  ) GROUP BY term
),
merged AS (
  SELECT coalesce(b.term, d.term) AS term,
         coalesce(b.df, 0) + coalesce(d.df, 0) AS df,
         coalesce(b.cf, 0) + coalesce(d.cf, 0) AS cf,
         d.term IS NOT NULL AS touched,
         b.term IS NULL AND d.term IS NOT NULL AS is_new
  FROM base b FULL OUTER JOIN delta d ON b.term = d.term
)
SELECT CAST((SELECT count(*) FROM base) AS BIGINT) AS n_terms_base,
       CAST((SELECT count(*) FROM delta) AS BIGINT) AS n_terms_delta,
       CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new_terms,
       CAST(sum(CASE WHEN touched THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS touched_permille,
       CAST(count(*) AS BIGINT) AS n_terms_merged,
       count(*) = (SELECT count(*) FROM full_)
         AND NOT EXISTS (
           SELECT 1 FROM merged m JOIN full_ f ON m.term = f.term
           WHERE m.df != f.df OR m.cf != f.cf)
         AS conservation_ok
FROM merged
""",
    doc="incremental index maintenance: base (90%) and delta (10%) "
    "term-stat indexes built as separate lineages, merged by term-keyed "
    "stat addition, gated EXACTLY against a full recount (df/cf "
    "conservation); reports new terms and delta touch rate — the "
    "term-keyed merge is all a production batch runs",
    tags=("llm", "retrieval", "incremental"),
)
def q177_index_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")

    def stats(df: DataFrame) -> DataFrame:
        tok = df.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        return tok.groupBy("term").agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("cf"),
        )

    base = stats(docs.where(F.expr("doc_id % 10 != 0"))).localCheckpoint(
        eager=True
    )
    delta = stats(docs.where(F.expr("doc_id % 10 = 0"))).localCheckpoint(
        eager=True
    )
    full = stats(docs)

    b = base.select(
        F.col("term"), F.col("df").alias("b_df"), F.col("cf").alias("b_cf")
    )
    d = delta.select(
        F.col("term"), F.col("df").alias("d_df"), F.col("cf").alias("d_cf")
    )
    merged = b.join(d, "term", "full_outer").select(
        "term",
        (F.coalesce("b_df", F.lit(0)) + F.coalesce("d_df", F.lit(0))).alias(
            "df"
        ),
        (F.coalesce("b_cf", F.lit(0)) + F.coalesce("d_cf", F.lit(0))).alias(
            "cf"
        ),
        F.col("d_df").isNotNull().alias("touched"),
        (F.col("b_df").isNull() & F.col("d_df").isNotNull()).alias(
            "is_new"
        ),
    )
    mism = (
        merged.join(
            full.select(
                "term",
                F.col("df").alias("f_df"),
                F.col("cf").alias("f_cf"),
            ),
            "term",
            "full_outer",
        )
        .where(
            F.col("df").isNull()
            | F.col("f_df").isNull()
            | (F.col("df") != F.col("f_df"))
            | (F.col("cf") != F.col("f_cf"))
        )
        .agg(F.count(F.lit(1)).alias("n_mismatch"))
    )
    counts = merged.agg(
        F.sum(F.col("is_new").cast("bigint")).alias("n_new_terms"),
        F.expr(
            "sum(CASE WHEN touched THEN 1 ELSE 0 END) * 1000 div count(*)"
        ).alias("touched_permille"),
        F.count(F.lit(1)).alias("n_terms_merged"),
    )
    nb = base.agg(F.count(F.lit(1)).alias("n_terms_base"))
    nd = delta.agg(F.count(F.lit(1)).alias("n_terms_delta"))
    return (
        counts.crossJoin(F.broadcast(nb))
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(mism))
        .select(
            F.col("n_terms_base").cast("bigint").alias("n_terms_base"),
            F.col("n_terms_delta").cast("bigint").alias("n_terms_delta"),
            F.col("n_new_terms").cast("bigint").alias("n_new_terms"),
            F.col("touched_permille")
            .cast("bigint")
            .alias("touched_permille"),
            F.col("n_terms_merged").cast("bigint").alias("n_terms_merged"),
            (F.col("n_mismatch") == 0).alias("conservation_ok"),
        )
    )


# --------------------------------------------------------------------------
# q180 — rendezvous (highest-random-weight) shard-map audit: every doc
# hashes one md5 weight per shard and lands on the argmax — the
# consistent-hashing scheme whose promise is that growing 8 -> 9 shards
# moves ONLY the keys the new shard wins (~1/9 of them), never a global
# reshuffle.  The audit measures both halves of that promise on the real
# corpus: load balance of the 8-shard map and the exact mover fraction
# under expansion, all md5-deterministic integers.  One scan, zero
# shuffles beyond a 9-row aggregate.
# --------------------------------------------------------------------------


@register(
    "q180_rendezvous_shard_map",
    oracle="""
WITH w AS (
  SELECT [CAST(('0x' || substr(md5('0' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('1' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('2' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('3' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('4' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('5' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('6' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('7' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT),
          CAST(('0x' || substr(md5('8' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)]
           AS a
  FROM documents
),
k AS (
  SELECT list_position(a[1:8], list_aggregate(a[1:8], 'max')) AS winner8,
         a[9] > list_aggregate(a[1:8], 'max') AS mover
  FROM w
),
loads AS (SELECT winner8, count(*) AS n FROM k GROUP BY winner8),
bal AS (
  SELECT max(n) AS max_n, min(n) AS min_n, sum(n) AS n_keys FROM loads
)
SELECT CAST(bal.n_keys AS BIGINT) AS n_keys,
       CAST(8 AS BIGINT) AS n_shards,
       CAST(bal.max_n * 1000 // bal.n_keys AS BIGINT)
         AS max_load_permille,
       CAST(bal.min_n * 1000 // bal.n_keys AS BIGINT)
         AS min_load_permille,
       CAST((SELECT sum(CASE WHEN mover THEN 1 ELSE 0 END) FROM k)
            AS BIGINT) AS movers,
       CAST((SELECT sum(CASE WHEN mover THEN 1 ELSE 0 END) FROM k)
            * 1000 // bal.n_keys AS BIGINT) AS movers_permille,
       CAST(1000 // 9 AS BIGINT) AS expected_movers_permille
FROM bal
""",
    doc="rendezvous-hash shard map: per-doc argmax of 8 md5 weights, "
    "balance in exact permille, and the 8->9 expansion mover fraction "
    "(exactly the keys shard 9 wins) vs the 1/9 expectation — the "
    "consistent-hashing audit behind reshuffle-free shard growth; one "
    "scan, vocabulary-sized aggregates",
    tags=("llm", "layout", "sharding"),
)
def q180_rendezvous_shard_map(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import md5_u60

    docs = table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key")
    )
    arr = F.array(*[md5_u60(F.col("key"), seed=j) for j in range(9)])
    k = docs.select(
        F.array_position(
            F.slice(arr, 1, 8), F.array_max(F.slice(arr, 1, 8))
        ).alias("winner8"),
        (
            F.element_at(arr, 9) > F.array_max(F.slice(arr, 1, 8))
        ).alias("mover"),
    )
    k = k.localCheckpoint(eager=True)
    loads = k.groupBy("winner8").agg(F.count(F.lit(1)).alias("n"))
    bal = loads.agg(
        F.max("n").alias("max_n"),
        F.min("n").alias("min_n"),
        F.sum("n").alias("n_keys"),
    )
    mv = k.agg(F.sum(F.col("mover").cast("bigint")).alias("movers"))
    return bal.crossJoin(F.broadcast(mv)).select(
        F.col("n_keys").cast("bigint").alias("n_keys"),
        F.lit(8).cast("bigint").alias("n_shards"),
        F.expr("max_n * 1000 div n_keys")
        .cast("bigint")
        .alias("max_load_permille"),
        F.expr("min_n * 1000 div n_keys")
        .cast("bigint")
        .alias("min_load_permille"),
        F.col("movers").cast("bigint").alias("movers"),
        F.expr("movers * 1000 div n_keys")
        .cast("bigint")
        .alias("movers_permille"),
        F.lit(111).cast("bigint").alias("expected_movers_permille"),
    )


# --------------------------------------------------------------------------
# q183 — intra-document repetition (the Gopher/MassiveText "repetitive
# text" quality signals, Rae et al. 2021 §A1.1): per document, the
# fraction of word-bigram occurrences that are repeats of an
# already-seen bigram, and the share of the single most frequent bigram.
# Both are exact integer permille (counts and integer division), so the
# signal is engine- and partitioning-invariant. One tokenize lineage,
# one (doc_id, bigram) hash aggregate, one doc_id aggregate — all
# map-side-combining, linear in corpus tokens.
# --------------------------------------------------------------------------


@register(
    "q183_intradoc_repetition",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> array_to_string(w[i:i+1], ' '))) AS bg
  FROM w WHERE len(w) >= 2
),
per AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST((sum(c) - count(*)) * 1000 // sum(c) AS BIGINT)
         AS dup_bigram_permille,
       CAST(max(c) * 1000 // sum(c) AS BIGINT) AS top_bigram_permille
FROM per GROUP BY doc_id
""",
    doc="Gopher-style intra-document repetition: per-doc duplicate-bigram "
    "and top-bigram occurrence shares in exact integer permille — the "
    "templated/looping-text quality filter; docs with <2 tokens have no "
    "bigrams and are absent by definition",
    tags=("llm", "text", "quality"),
)
def q183_intradoc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import word_ngrams

    docs = table(spark, sf_dir, "documents")
    bg = docs.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), 2)).alias("bg")
    )
    per = bg.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    return per.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_bigrams"),
        F.expr("(sum(c) - count(*)) * 1000 div sum(c)")
        .cast("bigint")
        .alias("dup_bigram_permille"),
        F.expr("max(c) * 1000 div sum(c)")
        .cast("bigint")
        .alias("top_bigram_permille"),
    )


# --------------------------------------------------------------------------
# q184 — per-document word-entropy in quantized integer algebra. True
# Shannon entropy of the word distribution is H = ln(n) - (Σ c·ln c)/n;
# a float Σ over a group is summation-order-dependent, so each term is
# floored to integer millinats FIRST (the q130 bigram-LM discipline:
# floor(1000·c·ln c) per vocabulary row), making the per-doc sum an
# exact bigint and the final score engine- and partitioning-invariant.
# Low entropy flags repetitive/templated text; the score is monotone in
# true entropy up to the 1e-3 quantization.
# --------------------------------------------------------------------------


@register(
    "q184_word_entropy",
    oracle="""
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
c AS (SELECT doc_id, w, count(*) AS cnt FROM t GROUP BY 1, 2),
a AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(CAST(floor(1000.0 * cnt * ln(cnt)) AS BIGINT)) AS BIGINT)
           AS rep_milli
  FROM c GROUP BY 1
)
SELECT doc_id, n_tokens, vocab,
       CAST(CAST(floor(1000.0 * ln(n_tokens)) AS BIGINT)
            - rep_milli // n_tokens AS BIGINT) AS entropy_milli
FROM a
""",
    doc="per-document word entropy in quantized millinats: "
    "floor(1000 ln n) - (sum of floor(1000 c ln c)) div n — per-term "
    "integer flooring before the group sum keeps the score exact and "
    "order-invariant (no float fold); low values flag repetitive text",
    tags=("llm", "text", "quality"),
)
def q184_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import tokens

    docs = table(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.explode(tokens("text")).alias("w"))
    c = t.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
    a = c.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
        F.sum(F.floor(F.lit(1000.0) * F.col("cnt") * F.log(F.col("cnt"))))
        .cast("bigint")
        .alias("rep_milli"),
    )
    return a.select(
        "doc_id",
        "n_tokens",
        "vocab",
        (
            F.floor(F.lit(1000.0) * F.log(F.col("n_tokens"))).cast("bigint")
            - F.expr("rep_milli div n_tokens")
        )
        .cast("bigint")
        .alias("entropy_milli"),
    )


# --------------------------------------------------------------------------
# q185 — weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
# each row draws u ~ U(0,1] and competes with key ln(u)/w (equivalent to
# ranking by u^(1/w)); the global top-k IS a weighted sample without
# replacement. u is the repo's deterministic md5-uniform (md5_u60 / 2^60),
# so the "random" draw is reproducible across engines, partitionings and
# reruns — the property a training pipeline needs for resumable sampling.
# The top-k is a distributed TakeOrdered (no global sort materialization);
# the rank window runs on the already-limited k rows only.
# --------------------------------------------------------------------------

_Q185_K = 50
_Q185_DEN = float(1 << 60)


@register(
    "q185_weighted_sample",
    oracle=f"""
WITH k AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) + 1) / {_Q185_DEN!r}) / n_chars AS es_key
  FROM documents
)
SELECT doc_id, w, CAST(rnk AS INT) AS rnk FROM (
  SELECT doc_id, w,
         row_number() OVER (ORDER BY es_key DESC, doc_id ASC) AS rnk
  FROM k
) WHERE rnk <= {_Q185_K}
""",
    doc="deterministic weighted sampling without replacement "
    "(Efraimidis-Spirakis keys ln(u)/w on the md5-uniform), weight = "
    "n_chars, top-50 — reproducible across engines/partitionings; "
    "distributed TakeOrdered, rank window only over the k winners",
    tags=("llm", "sampling"),
)
def q185_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import md5_u60

    docs = table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("w"),
        (
            F.log(
                (md5_u60(F.col("doc_id").cast("string")) + F.lit(1))
                / F.lit(_Q185_DEN)
            )
            / F.col("n_chars")
        ).alias("es_key"),
    )
    top = keyed.orderBy(F.col("es_key").desc(), F.col("doc_id").asc()).limit(
        _Q185_K
    )
    # The unpartitioned window is bounded: it ranks the k surviving rows
    # only (post-limit), never the corpus.
    w = Window.orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "w", F.row_number().over(w).cast("int").alias("rnk")
    )


# --------------------------------------------------------------------------
# q186 — label confusability: pairwise cosine between label centroids.
# Cosine is scale-invariant, so the centroid (mean) direction equals the
# direction of the per-label SUM vector — no division, and with each
# component quantized to fixed-point (round(x·1e5), the q47 discipline)
# the sums are exact bigints: order- and engine-invariant. Dot products
# run in DECIMAL(38,0) (bigint·bigint would overflow at ~1e19; decimal
# holds to 1e38, covering ~1e9 vectors/label at this quantization), and
# only the final cosine touches floats (sqrt/div of fixed scalars —
# deterministic). The sums table is n_labels × dim rows (tiny,
# broadcast); the corpus is touched once by the posexplode aggregate.
# --------------------------------------------------------------------------

_Q186_Q = 100_000  # fixed-point quantization


@register(
    "q186_label_centroid_separation",
    oracle=f"""
WITH ex AS (
  SELECT label, CAST(t.i AS BIGINT) AS dim,
         CAST(round(CAST(embedding[t.i + 1] AS DOUBLE) * {_Q186_Q}) AS BIGINT)
           AS q
  FROM embeddings, UNNEST(range(0, len(embedding))) AS t(i)
),
s AS (
  SELECT label, dim, CAST(sum(q) AS DECIMAL(19,0)) AS sv
  FROM ex GROUP BY label, dim
),
norms AS (
  SELECT label, sum(CAST(sv AS DECIMAL(38,0)) * sv) AS nrm
  FROM s GROUP BY label
),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(CAST(a.sv AS DECIMAL(38,0)) * b.sv) AS dot
  FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2
)
SELECT d.label_a, d.label_b,
       CAST(d.dot AS DOUBLE)
         / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
         AS centroid_cosine,
       CAST(d.dot AS DOUBLE)
         / (sqrt(CAST(na.nrm AS DOUBLE)) * sqrt(CAST(nb.nrm AS DOUBLE)))
         >= 0.8 AS confusable
FROM dots d
JOIN norms na ON na.label = d.label_a
JOIN norms nb ON nb.label = d.label_b
""",
    doc="label-confusability audit: pairwise cosine between label centroid "
    "directions via exact fixed-point sum vectors (scale-invariance of "
    "cosine removes the order-dependent float mean); pairs with cosine "
    ">= 0.8 are flagged confusable — the label-quality signal for a "
    "classification corpus",
    tags=("llm", "similarity", "audit"),
)
def q186_label_centroid_separation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "label",
        F.col("dim").cast("bigint").alias("dim"),
        F.round(F.col("x").cast("double") * _Q186_Q)
        .cast("bigint")
        .alias("q"),
    )
    s = ex.groupBy("label", "dim").agg(
        F.sum("q").cast("decimal(19,0)").alias("sv")
    )
    norms = s.groupBy("label").agg(
        F.sum(F.col("sv").cast("decimal(38,0)") * F.col("sv")).alias("nrm")
    )
    a = s.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("sv").alias("sv_a"),
    )
    b = s.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("sv").alias("sv_b"),
    )
    dots = (
        a.join(F.broadcast(b), "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(
                F.col("sv_a").cast("decimal(38,0)") * F.col("sv_b")
            ).alias("dot")
        )
    )
    na = norms.select(
        F.col("label").alias("label_a"), F.col("nrm").alias("nrm_a")
    )
    nb = norms.select(
        F.col("label").alias("label_b"), F.col("nrm").alias("nrm_b")
    )
    cos = (
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("nrm_a").cast("double"))
            * F.sqrt(F.col("nrm_b").cast("double"))
        )
    )
    return (
        dots.join(F.broadcast(na), "label_a")
        .join(F.broadcast(nb), "label_b")
        .select(
            "label_a",
            "label_b",
            cos.alias("centroid_cosine"),
            (cos >= 0.8).alias("confusable"),
        )
    )


# --------------------------------------------------------------------------
# q189 — n-gram novelty against a reference corpus: for each held-out
# document (odd doc_id), the share of its DISTINCT word-3-grams that
# never occur in the reference half (even doc_id) — the curriculum/
# freshness signal dual to q43's contamination overlap (which measures
# how much eval text the train set contains; novelty measures how much
# NEW text a candidate document adds). The reference vocabulary is a
# distinct-gram aggregate joined per candidate gram (left join on the
# gram key — at corpus scale the vocabulary is bucketed, never broadcast
# wholesale); all shares are exact integer permille.
# --------------------------------------------------------------------------


@register(
    "q189_ngram_novelty",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
g AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
         i -> array_to_string(w[i:i+2], ' ')))) AS gram
  FROM w WHERE len(w) >= 3
),
ref AS (SELECT DISTINCT gram FROM g WHERE doc_id % 2 = 0),
ev AS (SELECT doc_id, gram FROM g WHERE doc_id % 2 = 1)
SELECT ev.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN ref.gram IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(sum(CASE WHEN ref.gram IS NULL THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS novelty_permille
FROM ev LEFT JOIN ref ON ev.gram = ref.gram
GROUP BY ev.doc_id
""",
    doc="per-document 3-gram novelty vs the even-doc_id reference half: "
    "distinct grams unseen in the reference vocabulary, exact integer "
    "permille — the data-freshness/curriculum signal (gram-keyed left "
    "join, single tokenize lineage)",
    tags=("llm", "text", "governance"),
)
def q189_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import word_ngrams

    docs = table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias(
            "gram"
        ),
    )
    ref = (
        g.where(F.col("doc_id") % 2 == 0).select("gram").distinct()
        .withColumn("__seen", F.lit(1))
    )
    ev = g.where(F.col("doc_id") % 2 == 1)
    return (
        ev.join(ref, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            F.expr(
                "sum(case when __seen is null then 1 else 0 end) * 1000 "
                "div count(*)"
            )
            .cast("bigint")
            .alias("novelty_permille"),
        )
    )


# --------------------------------------------------------------------------
# q191 — quality-aware canonical selection: inside each near-dup cluster,
# keep the HIGHEST-QUALITY member (longest text, doc_id tiebreak), not
# the arbitrary min-id — the decision a real curation pipeline makes
# after clustering (q46 keeps min-id; this operator upgrades the policy
# and reports what each cluster kept/dropped). Clusters come from the
# same MinHash-LSH pairs + connected-components lineage as q21/q46; the
# representative is a per-cluster argmax via one small-partition window
# (clusters are bounded by the LSH bucket cap, never corpus-sized).
# --------------------------------------------------------------------------


@register(
    "q191_canonical_selection",
    oracle=f"""
WITH RECURSIVE pairs AS (
{_Q21_ORACLE}
),
e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
),
clusters AS (
  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
),
m AS (
  SELECT c.cluster_id, c.id, d.n_chars
  FROM clusters c JOIN documents d ON d.doc_id = c.id
),
ranked AS (
  SELECT cluster_id, id, n_chars,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, id ASC) AS rn
  FROM m
)
SELECT cluster_id,
       CAST(max(CASE WHEN rn = 1 THEN id END) AS BIGINT) AS rep_doc_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS kept_chars
FROM ranked GROUP BY cluster_id
""",
    doc="quality-aware canonical selection per near-dup cluster: keep the "
    "longest member (doc_id tiebreak) instead of min-id, with per-cluster "
    "kept/dropped accounting — MinHash-LSH pairs -> connected components "
    "-> bounded per-cluster argmax window",
    tags=("llm", "dedup", "governance"),
)
def q191_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup(
        docs,
        "doc_id",
        "text",
        num_hashes=_MINHASH_SEEDS,
        shingle_k=_SHINGLE_K,
        num_bands=_MINHASH_BANDS,
        jaccard_threshold=0.5,
    )
    cc = connected_components(pairs)
    m = cc.join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("id").asc()
    )
    ranked = m.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("cluster_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("id")))
        .cast("bigint")
        .alias("rep_doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars")))
        .cast("bigint")
        .alias("kept_chars"),
    )


# --------------------------------------------------------------------------
# q193 — dataset card: the one-table-per-source summary a data release
# ships with (docs, tokens, language share, exact-dup rate, mean length).
# Pure integer algebra over two source-keyed aggregates (token counts ride
# the same lineage as the doc stats; the dup rate reuses the md5 exact-dup
# definition of q20 scoped within source). The "report" capstone over the
# corpus-quality signal family.
# --------------------------------------------------------------------------


@register(
    "q193_dataset_card",
    oracle="""
WITH d AS (
  SELECT source, lang, n_chars,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
         md5(text) AS h
  FROM documents
),
dup AS (
  SELECT source, h, count(*) AS c FROM d GROUP BY 1, 2
),
dupn AS (
  SELECT source, sum(c - 1) AS n_dup FROM dup GROUP BY 1
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.toks) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS en_permille,
       CAST(max(dupn.n_dup) * 1000 // count(*) AS BIGINT)
         AS exact_dup_permille,
       CAST(sum(d.n_chars) // count(*) AS BIGINT) AS mean_chars
FROM d JOIN dupn ON d.source = dupn.source
GROUP BY d.source
""",
    doc="per-source dataset card: docs, tokens, English share, exact-dup "
    "rate (md5 within source), mean chars — all exact integer permille; "
    "the release-notes summary table over two source-keyed aggregates",
    tags=("llm", "governance", "audit"),
)
def q193_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    d = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks"),
        F.md5(F.col("text")).alias("h"),
    )
    dupn = (
        d.groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(F.sum(F.col("c") - 1).alias("n_dup"))
    )
    return (
        d.join(dupn, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("total_tokens"),
            F.expr(
                "sum(case when lang = 'en' then 1 else 0 end) * 1000 "
                "div count(*)"
            )
            .cast("bigint")
            .alias("en_permille"),
            F.expr("max(n_dup) * 1000 div count(*)")
            .cast("bigint")
            .alias("exact_dup_permille"),
            F.expr("sum(n_chars) div count(*)")
            .cast("bigint")
            .alias("mean_chars"),
        )
    )


# --------------------------------------------------------------------------
# q194 — temperature-scaled mixture weights (the multilingual/multi-source
# rebalancing rule p_i ∝ n_i^α with α = 0.5): boosts small sources, damps
# the head. sqrt is IEEE-correctly-rounded (unlike pow), and each source's
# sqrt is quantized to integer micro-units BEFORE the total, so the
# allocation is exact-integer arithmetic end-to-end — order- and
# engine-invariant (the q184/q192 discipline; α beyond 0.5 would need
# exp/ln quantization the same way).
# --------------------------------------------------------------------------


@register(
    "q194_temperature_mixture",
    oracle="""
WITH s AS (
  SELECT source, count(*) AS n,
         CAST(floor(sqrt(count(*)) * 1000000) AS BIGINT) AS sqrt_micro
  FROM documents GROUP BY source
),
t AS (SELECT sum(sqrt_micro) AS tot_sqrt, sum(n) AS tot_n FROM s)
SELECT s.source, CAST(s.n AS BIGINT) AS n_docs,
       CAST(s.sqrt_micro * 1000 // t.tot_sqrt AS BIGINT) AS alloc_permille,
       CAST(s.n * 1000 // t.tot_n AS BIGINT) AS natural_permille,
       s.sqrt_micro * 1000 // t.tot_sqrt > s.n * 1000 // t.tot_n
         AS upsampled
FROM s CROSS JOIN t
""",
    doc="temperature-scaled source mixture (p ~ n^0.5): per-source "
    "allocation vs natural share in exact integer permille, small "
    "sources flagged upsampled — sqrt quantized to integer micro-units "
    "per source before totalling, so the weights are order-invariant",
    tags=("llm", "sampling", "audit"),
)
def q194_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sqrt(F.count(F.lit(1))) * 1000000)
        .cast("bigint")
        .alias("sqrt_micro"),
    )
    t = s.agg(
        F.sum("sqrt_micro").alias("tot_sqrt"), F.sum("n").alias("tot_n")
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.expr("sqrt_micro * 1000 div tot_sqrt")
        .cast("bigint")
        .alias("alloc_permille"),
        F.expr("n * 1000 div tot_n").cast("bigint").alias("natural_permille"),
        F.expr(
            "sqrt_micro * 1000 div tot_sqrt > n * 1000 div tot_n"
        ).alias("upsampled"),
    )


# --------------------------------------------------------------------------
# q195 — activity segmentation over decoded frames (VAD-shaped): maximal
# runs of above-threshold-energy frames per document, extracted with the
# gaps-and-islands pattern (frame_no - row_number is constant within a
# run) over the q97 frame-energy features. Container decode is REAL
# (operators/multimodal.py decode_audio parses RIFF/WAVE PCM); this
# query rides the byte-level path so its oracle stays SQL-expressible.
# The segmentation is integer-exact and keyed per document (windows
# never span documents).
# --------------------------------------------------------------------------

_Q195_THRESHOLD = 10_000


@register(
    "q195_activity_segments",
    oracle=f"""
WITH ascii_docs AS (
  SELECT doc_id, regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS t
  FROM documents
),
chars AS (
  SELECT doc_id, unnest(range(1, length(t)+1)) AS i, t
  FROM ascii_docs
),
frames AS (
  SELECT doc_id, CAST((i-1) // 64 AS INT) AS frame_no,
         CAST(sum((ord(substr(t, i, 1)) - 96)
                  * (ord(substr(t, i, 1)) - 96)) AS BIGINT) AS energy
  FROM chars GROUP BY 1, 2
),
active AS (
  SELECT doc_id, frame_no, energy,
         frame_no - row_number() OVER (PARTITION BY doc_id
                                       ORDER BY frame_no) AS grp
  FROM frames WHERE energy > {_Q195_THRESHOLD}
)
SELECT doc_id,
       CAST(min(frame_no) AS INT) AS seg_start,
       CAST(max(frame_no) AS INT) AS seg_end,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(energy) AS BIGINT) AS seg_energy
FROM active GROUP BY doc_id, grp
""",
    doc="VAD-shaped activity segmentation: maximal runs of frames with "
    "energy > 10000 per document via gaps-and-islands (frame_no minus "
    "doc-keyed row_number), over the deterministic q97 frame energies — "
    "integer-exact segment spans/energies; the RIFF/WAVE container "
    "decode path (decode_audio) is real and separately twinned",
    tags=("llm", "multimodal"),
)
def q195_activity_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.multimodal import (
        attach_audio_payload,
        frame_energies,
    )

    docs = table(spark, sf_dir, "documents")
    frames = frame_energies(attach_audio_payload(docs), frame_size=64)
    active = frames.where(F.col("energy") > _Q195_THRESHOLD)
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    grp = active.withColumn(
        "grp", F.col("frame_no") - F.row_number().over(w)
    )
    return grp.groupBy("doc_id", "grp").agg(
        F.min("frame_no").cast("int").alias("seg_start"),
        F.max("frame_no").cast("int").alias("seg_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum("energy").cast("bigint").alias("seg_energy"),
    ).drop("grp")


# --------------------------------------------------------------------------
# q196 — schema evolution across file generations: an old generation
# written WITHOUT a column, a new generation WITH it, read back together
# under mergeSchema — the steady-state of any long-lived 100 TB table
# (columns get added; historical files are never rewritten). The audit
# proves union semantics: per generation, row counts and the new
# column's null backfill vs populated counts. Generations split the
# documents corpus by doc_id parity so the oracle recomputes the same
# report from the source table alone.
# --------------------------------------------------------------------------


@register(
    "q196_schema_evolution",
    oracle="""
SELECT CAST(doc_id % 2 AS INT) AS generation,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_quality,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)
            AS BIGINT) AS quality_sum
FROM documents
GROUP BY 1
""",
    doc="schema-evolution read: old-generation files lack the new "
    "'quality' column, new-generation files carry it; a mergeSchema scan "
    "unions the schemas with null backfill, audited per generation "
    "(rows, nulls, populated sum) — historical files never rewritten",
    tags=("llm", "sources", "governance"),
)
def q196_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="schema_evo_")
    old = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    new = (
        docs.where(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text", F.col("n_chars").alias("quality"))
    )
    old.write.mode("overwrite").parquet(f"{out}/gen=0")
    new.write.mode("overwrite").parquet(f"{out}/gen=1")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{out}/gen=0", f"{out}/gen=1"
    )
    return merged.groupBy(
        (F.col("doc_id") % 2).cast("int").alias("generation")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("quality").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_quality"),
        F.sum(F.coalesce(F.col("quality"), F.lit(0)))
        .cast("bigint")
        .alias("quality_sum"),
    )


# --------------------------------------------------------------------------
# q201 — group-aware k-fold cross-validation assignment: folds are dealt
# by hashing the SOURCE (not the document), so near-duplicates within a
# source can never straddle folds (the q134 leakage rule, extended from
# one split to k). The audit reports per-fold population and balance;
# the md5 hash makes assignment reproducible across engines and stable
# under corpus growth (a new doc never moves an existing source).
# --------------------------------------------------------------------------

_Q201_K = 5


@register(
    "q201_grouped_kfold",
    oracle=f"""
WITH a AS (
  SELECT source,
         CAST(('0x' || substr(md5(source), 1, 15)) AS BIGINT) % {_Q201_K}
           AS fold,
         count(*) AS n_docs,
         sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS toks
  FROM documents GROUP BY source
),
t AS (SELECT sum(n_docs) AS tot FROM a)
SELECT fold,
       CAST(count(*) AS BIGINT) AS n_sources,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS n_tokens,
       CAST(sum(n_docs) * 1000 // t.tot AS BIGINT) AS share_permille
FROM a CROSS JOIN t
GROUP BY fold, t.tot
""",
    doc=f"group-aware {_Q201_K}-fold CV assignment: folds dealt by "
    "md5(source) so within-source near-dups never straddle folds; "
    "per-fold sources/docs/tokens and share in exact integer permille "
    "— reproducible and growth-stable",
    tags=("llm", "sampling", "governance"),
)
def q201_grouped_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import md5_u60

    docs = table(spark, sf_dir, "documents")
    a = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("bigint")).alias(
            "toks"
        ),
    ).select(
        (md5_u60(F.col("source")) % _Q201_K).alias("fold"),
        "n_docs",
        "toks",
    )
    t = a.agg(F.sum("n_docs").alias("tot"))
    return (
        a.crossJoin(F.broadcast(t))
        .groupBy("fold", "tot")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
            F.expr("sum(n_docs) * 1000 div tot")
            .cast("bigint")
            .alias("share_permille"),
        )
        .drop("tot")
    )


# --------------------------------------------------------------------------
# q205 — dedup-detector evaluation: SimHash's predicted near-dup pairs
# (q23: hamming <= 3) scored against the blocked-Jaccard ground truth
# (q22: 3-gram Jaccard >= 0.3) — precision/recall in exact integer
# permille. The eval harness the dedup family needs before anyone tunes
# thresholds at 100 TB: both pair sets come from their production
# blocking paths (never all-pairs), the comparison is one equi-join on
# the (id_a, id_b) key, and the verdict is a single bounded summary row.
# --------------------------------------------------------------------------


@register(
    "q205_simhash_eval",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
toks AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
                                      i -> array_to_string(w[i:i+2], ' '))) AS toks
  FROM w
),
tok AS (
  SELECT doc_id, unnest(toks) AS tok FROM toks
),
dfreq AS (
  SELECT tok, count(*) AS dfreq FROM tok GROUP BY tok
),
blocked AS (
  SELECT doc_id, tok AS block_tok FROM (
    SELECT t.doc_id, t.tok,
           row_number() OVER (PARTITION BY t.doc_id ORDER BY d.dfreq, t.tok) AS rn
    FROM tok t JOIN dfreq d USING (tok)) WHERE rn <= 3
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM blocked a JOIN blocked b
    ON a.block_tok = b.block_tok AND a.doc_id < b.doc_id
),
truth AS (
  SELECT id_a, id_b FROM (
    SELECT c.id_a, c.id_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / (len(a.toks) + len(b.toks)
                - len(list_intersect(a.toks, b.toks))) AS j
    FROM cands c JOIN toks a ON c.id_a = a.doc_id
                 JOIN toks b ON c.id_b = b.doc_id
  ) WHERE j >= 0.3
),
hvals AS (
  SELECT doc_id, {_simhash_hv} AS hv FROM w
),
fp AS (
  SELECT doc_id, CAST({_simhash_votes} AS BIGINT) AS simhash
  FROM hvals WHERE len(hv) > 0
),
{_SIMHASH_PARAMS_SQL},
{_SIMHASH_BANDED_SQL},
pred AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bb = b.bb AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
j AS (
  SELECT (SELECT count(*) FROM pred) AS n_pred,
         (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM pred JOIN truth USING (id_a, id_b)) AS n_both
)
SELECT CAST(n_pred AS BIGINT) AS n_pred,
       CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(n_both * 1000 // n_pred AS BIGINT) AS precision_permille,
       CAST(n_both * 1000 // n_truth AS BIGINT) AS recall_permille
FROM j
""",
    doc="dedup-detector eval: SimHash hamming<=3 pairs scored against the "
    "blocked 3-gram Jaccard>=0.3 ground truth — precision/recall in "
    "exact integer permille, both sides from their production blocking "
    "paths (no all-pairs anywhere), one pair-keyed equi-join",
    tags=("llm", "dedup", "audit"),
)
def q205_simhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    truth = token_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, n_blocks=3
    ).select("id_a", "id_b")
    pred = simhash_near_dup_pairs_auto(
        docs, "doc_id", "text", n_bits=_SIMHASH_BITS, n_bands=4,
        max_hamming=3,
    ).select("id_a", "id_b")
    both = pred.join(truth, ["id_a", "id_b"])
    counts = (
        pred.agg(F.count(F.lit(1)).alias("n_pred"))
        .crossJoin(
            F.broadcast(truth.agg(F.count(F.lit(1)).alias("n_truth")))
        )
        .crossJoin(
            F.broadcast(both.agg(F.count(F.lit(1)).alias("n_both")))
        )
    )
    return counts.select(
        F.col("n_pred").cast("bigint").alias("n_pred"),
        F.col("n_truth").cast("bigint").alias("n_truth"),
        F.col("n_both").cast("bigint").alias("n_both"),
        F.expr("n_both * 1000 div n_pred")
        .cast("bigint")
        .alias("precision_permille"),
        F.expr("n_both * 1000 div n_truth")
        .cast("bigint")
        .alias("recall_permille"),
    )


# --------------------------------------------------------------------------
# q214 — OLS fit + Pearson correlation in exact integer algebra: both
# reduce to five exact sums (Σx, Σy, Σxy, Σx², Σy² — map-side
# combinable, order-invariant bigints), so the slope can be an exact
# integer division (micro-units) and the correlation a single
# deterministic float expression over exact DECIMAL(38,0) moments —
# never a float accumulation. The corr()/regr_slope() built-ins sum
# doubles in partition order and cannot hash-match across engines; this
# is the engine's sanctioned rewrite, here fitting token count against
# character count over the corpus (a near-linear relation).
# --------------------------------------------------------------------------


@register(
    "q214_ols_corr_exact",
    oracle="""
WITH v AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
  FROM v
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
            // CAST(n * sxx - sx * sx AS HUGEINT) AS BIGINT)
         AS slope_micro,
       CAST(CAST((sy * (n * sxx - sx * sx)
                  - sx * (n * sxy - sx * sy)) * 1000 AS HUGEINT)
            // CAST(n * (n * sxx - sx * sx) AS HUGEINT) AS BIGINT)
         AS intercept_milli,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
FROM m
""",
    doc="OLS slope/intercept and Pearson r from five exact integer "
    "moments (order-invariant, map-side combinable): slope in exact "
    "integer micro-units, intercept in milli-units, r as one "
    "deterministic float expression over exact moments — the sanctioned "
    "rewrite of the float-accumulating corr()/regr_slope() built-ins; "
    "fits tokens ~ chars over the corpus",
    tags=("llm", "aggregate", "audit"),
)
def q214_ols_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    v = docs.select(
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("y"),
    )
    dec38 = "decimal(38,0)"
    m = v.agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        # cast BEFORE multiply: value-product sums accumulate in
        # decimal, not bigint (bigint overflows at corpus scale)
        F.sum(F.col("x").cast(dec38) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec38) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec38) * F.col("y")).alias("syy"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
            "as bigint)"
        ).alias("slope_micro"),
        F.expr(
            "cast((sy * (n * sxx - sx * sx) - sx * (n * sxy - sx * sy)) "
            "* 1000 div (n * (n * sxx - sx * sx)) as bigint)"
        ).alias("intercept_milli"),
        (
            F.expr("cast(n * sxy - sx * sy as double)")
            / (
                F.sqrt(F.expr("cast(n * sxx - sx * sx as double)"))
                * F.sqrt(F.expr("cast(n * syy - sy * sy as double)"))
            )
        ).alias("pearson_r"),
    )


# --------------------------------------------------------------------------
# q216 — token-weighted median document length: the median character
# count where each document counts with its TOKEN weight (half the
# corpus's tokens live in docs at least this long — the length
# statistic that matters for packing/batching, where doc-count medians
# mislead). Exact weighted quantile by distributed rank selection
# (operators/quantiles.py:weighted_quantile_exact): integer ceil
# threshold, range cells + broadcast offset layer, no group buffer.
# --------------------------------------------------------------------------


@register(
    "q216_weighted_median_length",
    oracle="""
WITH t AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS v,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w
  FROM documents
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS W FROM t),
cum AS (
  SELECT v, sum(w) OVER (ORDER BY v, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cw
  FROM t
)
SELECT CAST(min(v) AS BIGINT) AS quantile_value,
       CAST(tot.W AS BIGINT) AS total_weight,
       CAST((tot.W + 1) // 2 AS BIGINT) AS threshold
FROM cum, tot
WHERE cw >= (tot.W + 1) // 2
GROUP BY tot.W
""",
    doc="token-weighted median document length (smallest length whose "
    "cumulative token weight reaches ceil(W/2)) — exact integer "
    "threshold, distributed rank selection with range cells and a "
    "broadcast offset layer, no value buffer",
    tags=("llm", "aggregate", "scale"),
)
def q216_weighted_median_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.quantiles import (
        weighted_quantile_exact,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("v"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("w"),
    )
    out = weighted_quantile_exact(docs, "v", "w", 1, 2, "doc_id")
    return out.select(
        F.col("quantile_value").cast("bigint").alias("quantile_value"),
        "total_weight",
        "threshold",
    )


# --------------------------------------------------------------------------
# q223 — exact ROC AUC of an embedding-derived score against the fixture
# labels, via the distributed Mann-Whitney U rank statistic
# (operators/ranking.py): per-score tie groups, a range-partitioned
# exclusive prefix sum of negatives (never a global single-task window),
# and pure integer algebra to parts-per-million. The "classifier" score
# is a deterministic ordered fold of the first 8 embedding dims — the
# point is the exact rank machinery, which any real model score plugs
# into unchanged.
# --------------------------------------------------------------------------

def _q223_score():
    """Spark twin of _Q223_SCORE_SQL — the deterministic ordered fold of
    the first 8 embedding dims used by every eval query (q223/q232-era
    normalization, q244 AP, q260 Brier, q261 gains). One definition so
    the Spark side can never de-synchronize from the SQL oracle."""
    return F.round(
        sum(
            (F.element_at("embedding", i).cast("double") for i in range(2, 9)),
            start=F.element_at("embedding", 1).cast("double"),
        )
        * F.lit(1000000.0)
    ).cast("bigint")


_Q223_SCORE_SQL = (
    "CAST(round(("
    + " + ".join(f"CAST(embedding[{i}] AS DOUBLE)" for i in range(1, 9))
    + ") * 1000000) AS BIGINT)"
)


@register(
    "q223_roc_auc_exact",
    oracle=f"""
WITH s AS (
  SELECT {_Q223_SCORE_SQL} AS score,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
),
g AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS np
  FROM s GROUP BY score
),
c AS (
  SELECT np, n - np AS nn,
         coalesce(sum(n - np) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS neg_below
  FROM g
)
SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       CAST(sum(nn) AS BIGINT) AS n_neg,
       CAST(2 * sum(np * neg_below) + sum(np * nn) AS BIGINT) AS u2,
       CAST((2 * sum(np * neg_below) + sum(np * nn)) * 500000
            // (sum(np) * sum(nn)) AS BIGINT) AS auc_ppm
FROM c
""",
    doc="exact tie-corrected ROC AUC via the distributed Mann-Whitney U "
    "rank statistic — per-score tie groups, range-partitioned exclusive "
    "prefix sum (no single-task global window), integer ppm output",
    tags=("llm", "eval", "ranking"),
)
def q223_roc_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        roc_auc_exact,
    )

    emb = table(spark, sf_dir, "embeddings")
    score = _q223_score()
    scored = emb.select(
        score.alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("is_pos"),
    )
    return roc_auc_exact(scored, "score", "is_pos")


# --------------------------------------------------------------------------
# q224 — confusion-matrix threshold sweep for the same embedding-derived
# score: TP/FP/FN/TN plus precision/recall in integer permille at five
# fixed thresholds, computed in ONE conditional-aggregate corpus pass
# (4 x 5 unrolled CASE sums — never a thresholds x corpus explode) and
# unpivoted with stack(). Degenerate cells (no predicted / no actual
# positives) surface NULL ratios instead of tripping ANSI div-by-zero.
# --------------------------------------------------------------------------

_Q224_THRESHOLDS = (-1500000, -500000, 0, 500000, 1500000)


@register(
    "q224_threshold_sweep",
    oracle=f"""
WITH s AS (
  SELECT {_Q223_SCORE_SQL} AS score,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
),
t(threshold) AS (VALUES {", ".join(f"({t})" for t in _Q224_THRESHOLDS)}),
m AS (
  SELECT t.threshold,
         CAST(sum(CASE WHEN s.score >= t.threshold AND s.pos = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN s.score >= t.threshold AND s.pos = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN s.score < t.threshold AND s.pos = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN s.score < t.threshold AND s.pos = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM s, t GROUP BY t.threshold
)
SELECT CAST(threshold AS BIGINT) AS threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0 THEN CAST(tp * 1000 // (tp + fp) AS BIGINT)
       END AS precision_permille,
       CASE WHEN tp + fn > 0 THEN CAST(tp * 1000 // (tp + fn) AS BIGINT)
       END AS recall_permille
FROM m
""",
    doc="confusion matrix + precision/recall permille at five thresholds "
    "in one unrolled conditional-aggregate pass over the corpus, "
    "stack()-unpivoted; NULL ratios on degenerate cells",
    tags=("llm", "eval"),
)
def q224_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    score = _q223_score()
    s = emb.select(
        score.alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("pos"),
    )
    aggs = []
    for i, t in enumerate(_Q224_THRESHOLDS):
        ge = F.col("score") >= F.lit(t)
        pos = F.col("pos") == 1
        aggs += [
            F.sum(F.when(ge & pos, 1).otherwise(0)).cast("bigint").alias(f"tp{i}"),
            F.sum(F.when(ge & ~pos, 1).otherwise(0)).cast("bigint").alias(f"fp{i}"),
            F.sum(F.when(~ge & pos, 1).otherwise(0)).cast("bigint").alias(f"fn{i}"),
            F.sum(F.when(~ge & ~pos, 1).otherwise(0)).cast("bigint").alias(f"tn{i}"),
        ]
    wide = s.agg(*aggs)
    stack_args = ", ".join(
        f"CAST({t} AS BIGINT), tp{i}, fp{i}, fn{i}, tn{i}"
        for i, t in enumerate(_Q224_THRESHOLDS)
    )
    tall = wide.select(
        F.expr(
            f"stack({len(_Q224_THRESHOLDS)}, {stack_args}) "
            "AS (threshold, tp, fp, fn, tn)"
        )
    )
    return tall.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.expr("tp * 1000 div (tp + fp)"),
        )
        .cast("bigint")
        .alias("precision_permille"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.expr("tp * 1000 div (tp + fn)"),
        )
        .cast("bigint")
        .alias("recall_permille"),
    )


# --------------------------------------------------------------------------
# q232 — corpus rank normalization: each document's quality proxy
# (n_chars) mapped to its exact corpus-wide rank permille (ties share
# the permille of their group's lower boundary), then the per-source
# decile histogram — the "is this source's quality distribution shifted
# vs the corpus" drift view, and the feature transform that makes raw
# scores comparable across corpus versions. The rank layer is per-score
# groups + the range-partitioned exclusive prefix (operators/ranking.py)
# over DISTINCT scores — never a corpus-sized global window; docs get
# their permille back via an equi-join on score.
# --------------------------------------------------------------------------


@register(
    "q232_rank_normalized_quality",
    oracle="""
WITH g AS (
  SELECT n_chars AS score, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY n_chars
),
c AS (
  SELECT score, n,
         coalesce(sum(n) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_below,
         (SELECT sum(n) FROM g) AS n_total
  FROM g
),
r AS (
  SELECT score, CAST(n_below * 1000 // n_total AS BIGINT) AS permille
  FROM c
)
SELECT d.source,
       CAST(r.permille // 100 AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN r ON r.score = d.n_chars
GROUP BY d.source, CAST(r.permille // 100 AS BIGINT)
""",
    doc="corpus-wide rank-permille normalization of the n_chars quality "
    "proxy (ties share their group boundary permille) rolled into a "
    "per-source decile histogram — per-score groups + range-partitioned "
    "exclusive prefix, permille joined back on the score key",
    tags=("llm", "quality", "ranking"),
)
def q232_rank_normalized_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        exclusive_prefix_sums,
    )

    docs = table(spark, sf_dir, "documents").select("source", "n_chars")
    g = docs.groupBy(F.col("n_chars").alias("score")).agg(
        F.count("*").cast("bigint").alias("n")
    )
    pre = exclusive_prefix_sums(g, ["score"], ["n"])
    tot = g.agg(F.sum("n").alias("n_total"))
    r = pre.crossJoin(F.broadcast(tot)).select(
        "score",
        F.expr("n_before * 1000 div n_total").cast("bigint").alias(
            "permille"
        ),
    )
    return (
        docs.join(r, docs.n_chars == r.score)
        .groupBy(
            "source",
            F.expr("permille div 100").cast("bigint").alias("decile"),
        )
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# q233 — exact tie-corrected Spearman rank correlation between document
# character count and token count: the monotonicity check Pearson (q214)
# can't give. Tie-averaged ranks are carried DOUBLED so they stay exact
# integers (2r = 2·below + n + 1 per distinct-value group), each rank
# table is a distinct-value groupBy + range-partitioned prefix layer
# (never a global row sort), and rho is Pearson over the doubled ranks —
# five exact DECIMAL(38,0) moments, one closed-form float expression
# (operators/rankstats.py:spearman_rho, the q214 determinism discipline).
# --------------------------------------------------------------------------


@register(
    "q233_spearman_chars_tokens",
    oracle="""
WITH v AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS y
  FROM documents
  WHERE n_chars IS NOT NULL AND text IS NOT NULL
),
gx AS (SELECT x, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY x),
rx AS (
  SELECT x,
         2 * coalesce(sum(n) OVER (ORDER BY x
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) + n + 1 AS r2
  FROM gx
),
gy AS (SELECT y, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY y),
ry AS (
  SELECT y,
         2 * coalesce(sum(n) OVER (ORDER BY y
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) + n + 1 AS r2
  FROM gy
),
r AS (
  SELECT CAST(rx.r2 AS BIGINT) AS a, CAST(ry.r2 AS BIGINT) AS b
  FROM v JOIN rx ON v.x = rx.x JOIN ry ON v.y = ry.y
),
m AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(a * b) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(a * a) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(b * b) AS DECIMAL(38,0)) AS syy
  FROM r
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(sxy - n * (n + 1) * (n + 1) AS DOUBLE)
         / (sqrt(CAST(sxx - n * (n + 1) * (n + 1) AS DOUBLE))
            * sqrt(CAST(syy - n * (n + 1) * (n + 1) AS DOUBLE))) AS rho
FROM m
""",
    doc="exact tie-corrected Spearman rank correlation of chars vs "
    "tokens: doubled tie-averaged ranks (exact integers) from distinct-"
    "value groups + range-partitioned prefix layers, rho from four "
    "exact DECIMAL(38,0) moments via the centered identity (doubled "
    "ranks sum to exactly n(n+1)) in one deterministic float "
    "expression, exact to ~2.9e12 rows",
    tags=("llm", "aggregate", "ranking"),
)
def q233_spearman_chars_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        spearman_rho,
    )

    docs = table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("y"),
    )
    return spearman_rho(docs, "x", "y")


# --------------------------------------------------------------------------
# q238 — mutual information between document language and source, in
# integer micro-nats: how much knowing the source tells you about the
# language (the dataset-mixing diagnostic — high MI means sources are
# language-siloed, near-zero means well mixed). The contingency table is
# one groupBy (bounded by |langs|×|sources|), marginals broadcast back,
# and each cell's n_xy·ln(n_xy·N / (n_x·n_y)) is floor-quantized to an
# integer BEFORE the sum (the repo's quantize-then-integer-sum pattern),
# so the result is engine-portable with no float accumulation.
# --------------------------------------------------------------------------


@register(
    "q238_mutual_info_lang_source",
    oracle="""
WITH c AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS nxy
  FROM documents GROUP BY lang, source
),
mt AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM c),
mlg AS (SELECT lang, CAST(sum(nxy) AS BIGINT) AS nx FROM c GROUP BY lang),
msr AS (SELECT source, CAST(sum(nxy) AS BIGINT) AS ny FROM c GROUP BY source),
cells AS (
  SELECT c.nxy,
         CAST(floor(1000000.0 * c.nxy
                    * ln((CAST(c.nxy AS DOUBLE) * mt.n)
                         / (CAST(mlg.nx AS DOUBLE) * msr.ny))) AS BIGINT)
           AS contrib
  FROM c JOIN mlg USING (lang) JOIN msr USING (source), mt
)
SELECT CAST(mt.n AS BIGINT) AS n,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cells,
       CAST((SELECT sum(contrib) FROM cells) // mt.n AS BIGINT)
         AS mi_micro_nats
FROM mt
""",
    doc="mutual information between lang and source in integer micro-"
    "nats: bounded contingency groupBy, broadcast marginals, per-cell "
    "floor-quantized n_xy*ln(n_xy*N/(n_x*n_y)) summed as integers, "
    "exact integer normalization by N",
    tags=("llm", "aggregate", "audit"),
)
def q238_mutual_info_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(
        F.count("*").cast("bigint").alias("nxy")
    )
    mt = c.agg(F.sum("nxy").cast("bigint").alias("n"))
    mlg = c.groupBy("lang").agg(F.sum("nxy").cast("bigint").alias("nx"))
    msr = c.groupBy("source").agg(F.sum("nxy").cast("bigint").alias("ny"))
    cells = (
        c.join(F.broadcast(mlg), "lang")
        .join(F.broadcast(msr), "source")
        .crossJoin(F.broadcast(mt))
        .select(
            F.floor(
                F.lit(1_000_000.0)
                * F.col("nxy")
                * F.log(
                    (F.col("nxy").cast("double") * F.col("n"))
                    / (F.col("nx").cast("double") * F.col("ny"))
                )
            )
            .cast("bigint")
            .alias("contrib")
        )
    )
    n_cells = c.agg(F.count("*").cast("bigint").alias("n_cells"))
    tot = cells.agg(F.sum("contrib").alias("s"))
    return (
        mt.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "n_cells",
            F.expr("cast(s div n as bigint)").alias("mi_micro_nats"),
        )
    )


# --------------------------------------------------------------------------
# q244 — exact average precision (area under the step PR curve) for the
# q223 embedding-derived score against the same high-label positives:
# the eval that matters when positives are rare and ROC AUC flatters.
# Thresholds sweep distinct scores descending; each threshold's recall
# gain times its precision accumulates as an exact integer floor
# (10⁹·np·tp div n per score cell — no float, no libm), with the
# ≥-cumulative counts from ascending range-partitioned prefix sums plus
# broadcast totals (operators/ranking.py:average_precision_exact).
# --------------------------------------------------------------------------


@register(
    "q244_average_precision_exact",
    oracle=f"""
WITH s AS (
  SELECT {_Q223_SCORE_SQL} AS score,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
),
g AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS np
  FROM s GROUP BY score
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(np) AS BIGINT) AS pt
      FROM g),
c AS (
  SELECT np,
         t.nt - coalesce(sum(n) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_ge,
         t.pt - coalesce(sum(np) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tp_ge,
         t.pt, t.nt
  FROM g, t
)
SELECT CAST(pt AS BIGINT) AS n_pos,
       CAST(nt AS BIGINT) AS n_total,
       CAST(sum(CAST(1000000000 AS HUGEINT) * np * tp_ge // n_ge)
            // (1000 * pt) AS BIGINT) AS ap_ppm
FROM c WHERE np > 0
GROUP BY pt, nt
""",
    doc="exact average precision (step PR-curve area) in ppm for the "
    "embedding-derived score vs high-label positives: per-score-cell "
    "integer floors (no float, no libm), >=-cumulative counts from "
    "range-partitioned prefix sums + broadcast totals",
    tags=("llm", "eval", "ranking"),
)
def q244_average_precision_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        average_precision_exact,
    )

    emb = table(spark, sf_dir, "embeddings")
    score = _q223_score()
    scored = emb.select(
        score.alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("is_pos"),
    )
    return average_precision_exact(scored, "score", "is_pos")


# --------------------------------------------------------------------------
# q245 — Zipf-law fit of the corpus vocabulary: OLS slope of ln(freq)
# against ln(rank) over terms with frequency ≥ 2 (the Zipf exponent is
# −slope; natural text sits near 1). Ranks come from the descending
# frequency order with a deterministic term tie-break, assigned via the
# range-partitioned prefix layer over the VOCABULARY table (never the
# token stream); both logs are floor-quantized to integer micro-units
# per term before the five exact DECIMAL(38,0) moments, so the slope is
# one exact integer division (the q214 discipline). The corpus-health
# audit ("is this text distribution natural?") at any scale.
# --------------------------------------------------------------------------


@register(
    "q245_zipf_fit",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
v AS (
  SELECT term, CAST(count(*) AS BIGINT) AS freq
  FROM tok WHERE term <> '' GROUP BY term
),
f AS (SELECT term, freq FROM v WHERE freq >= 2),
r AS (
  SELECT freq,
         row_number() OVER (ORDER BY freq DESC, term) AS rnk
  FROM f
),
q AS (
  SELECT CAST(floor(1000000.0 * ln(CAST(rnk AS DOUBLE))) AS BIGINT) AS x,
         CAST(floor(1000000.0 * ln(CAST(freq AS DOUBLE))) AS BIGINT) AS y
  FROM r
),
m AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx
  FROM q
)
SELECT CAST(n AS BIGINT) AS n_terms,
       CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
            // CAST(n * sxx - sx * sx AS HUGEINT) AS BIGINT)
         AS slope_micro
FROM m
""",
    doc="Zipf-law fit: OLS slope (exact integer micro-units) of "
    "ln(freq) vs ln(rank) over the frequency->=2 vocabulary — ranks from "
    "the range-partitioned prefix layer on (freq desc, term), logs "
    "floor-quantized per term before exact DECIMAL(38,0) moments",
    tags=("llm", "aggregate", "audit", "ranking"),
)
def q245_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        exclusive_prefix_sums,
    )

    docs = table(spark, sf_dir, "documents")
    v = (
        docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .where(F.col("freq") >= 2)
    )
    ranked = exclusive_prefix_sums(
        v.select(
            (-F.col("freq")).alias("negf"),
            "term",
            "freq",
            F.lit(1).cast("bigint").alias("one"),
        ),
        ["negf", "term"],
        ["one"],
    ).select(
        "freq", (F.col("one_before") + 1).alias("rnk")
    )
    q = ranked.select(
        F.floor(F.lit(1_000_000.0) * F.log(F.col("rnk").cast("double")))
        .cast("bigint")
        .alias("x"),
        F.floor(F.lit(1_000_000.0) * F.log(F.col("freq").cast("double")))
        .cast("bigint")
        .alias("y"),
    )
    dec38 = "decimal(38,0)"
    m = q.agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec38).alias("sxx"),
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.expr(
            "cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
            "as bigint)"
        ).alias("slope_micro"),
    )


# --------------------------------------------------------------------------
# q252 — template-prefix audit: the top shared 16-character document
# prefixes with doc counts and floor-permille corpus share — the cheap
# detector for boilerplate templates and scraped-page chrome that
# near-dup passes at higher shingle sizes can miss. One groupBy on the
# prefix (vocabulary-sized output), top-10 via Spark's per-partition
# TakeOrdered merge (never a global sort of the prefix table),
# deterministic (count desc, prefix) tie-break.
# --------------------------------------------------------------------------


@register(
    "q252_template_prefixes",
    oracle="""
WITH p AS (
  SELECT substr(text, 1, 16) AS prefix, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents WHERE len(text) >= 16
  GROUP BY 1
),
t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents
      WHERE len(text) >= 16)
SELECT p.prefix, p.n_docs,
       CAST(p.n_docs * 1000 // t.total AS BIGINT) AS share_permille
FROM p, t
ORDER BY p.n_docs DESC, p.prefix
LIMIT 10
""",
    doc="top-10 shared 16-char document prefixes with counts and floor-"
    "permille share: vocabulary-sized prefix groupBy, TakeOrdered top-k "
    "(no global sort), deterministic tie-break — the boilerplate/"
    "template detector",
    tags=("llm", "dedup", "audit", "topk"),
)
def q252_template_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").where(
        F.length("text") >= 16
    )
    p = docs.groupBy(
        F.substring("text", 1, 16).alias("prefix")
    ).agg(F.count("*").cast("bigint").alias("n_docs"))
    t = docs.agg(F.count("*").cast("bigint").alias("total"))
    return (
        p.crossJoin(F.broadcast(t))
        .select(
            "prefix",
            "n_docs",
            F.expr("cast(n_docs * 1000 div total as bigint)").alias(
                "share_permille"
            ),
        )
        .orderBy(F.col("n_docs").desc(), "prefix")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q256 — KMV (k-minimum-values) sketches of per-source vocabularies and
# the sketch-estimated Jaccard between the two largest sources: the
# mergeable-alternative to HLL that also supports set-resemblance. Each
# source keeps its k=128 smallest md5 token hashes (per-source window
# rank on the bounded vocabulary table — deterministic, no RNG);
# distinct-count estimate (k−1)·2¹²⁸-free: hashes map to the integer
# line via the first 15 hex digits, estimate = (k−1)·M div h_k. The
# Jaccard estimate is |KMV_k(A∪B) ∩ A ∩ B| / k on the union's k
# smallest — all exact integer arithmetic over md5 values, so the
# sketch is reproducible on any engine.
# --------------------------------------------------------------------------

_KMV_K = 128
_KMV_M = 16**15  # hash domain size for the 15-hex-digit prefix


@register(
    "q256_kmv_source_jaccard",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT source, unnest(string_split(text, ' ')) AS term
  FROM documents
),
h AS (
  SELECT source, term,
         ('0x' || substr(md5(term), 1, 15))::BIGINT AS hv
  FROM tok WHERE term <> ''
),
top2 AS (
  SELECT source FROM h GROUP BY source
  ORDER BY count(*) DESC, source LIMIT 2
),
r AS (
  SELECT h.source, h.hv,
         row_number() OVER (PARTITION BY h.source ORDER BY h.hv) AS rk
  FROM h JOIN top2 USING (source)
),
kmv AS (SELECT source, hv, rk FROM r WHERE rk <= {_KMV_K}),
est AS (
  SELECT source,
         CASE WHEN count(*) < {_KMV_K} THEN CAST(count(*) AS BIGINT)
              ELSE CAST(({_KMV_K} - 1) * CAST({_KMV_M} AS HUGEINT)
                        // max(CASE WHEN rk = {_KMV_K} THEN hv END)
                        AS BIGINT)
         END AS est_distinct
  FROM kmv GROUP BY source
),
u AS (
  SELECT hv, count(*) AS nsrc FROM kmv GROUP BY hv
),
uk AS (
  SELECT hv, nsrc, row_number() OVER (ORDER BY hv) AS rk FROM u
),
j AS (
  -- denominator = |union sketch| = min(k, |A ∪ B sketch hashes|): a
  -- small vocabulary fills fewer than k union slots and dividing by
  -- the constant k would understate Jaccard (small-set degeneration,
  -- same as est_distinct's)
  SELECT CASE WHEN count(*) > 0
              THEN CAST(sum(CASE WHEN nsrc = 2 THEN 1 ELSE 0 END) * 1000
                        // count(*) AS BIGINT)
         END AS jaccard_permille
  FROM uk WHERE rk <= {_KMV_K}
)
SELECT (SELECT min(source) FROM top2) AS source_a,
       (SELECT max(source) FROM top2) AS source_b,
       (SELECT min(est_distinct) FROM est) AS est_distinct_min,
       (SELECT max(est_distinct) FROM est) AS est_distinct_max,
       j.jaccard_permille
FROM j
""",
    doc="KMV k=128 sketches of the two largest sources' vocabularies "
    "(smallest md5 hashes, deterministic): distinct-count estimates "
    "(k-1)*M div h_k and the union-sketch Jaccard estimate in exact "
    "integer arithmetic — the mergeable set-resemblance sketch",
    tags=("llm", "sketch", "dedup", "aggregate"),
)
def q256_kmv_source_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .where(F.col("term") != "")
        .distinct()
    )
    h = tok.select(
        "source",
        F.conv(F.substring(F.md5("term"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    top2 = F.broadcast(
        h.groupBy("source")
        .agg(F.count("*").alias("nv"))
        .orderBy(F.col("nv").desc(), "source")
        .limit(2)
        .select("source")
    )
    hs = h.join(top2, "source")
    wr = Window.partitionBy("source").orderBy("hv")
    kmv = hs.withColumn("rk", F.row_number().over(wr)).where(
        F.col("rk") <= _KMV_K
    )
    # a source whose whole vocabulary fits under k has an EXACT count —
    # the standard KMV small-set degeneration (estimator needs the k-th
    # minimum, which does not exist)
    est = kmv.groupBy("source").agg(
        F.expr(
            f"case when count(*) < {_KMV_K} then cast(count(*) as bigint) "
            f"else cast(({_KMV_K} - 1) * cast({_KMV_M} as decimal(38,0)) "
            f"div max(case when rk = {_KMV_K} then hv end) as bigint) end"
        ).alias("est_distinct")
    )
    u = kmv.groupBy("hv").agg(F.count("*").alias("nsrc"))
    uk = u.withColumn(
        "rk", F.row_number().over(Window.orderBy("hv"))
    ).where(F.col("rk") <= _KMV_K)
    # denominator = |union sketch| (min(k, distinct union hashes)), not
    # the constant k: mirrors est_distinct's small-set degeneration so
    # tiny vocabularies don't understate Jaccard
    j = uk.agg(
        F.expr(
            "case when count(*) > 0 then "
            "cast(sum(case when nsrc = 2 then 1 else 0 end) * 1000 "
            "div count(*) as bigint) end"
        ).alias("jaccard_permille")
    )
    names = top2.agg(
        F.min("source").alias("source_a"), F.max("source").alias("source_b")
    )
    ests = est.agg(
        F.min("est_distinct").alias("est_distinct_min"),
        F.max("est_distinct").alias("est_distinct_max"),
    )
    return (
        names.crossJoin(F.broadcast(ests))
        .crossJoin(F.broadcast(j))
        .select(
            "source_a",
            "source_b",
            "est_distinct_min",
            "est_distinct_max",
            "jaccard_permille",
        )
    )


# --------------------------------------------------------------------------
# q257 — per-dimension embedding statistics: mean and variance of every
# embedding coordinate in quantized micro-units from exact integer
# moments (values quantized to 1e-6 BEFORE summation — never a float
# accumulation), plus each dimension's share of total variance in
# permille. The anisotropy audit behind whitening/matryoshka decisions:
# posexplode fans the corpus to (dim, value) pairs once, the moment
# table is |dims| rows, and everything downstream rides it.
# --------------------------------------------------------------------------


@register(
    "q257_embedding_dim_stats",
    oracle="""
WITH v AS (
  SELECT g.dim,
         CAST(round(CAST(g.val AS DOUBLE) * 1000000) AS BIGINT) AS q
  FROM (
    SELECT unnest(embedding) AS val,
           generate_subscripts(embedding, 1) - 1 AS dim
    FROM embeddings g
  ) g
),
m AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS s,
         CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS ss
  FROM v GROUP BY dim
),
st AS (
  SELECT CAST(dim AS BIGINT) AS dim,
         CAST(s // n AS BIGINT) AS mean_micro,
         CAST((ss - CAST(s AS HUGEINT) * s // n) // n // 1000000 AS BIGINT)
           AS var_micro
  FROM m
),
t AS (SELECT CAST(sum(var_micro) AS BIGINT) AS tv FROM st)
SELECT st.dim, st.mean_micro, st.var_micro,
       CAST(st.var_micro * 1000 // t.tv AS BIGINT) AS var_share_permille
FROM st, t
""",
    doc="per-dimension embedding mean/variance in micro-units from exact "
    "integer moments (1e-6 quantization before summation) with each "
    "dim's variance share in permille — the anisotropy audit; one "
    "posexplode fan-out, |dims|-row moment table",
    tags=("llm", "similarity", "aggregate", "audit"),
)
def q257_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.posexplode("embedding").alias("dim", "val")
    ).select(
        "dim",
        F.round(F.col("val").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("q"),
    )
    m = v.groupBy("dim").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("s"),
        F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("ss"),
    )
    st = m.select(
        F.col("dim").cast("bigint").alias("dim"),
        F.expr("cast(s div n as bigint)").alias("mean_micro"),
        F.expr(
            "cast((ss - cast(s as decimal(38,0)) * s div n) div n "
            "div 1000000 as bigint)"
        ).alias("var_micro"),
    )
    t = st.agg(F.sum("var_micro").cast("bigint").alias("tv"))
    return st.crossJoin(F.broadcast(t)).select(
        "dim",
        "mean_micro",
        "var_micro",
        F.expr("cast(var_micro * 1000 div tv as bigint)").alias(
            "var_share_permille"
        ),
    )


# --------------------------------------------------------------------------
# q260 — Brier score of the rank-calibrated classifier: the q223 score
# maps to an empirical probability via its corpus rank permille (the
# q232 normalization — distinct-score groups + prefix layer, never a
# global row sort), and the Brier score against the high-label outcome
# is Σ (perm − 1000·y)² in EXACT integer arithmetic, reported in
# micro-units by one final division. The proper-scoring-rule companion
# to AUC (q223) and AP (q244): rank calibration makes it measure pure
# discrimination loss, engine-portable with no float anywhere.
# --------------------------------------------------------------------------


@register(
    "q260_brier_rank_calibrated",
    oracle=f"""
WITH s AS (
  SELECT {_Q223_SCORE_SQL} AS score,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
),
g AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS np
  FROM s GROUP BY score
),
c AS (
  SELECT score, n, np,
         coalesce(sum(n) OVER (ORDER BY score
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM g
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g),
p AS (
  SELECT np, n - np AS nn,
         CAST(below * 1000 // t.nt AS BIGINT) AS perm
  FROM c, t
)
SELECT t.nt AS n_total,
       CAST((SELECT sum(np * (perm - 1000) * (perm - 1000)
                        + (nn) * perm * perm) FROM p)
            // t.nt AS BIGINT) AS brier_micro
FROM t
""",
    doc="Brier score (micro-units) of the rank-calibrated q223 score: "
    "probability = corpus rank permille from distinct-score groups + "
    "prefix layer, score = sum (perm - 1000y)^2 in exact integers, one "
    "final division — proper-scoring-rule companion to AUC/AP",
    tags=("llm", "eval", "ranking"),
)
def q260_brier_rank_calibrated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        exclusive_prefix_sums,
    )

    emb = table(spark, sf_dir, "embeddings")
    score = _q223_score()
    s = emb.select(
        score.alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("pos"),
    )
    g = s.groupBy("score").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    pre = exclusive_prefix_sums(g, ["score"], ["n"])
    t = g.agg(F.sum("n").cast("bigint").alias("nt"))
    p = pre.crossJoin(F.broadcast(t)).select(
        "np",
        (F.col("n") - F.col("np")).alias("nn"),
        F.expr("cast(n_before * 1000 div nt as bigint)").alias("perm"),
        "nt",
    )
    return p.groupBy("nt").agg(
        F.expr(
            "cast(sum(np * (perm - 1000) * (perm - 1000) "
            "+ nn * perm * perm) div nt as bigint)"
        ).alias("brier_micro")
    ).select(F.col("nt").alias("n_total"), "brier_micro")


# --------------------------------------------------------------------------
# q261 — decile gains table for the q223 score: rows bucket into score
# deciles by GLOBAL RANK (distinct-score groups + prefix layer — tie
# groups share a decile, never a single-task ntile), and each decile
# reports its positive count, rate in permille, and the cumulative
# lift over the base rate in permille scanning from the top decile
# down. The classic model-targeting readout ("mail the top 2 deciles"),
# exact integers end to end.
# --------------------------------------------------------------------------


@register(
    "q261_decile_gains",
    oracle=f"""
WITH s AS (
  SELECT {_Q223_SCORE_SQL} AS score,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
  FROM embeddings
),
g AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS np
  FROM s GROUP BY score
),
c AS (
  SELECT score, n, np,
         coalesce(sum(n) OVER (ORDER BY score DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS above
  FROM g
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(np) AS BIGINT) AS pt
      FROM g),
d AS (
  SELECT CAST(above * 10 // t.nt AS BIGINT) AS decile, n, np
  FROM c, t
),
dd AS (
  SELECT decile, CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(sum(np) AS BIGINT) AS n_pos
  FROM d GROUP BY decile
),
cum AS (
  SELECT decile, n_rows, n_pos,
         sum(n_rows) OVER (ORDER BY decile
                           ROWS UNBOUNDED PRECEDING) AS cn,
         sum(n_pos) OVER (ORDER BY decile
                          ROWS UNBOUNDED PRECEDING) AS cp
  FROM dd
)
SELECT cum.decile, cum.n_rows, cum.n_pos,
       CAST(cum.n_pos * 1000 // cum.n_rows AS BIGINT) AS rate_permille,
       CAST(CAST(cum.cp AS HUGEINT) * t.nt * 1000
            // (CAST(cum.cn AS HUGEINT) * t.pt) AS BIGINT)
         AS cum_lift_permille
FROM cum, t
""",
    doc="decile gains table for the q223 score: deciles by global rank "
    "from distinct-score groups + prefix layer (tie groups share a "
    "decile, no single-task ntile), per-decile positive rate and "
    "cumulative lift over base rate in exact integer permille, top "
    "decile first",
    tags=("llm", "eval", "ranking", "aggregate"),
)
def q261_decile_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        exclusive_prefix_sums,
    )

    emb = table(spark, sf_dir, "embeddings")
    score = _q223_score()
    s = emb.select(
        score.alias("score"),
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("pos"),
    )
    g = s.groupBy("score").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    # rank from the TOP: prefix over descending score via negated key
    pre = exclusive_prefix_sums(
        g.select((-F.col("score")).alias("negs"), "n", "np"),
        ["negs"],
        ["n"],
    )
    t = g.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("np").cast("bigint").alias("pt"),
    )
    d = pre.crossJoin(F.broadcast(t)).select(
        F.expr("cast(n_before * 10 div nt as bigint)").alias("decile"),
        "n",
        "np",
    )
    dd = d.groupBy("decile").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.sum("np").cast("bigint").alias("n_pos"),
    )
    cum = exclusive_prefix_sums(dd, ["decile"], ["n_rows", "n_pos"]).select(
        "decile",
        "n_rows",
        "n_pos",
        (F.col("n_rows_before") + F.col("n_rows")).alias("cn"),
        (F.col("n_pos_before") + F.col("n_pos")).alias("cp"),
    )
    return cum.crossJoin(F.broadcast(t)).select(
        "decile",
        "n_rows",
        "n_pos",
        F.expr("cast(n_pos * 1000 div n_rows as bigint)").alias(
            "rate_permille"
        ),
        F.expr(
            "cast(cast(cp as decimal(38,0)) * nt * 1000 "
            "div (cast(cn as decimal(38,0)) * pt) as bigint)"
        ).alias("cum_lift_permille"),
    )


# --------------------------------------------------------------------------
# q267 — split-free conformal prediction interval for the q214 linear
# fit (tokens ~ chars): the 90% conformal radius is the ⌈(n+1)·0.9⌉-th
# smallest absolute residual — an EXACT order statistic, selected by
# the distinct-value + prefix-layer rank machinery (never a global row
# sort) over integer micro-unit residuals from the exact-moment OLS
# line (slope_micro/intercept_milli are exact integers, so residuals
# are too). The coverage audit closes the loop: the share of rows
# inside ±q̂ in integer permille. The "calibrated error bars at scale"
# primitive for any regression-backed budget estimate.
# --------------------------------------------------------------------------


@register(
    "q267_conformal_interval",
    oracle="""
WITH v AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx
  FROM v
),
fit AS (
  SELECT CAST(n AS BIGINT) AS n,
         CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
              // CAST(n * sxx - sx * sx AS HUGEINT) AS BIGINT) AS slope_u,
         CAST(CAST((sy * (n * sxx - sx * sx)
                    - sx * (n * sxy - sx * sy)) * 1000 AS HUGEINT)
              // CAST(n * (n * sxx - sx * sx) AS HUGEINT) AS BIGINT)
           AS icept_m
  FROM m
),
res AS (
  SELECT abs(v.y * 1000000 - (fit.slope_u * v.x + fit.icept_m * 1000))
           AS r, fit.n
  FROM v, fit
),
k AS (SELECT n, (n + 1) * 9 // 10 + CASE WHEN (n + 1) * 9 % 10 > 0
                                         THEN 1 ELSE 0 END AS kk
      FROM fit),
g AS (SELECT r, CAST(count(*) AS BIGINT) AS c FROM res GROUP BY r),
cum AS (
  SELECT r, sum(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS cw
  FROM g
),
qhat AS (
  SELECT CAST(min(r) AS BIGINT) AS qhat_micro
  FROM cum, k WHERE cw >= least(k.kk, k.n)
)
SELECT k.n, qhat.qhat_micro,
       CAST((SELECT count(*) FROM res, qhat
             WHERE res.r <= qhat.qhat_micro) * 1000 // k.n AS BIGINT)
         AS coverage_permille
FROM k, qhat
""",
    doc="90% conformal prediction radius for the exact-moment OLS fit: "
    "ceil((n+1)*0.9)-th smallest integer micro-residual by distinct-"
    "value + prefix-layer rank selection (no global row sort), with "
    "the coverage share in integer permille",
    tags=("llm", "eval", "ranking", "aggregate"),
)
def q267_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        exclusive_prefix_sums,
    )

    docs = table(spark, sf_dir, "documents")
    v = docs.select(
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("y"),
    )
    dec38 = "decimal(38,0)"
    m = v.agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec38).alias("sxx"),
    )
    fit = m.select(
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
            "as bigint)"
        ).alias("slope_u"),
        F.expr(
            "cast((sy * (n * sxx - sx * sx) - sx * (n * sxy - sx * sy)) "
            "* 1000 div (n * (n * sxx - sx * sx)) as bigint)"
        ).alias("icept_m"),
    )
    # fit (one row, from a full corpus fold) feeds three branches and
    # res feeds two — persist both so the corpus folds run once
    fit = fit.persist()
    res = v.crossJoin(F.broadcast(fit)).select(
        F.abs(
            F.col("y") * 1_000_000
            - (F.col("slope_u") * F.col("x") + F.col("icept_m") * 1000)
        ).alias("r"),
        "n",
    ).persist()
    k = fit.select(
        "n",
        F.expr(
            "(n + 1) * 9 div 10 "
            "+ case when (n + 1) * 9 % 10 > 0 then 1 else 0 end"
        ).alias("kk"),
    )
    g = res.groupBy("r").agg(F.count("*").cast("bigint").alias("c"))
    cum = exclusive_prefix_sums(g, ["r"], ["c"]).select(
        "r", (F.col("c_before") + F.col("c")).alias("cw")
    )
    qhat = (
        cum.crossJoin(F.broadcast(k))
        .where(F.col("cw") >= F.least(F.col("kk"), F.col("n")))
        .agg(F.min("r").cast("bigint").alias("qhat_micro"))
    )
    cov = (
        res.crossJoin(F.broadcast(qhat))
        .where(F.col("r") <= F.col("qhat_micro"))
        .agg(F.count("*").alias("nc"))
    )
    return (
        k.crossJoin(F.broadcast(qhat))
        .crossJoin(F.broadcast(cov))
        .select(
            "n",
            "qhat_micro",
            F.expr("cast(nc * 1000 div n as bigint)").alias(
                "coverage_permille"
            ),
        )
    )


# --------------------------------------------------------------------------
# q268 — exact covariance matrix of the leading 8 embedding dimensions:
# the PCA/whitening precursor q257's per-dim variance doesn't give.
# All 8 coordinates quantize to integer micro-units as COLUMNS of one
# projection (no explode), and the 8 first moments + 36 upper-triangle
# second moments fold in ONE corpus pass of exact DECIMAL(38,0) sums;
# covariance comes out long-format (dim_i ≤ dim_j, cov_micro) by exact
# integer algebra n·Σxy − Σx·Σy over n². Output is the fixed 36-row
# triangle at any corpus size.
# --------------------------------------------------------------------------

_COV_DIMS = 8


@register(
    "q268_embedding_covariance",
    oracle=f"""
WITH v AS (
  SELECT {', '.join(
      f"CAST(round(CAST(embedding[{i}] AS DOUBLE) * 1000000) AS BIGINT)"
      f" AS q{i}" for i in range(1, _COV_DIMS + 1))}
  FROM embeddings
),
m AS (
  SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
         {', '.join(
      f"CAST(sum(q{i}) AS DECIMAL(38,0)) AS s{i}"
      for i in range(1, _COV_DIMS + 1))},
         {', '.join(
      f"CAST(sum(CAST(q{i} AS HUGEINT) * q{j}) AS DECIMAL(38,0))"
      f" AS p{i}_{j}"
      for i in range(1, _COV_DIMS + 1)
      for j in range(i, _COV_DIMS + 1))}
  FROM v
)
SELECT CAST(dim_i AS BIGINT) AS dim_i, CAST(dim_j AS BIGINT) AS dim_j,
       CAST(cov AS BIGINT) AS cov_micro
FROM (
  {' UNION ALL '.join(
      f"SELECT {i} AS dim_i, {j} AS dim_j, "
      f"CAST((n * p{i}_{j} - s{i} * s{j}) AS HUGEINT)"
      f" // CAST(n * n AS HUGEINT) // 1000000 AS cov FROM m"
      for i in range(1, _COV_DIMS + 1)
      for j in range(i, _COV_DIMS + 1))}
)
""",
    doc="exact covariance matrix (upper triangle, micro-units) of the "
    "leading 8 embedding dims: one corpus pass of 8 first + 36 second "
    "DECIMAL(38,0) moments over micro-quantized coordinates, integer "
    "algebra (n*Sxy - Sx*Sy) div n^2 — the PCA/whitening precursor, "
    "fixed 36-row output",
    tags=("llm", "similarity", "aggregate"),
)
def q268_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = emb.select(
        *[
            F.round(
                F.element_at("embedding", i).cast("double") * 1_000_000
            )
            .cast("bigint")
            .alias(f"q{i}")
            for i in range(1, _COV_DIMS + 1)
        ]
    )
    dec38 = "decimal(38,0)"
    aggs = [F.count(F.lit(1)).cast(dec38).alias("n")]
    aggs += [
        F.sum(f"q{i}").cast(dec38).alias(f"s{i}")
        for i in range(1, _COV_DIMS + 1)
    ]
    aggs += [
        F.sum(F.col(f"q{i}").cast(dec38) * F.col(f"q{j}")).alias(f"p{i}_{j}")
        for i in range(1, _COV_DIMS + 1)
        for j in range(i, _COV_DIMS + 1)
    ]
    m = v.agg(*aggs)
    # one stack() projection over the single moment row — the 36 cells
    # share ONE aggregation pass (a 36-way union would recompute it)
    pairs = [
        (i, j)
        for i in range(1, _COV_DIMS + 1)
        for j in range(i, _COV_DIMS + 1)
    ]
    stack_args = ", ".join(
        f"cast({i} as bigint), cast({j} as bigint), "
        f"cast((n * p{i}_{j} - s{i} * s{j}) div (n * n) div 1000000 "
        f"as bigint)"
        for i, j in pairs
    )
    return m.selectExpr(
        f"stack({len(pairs)}, {stack_args}) "
        "as (dim_i, dim_j, cov_micro)"
    )


# --------------------------------------------------------------------------
# q279 — per-language conformal prediction radii: each language gets its
# OWN exact-moment OLS fit (tokens ~ chars) and its own 90% conformal
# radius — the calibrated-error-bars-per-slice readout (a single global
# radius over-covers easy languages and under-covers hard ones). Group
# moments fold in one pass; per-group residual rank selection rides the
# grouped prefix operator (k = ⌈(n_g+1)·0.9⌉ per group, no per-group
# buffer); per-group coverage closes the loop in integer permille.
# --------------------------------------------------------------------------


@register(
    "q279_conformal_by_lang",
    oracle="""
WITH v AS (
  SELECT lang, CAST(n_chars AS BIGINT) AS x,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS y
  FROM documents
),
m AS (
  SELECT lang,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx
  FROM v GROUP BY lang
),
fit AS (
  SELECT lang, CAST(n AS BIGINT) AS n,
         CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
              // CAST(n * sxx - sx * sx AS HUGEINT) AS BIGINT) AS slope_u,
         CAST(CAST((sy * (n * sxx - sx * sx)
                    - sx * (n * sxy - sx * sy)) * 1000 AS HUGEINT)
              // CAST(n * (n * sxx - sx * sx) AS HUGEINT) AS BIGINT)
           AS icept_m
  FROM m
  WHERE CAST(n * sxx - sx * sx AS HUGEINT) > 0
),
res AS (
  SELECT v.lang,
         abs(v.y * 1000000 - (fit.slope_u * v.x + fit.icept_m * 1000))
           AS r, fit.n
  FROM v JOIN fit ON fit.lang = v.lang
),
k AS (
  SELECT lang, n,
         (n + 1) * 9 // 10
           + CASE WHEN (n + 1) * 9 % 10 > 0 THEN 1 ELSE 0 END AS kk
  FROM fit
),
g AS (SELECT lang, r, CAST(count(*) AS BIGINT) AS c
      FROM res GROUP BY lang, r),
cum AS (
  SELECT lang, r,
         sum(c) OVER (PARTITION BY lang ORDER BY r
                      ROWS UNBOUNDED PRECEDING) AS cw
  FROM g
),
qhat AS (
  SELECT cum.lang, CAST(min(cum.r) AS BIGINT) AS qhat_micro
  FROM cum JOIN k USING (lang)
  WHERE cum.cw >= least(k.kk, k.n)
  GROUP BY cum.lang
)
SELECT k.lang, k.n, qhat.qhat_micro,
       CAST((SELECT count(*) FROM res
             WHERE res.lang = k.lang AND res.r <= qhat.qhat_micro) * 1000
            // k.n AS BIGINT) AS coverage_permille
FROM k JOIN qhat USING (lang)
""",
    doc="per-language conformal prediction radii: per-group exact-moment "
    "OLS fits, ceil((n_g+1)*0.9)-th smallest integer micro-residual per "
    "group via the grouped prefix rank layer (no per-group buffer), "
    "per-group coverage in integer permille",
    tags=("llm", "eval", "ranking", "aggregate"),
)
def q279_conformal_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        grouped_prefix_sums,
    )

    docs = table(spark, sf_dir, "documents")
    v = docs.select(
        "lang",
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("y"),
    )
    dec38 = "decimal(38,0)"
    m = v.groupBy("lang").agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec38).alias("sxx"),
    )
    fit = m.where(F.expr("n * sxx - sx * sx") > 0).select(
        "lang",
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "cast((n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
            "as bigint)"
        ).alias("slope_u"),
        F.expr(
            "cast((sy * (n * sxx - sx * sx) - sx * (n * sxy - sx * sy)) "
            "* 1000 div (n * (n * sxx - sx * sx)) as bigint)"
        ).alias("icept_m"),
    ).persist()
    res = v.join(F.broadcast(fit), "lang").select(
        "lang",
        F.abs(
            F.col("y") * 1_000_000
            - (F.col("slope_u") * F.col("x") + F.col("icept_m") * 1000)
        ).alias("r"),
    ).persist()
    k = fit.select(
        "lang",
        "n",
        F.expr(
            "(n + 1) * 9 div 10 "
            "+ case when (n + 1) * 9 % 10 > 0 then 1 else 0 end"
        ).alias("kk"),
    )
    g = res.groupBy("lang", "r").agg(
        F.count("*").cast("bigint").alias("c")
    )
    cum = grouped_prefix_sums(g, ["lang"], ["r"], ["c"]).select(
        "lang", "r", (F.col("c_before") + F.col("c")).alias("cw")
    )
    qhat = (
        cum.join(F.broadcast(k), "lang")
        .where(F.col("cw") >= F.least(F.col("kk"), F.col("n")))
        .groupBy("lang")
        .agg(F.min("r").cast("bigint").alias("qhat_micro"))
    )
    cov = (
        res.join(F.broadcast(qhat), "lang")
        .where(F.col("r") <= F.col("qhat_micro"))
        .groupBy("lang")
        .agg(F.count("*").alias("nc"))
    )
    return (
        k.join(qhat, "lang")
        .join(cov, "lang")
        .select(
            "lang",
            "n",
            "qhat_micro",
            F.expr("cast(nc * 1000 div n as bigint)").alias(
                "coverage_permille"
            ),
        )
    )
