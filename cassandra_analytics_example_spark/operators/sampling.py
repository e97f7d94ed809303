"""Deterministic dataset splitting for training pipelines.

A train/val/test split over a 100 TB corpus must be (a) reproducible across
engines, runs, and repartitionings — so no RNG, no ``rand()``, no
``randomSplit`` (partition-order dependent) — and (b) computable row-locally
with no shuffle. Hash-bucketing the document id does both: the split label
is a pure projection, the same doc lands in the same split everywhere, and
adding data never moves existing docs between splits.

The hash is the engine-portable md5 convention shared with the dedup
operators (``functions.text.md5_u60``), so the assignment is
DuckDB-oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.text import md5_u60
from cassandra_analytics_example_spark.session import pin_small

#: bucket granularity: weights are resolved to integer counts out of 10_000
#: (0.01% resolution) so thresholds are exact integers in every engine.
SPLIT_BUCKETS = 10_000


def split_column(
    id_col: str | Column,
    weights: Sequence[tuple[str, float]],
    salt: str = "",
) -> Column:
    """Split-label column from hash-bucketing ``id_col``.

    ``weights`` is an ORDERED (name, weight) list; weights are normalized
    and mapped to contiguous integer bucket ranges out of ``SPLIT_BUCKETS``.
    ``salt`` derives independent assignments from the same ids (e.g. a new
    holdout that is uncorrelated with the previous one).

    SQL twin: ``CASE WHEN CAST(('0x' || substr(md5(salt || CAST(id AS
    VARCHAR)), 1, 15)) AS BIGINT) % 10000 < t1 THEN n1 WHEN ... END``.
    """
    if not weights:
        raise ValueError("weights must be a non-empty (name, weight) list")
    total = float(sum(w for _, w in weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    bucket = md5_u60(F.concat(F.lit(salt), c.cast("string"))) % SPLIT_BUCKETS

    # cumulative integer thresholds; the last split absorbs rounding slack
    # so every bucket is assigned.
    acc = 0.0
    thresholds: list[tuple[str, int]] = []
    for name, w in weights:
        acc += w / total
        thresholds.append((name, round(acc * SPLIT_BUCKETS)))
    out = F.lit(thresholds[-1][0])
    for name, t in reversed(thresholds[:-1]):
        out = F.when(bucket < t, F.lit(name)).otherwise(out)
    return out


def stratified_downsample(
    df: DataFrame,
    strat_col: str,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministically downsample every stratum to the size of the
    smallest one (class balancing) — no RNG, no per-stratum sort.

    The keep rule is the real-number comparison ``bucket / SPLIT_BUCKETS <
    min_count / count`` evaluated as the exact integer cross-product
    ``bucket * count < min_count * SPLIT_BUCKETS`` — no division anywhere,
    so the decision is bit-identical in every engine at any corpus size
    (products stay far inside bigint range). Stratum counts come from a
    tiny groupBy broadcast back onto the corpus; the keep decision is then
    a pure projection — the corpus itself is never shuffled or ordered.
    Expected kept size tracks the minimum class exactly in distribution;
    membership is stable under repartitioning.
    """
    counts = pin_small(
        df.groupBy(strat_col).agg(F.count(F.lit(1)).alias("__cnt"))
    )
    mn = counts.agg(F.min("__cnt").alias("__mn"))
    rates = counts.crossJoin(F.broadcast(mn))
    bucket = (
        md5_u60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        % SPLIT_BUCKETS
    )
    return (
        df.join(F.broadcast(rates), strat_col)
        .filter(bucket * F.col("__cnt") < F.col("__mn") * SPLIT_BUCKETS)
        .drop("__cnt", "__mn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.9),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split assignment column (default
    train/val/test 90/5/5). Pure projection — no shuffle, no RNG, stable
    under repartitioning and incremental corpus growth."""
    return df.withColumn(split_col, split_column(id_col, list(weights), salt))


def weighted_upsample(
    df: DataFrame,
    strat_col: str,
    id_col: str,
    *,
    cap: float = 3.0,
    salt: str = "",
    copy_col: str = "copy_idx",
) -> DataFrame:
    """Deterministically upsample every stratum toward the size of the
    LARGEST one by row replication (the temperature-style rebalancing used
    for low-resource languages in multilingual training mixes), capped at
    ``cap``× so tiny strata don't explode into near-identical repeats.

    Each row's copy count is the stratum's replication factor
    ``min(cap, max_count / count)`` resolved in EXACT integer arithmetic
    out of ``SPLIT_BUCKETS``: ``tk = min(cap·B, ⌊max·B / n⌋)`` gives
    ``⌊tk/B⌋`` whole copies plus one more iff ``md5(id) % B < tk % B`` —
    the fractional part lands on a deterministic hash-selected subset, so
    the realized stratum size tracks the target exactly in distribution
    and the decision is bit-identical in every engine.

    Plan shape: tiny stratum-count aggregate → broadcast back onto the
    corpus → ``explode(sequence(1, n))`` fan-out projection. The corpus is
    never shuffled; output size is bounded by ``cap × |df|``.
    """
    if cap < 1.0:
        raise ValueError("cap must be >= 1.0 (upsampling never drops rows)")
    cap_tk = int(round(cap * SPLIT_BUCKETS))
    counts = pin_small(
        df.groupBy(strat_col).agg(F.count(F.lit(1)).alias("__cnt"))
    )
    mx = counts.agg(F.max("__cnt").alias("__mx"))
    rates = counts.crossJoin(F.broadcast(mx)).select(
        strat_col,
        F.least(
            F.lit(cap_tk).cast("bigint"),
            F.floor(F.col("__mx") * SPLIT_BUCKETS / F.col("__cnt")).cast(
                "bigint"
            ),
        ).alias("__tk"),
    )
    bucket = (
        md5_u60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
        % SPLIT_BUCKETS
    )
    n_copies = (
        F.col("__tk").cast("bigint") / SPLIT_BUCKETS
    ).cast("bigint") + F.when(
        bucket < F.col("__tk") % SPLIT_BUCKETS, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.join(F.broadcast(rates), strat_col)
        .withColumn("__n", n_copies)
        .withColumn(copy_col, F.explode(F.sequence(F.lit(1), F.col("__n"))))
        .drop("__tk", "__n")
    )


#: hash domain for weighted keep-decisions: 30 bits keeps every
#: cross-multiplied comparison term well inside DECIMAL(38,0) at any
#: corpus scale (2^30 x a 100 TB corpus's total weight ~ 1e23 << 1e38).
WEIGHT_HASH_BITS = 1 << 30


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    target: int,
) -> DataFrame:
    """Deterministic weighted Bernoulli sample of EXPECTED size ``target``:
    row i survives with probability ``min(1, w_i * target / Σw)`` — the
    data-mixing primitive (sample proportional to quality score, domain
    weight, dedup multiplicity) behind LLM corpus composition.

    The keep-decision is ``hash(id) * Σw < w_i * target * 2^30`` with
    ``hash`` uniform on [0, 2^30): a pure integer cross-multiplication —
    no division, no floats — evaluated in DECIMAL(38,0), so the decision
    is bit-identical in every engine and STABLE under corpus growth for
    fixed Σw-scaling (the q36/q42 hash-sampling discipline extended to
    non-uniform rates). One broadcast one-row total; zero shuffle on the
    corpus; rows with ``w_i * target >= Σw`` are always kept (the min(1)
    branch is implicit in the inequality)."""
    h = (md5_u60(F.col(id_col).cast("string")) % WEIGHT_HASH_BITS).cast(
        "decimal(38,0)"
    )
    total = pin_small(
        df.agg(
            F.sum(F.col(weight_col).cast("bigint"))
            .cast("decimal(38,0)")
            .alias("__tw")
        )
    )
    keep = h * F.col("__tw") < (
        F.col(weight_col).cast("decimal(38,0)")
        * F.lit(target).cast("decimal(38,0)")
        * F.lit(WEIGHT_HASH_BITS).cast("decimal(38,0)")
    )
    return df.crossJoin(F.broadcast(total)).filter(keep).drop("__tw")


def mixture_plan(
    df: DataFrame,
    group_col: str,
    size_col: str,
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """Temperature-style data-mixture planning: given per-group available
    volume (e.g. chars/tokens per language), allocate a total training
    budget of ``budget_num/budget_den`` of the corpus across groups
    proportionally to sqrt(available) — the T=2 rebalancing that upweights
    low-resource groups relative to raw proportions — and emit per-group
    sampling rates.

    ALL-INTEGER pipeline so the plan is bit-identical across engines (the
    oracle-parity requirement): available sums are exact BIGINTs,
    weight = floor(sqrt(available)) (IEEE sqrt is correctly rounded, so
    floor agrees everywhere), and every quotient is an INTEGRAL division
    (Spark ``DIV`` == DuckDB ``//`` on non-negative values) over
    DECIMAL(38,0) cross-products — fractional DECIMAL division is NOT used
    anywhere because engines disagree on its result scale/rounding. The
    rate surfaces as parts-per-million; a group's quota never exceeds what
    it has (rate_ppm <= 1e6).

    One groupBy on ``group_col`` (map-side combined); the group-level plan
    is a handful of rows — at 100 TB the output is a broadcast table the
    actual sampling pass (``weighted_sample`` / ``hash_split``) consumes.
    """
    avail = df.groupBy(group_col).agg(
        F.sum(F.col(size_col).cast("bigint")).alias("available")
    )
    w = avail.withColumn(
        "weight", F.floor(F.sqrt(F.col("available"))).cast("bigint")
    )
    totals = w.agg(
        F.sum("available").alias("__tot_avail"),
        F.sum("weight").alias("__tot_w"),
    )
    dec = "decimal(38,0)"
    # budget = tot_avail * num DIV den; quota = weight * budget DIV tot_w.
    # Integral division under ANSI mode RAISES on a zero divisor, so the
    # degenerate groups are handled explicitly: an all-empty corpus
    # (tot_w = 0) plans zero quotas, and an empty group (available = 0,
    # weight = 0) gets rate 0 rather than dividing by its own size.
    quota = F.expr(
        f"CASE WHEN __tot_w = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(CAST(weight AS {dec}) * "
        f"(CAST(__tot_avail AS {dec}) * {budget_num} DIV {budget_den}) "
        f"DIV CAST(__tot_w AS {dec}) AS BIGINT) END"
    )
    planned = w.crossJoin(F.broadcast(totals)).select(
        F.col(group_col),
        "available",
        "weight",
        F.least(F.col("available"), quota).alias("quota"),
    )
    return planned.withColumn(
        "rate_ppm",
        F.expr(
            f"CASE WHEN available = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST(CAST(quota AS {dec}) * 1000000 DIV available AS BIGINT) "
            f"END"
        ),
    )


def hash_ring_negatives(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 3,
    n_buckets: int = 16,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: place every
    row on a hash ring (md5 of its id), split the ring into ``n_buckets``
    arcs, and give each anchor its next ``k`` ring successors WITHIN its arc
    (wrapping around the arc) as negatives.

    The hash scrambles any correlation between id order and content, so
    ring successors are content-random yet fully reproducible — same
    negatives across runs, engines, and repartitionings, with no RNG state
    to manage. Everything is bucket-local: the ranking window partitions by
    bucket (at 100 TB, raise ``n_buckets`` so each arc fits an executor —
    the window never sees more than one arc), the per-bucket size table is
    ``n_buckets`` rows (broadcast), and successor lookup is an equi-join on
    (bucket, rank). No global sort, no cross product, no driver collect.

    Returns (anchor_id, neg_rank ∈ 1..k, neg_id); rows whose wraparound
    successor is themselves (arcs with ≤ k members) are excluded rather
    than emitting a self-negative.
    """
    from pyspark.sql import Window

    h = md5_u60(F.concat(F.lit("neg:"), F.col(id_col).cast("string")))
    ring = df.select(F.col(id_col), h.alias("h")).withColumn(
        "bucket", F.col("h") % n_buckets
    )
    w = Window.partitionBy("bucket").orderBy("h", id_col)
    ranked = ring.withColumn("r", F.row_number().over(w))
    counts = ranked.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    cand = (
        ranked.join(F.broadcast(counts), "bucket")
        .select(
            F.col(id_col).alias("anchor_id"),
            "bucket",
            "r",
            "n",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
        )
        .select(
            "anchor_id",
            "bucket",
            "neg_rank",
            (((F.col("r") - 1 + F.col("neg_rank")) % F.col("n")) + 1).alias(
                "tr"
            ),
        )
    )
    succ = ranked.select(
        F.col(id_col).alias("neg_id"), "bucket", F.col("r").alias("tr")
    )
    return (
        cand.join(succ, ["bucket", "tr"])
        .filter(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "neg_rank", "neg_id")
    )


_BUDGET_BANDS = 64
_BUDGET_SUBSPLITS = 4


def token_budget_selection(
    df: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
    budget_tokens: int = 2000,
) -> DataFrame:
    """Quality-greedy corpus selection under a per-language token budget:
    take documents in (approximately) descending quality order until each
    language's cumulative token count reaches ``budget_tokens`` — the
    curation step that turns "we can afford X tokens of French" into a
    concrete keep set.

    The naive form — a cumulative sum over a window partitioned by the
    LOW-CARDINALITY language column — serializes each language through one
    task (the q113 failure class: one language is most of a real corpus).
    Instead the selection total order is defined as (quality band desc,
    md5 subkey asc, quality desc, id asc), where band = floor(quality ·
    64): the ranking window partitions by (lang, band, subkey) so no task
    ever sees more than one band-shard of one language, and local
    cumulative sums are globalized by a broadcast offset layer of
    per-(lang, band, subkey) token totals (≤ langs × 64 × 4 rows at ANY
    corpus size). Within a band, quality differs by < 1/64, so the
    band-then-subkey order deviates from strict quality order only inside
    a band-boundary sliver — the documented cost of the scale-safe rank
    (same trade as the q111 shard rank). The order is plain SQL, so the
    oracle checks cum_tokens and the keep decision value-for-value.

    Returns (id, lang, n_tokens, cum_tokens, selected).
    """
    from cassandra_analytics_example_spark.operators.text import (
        quality_features,
    )
    from cassandra_analytics_example_spark.session import spread
    from pyspark.sql import Window

    q = quality_features(spread(df), text_col).select(
        F.col(id_col),
        F.col(lang_col),
        F.col("n_tokens"),
        F.col("quality_score"),
        F.floor(F.col("quality_score") * _BUDGET_BANDS)
        .cast("bigint")
        .alias("__band"),
        (md5_u60(F.col(id_col).cast("string")) % _BUDGET_SUBSPLITS).alias(
            "__sub"
        ),
    )
    wl = (
        Window.partitionBy(lang_col, "__band", "__sub")
        .orderBy(F.col("quality_score").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = q.withColumn("__lcum", F.sum("n_tokens").over(wl))
    # offset layer: one row per (lang, band, sub) — bounded by langs*64*4
    wp = (
        Window.partitionBy(lang_col)
        .orderBy(F.col("__band").desc(), F.col("__sub").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        q.groupBy(lang_col, "__band", "__sub")
        .agg(F.sum("n_tokens").alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(wp), F.lit(0)))
        .select(
            F.col(lang_col).alias("__lang"),
            F.col("__band").alias("__b"),
            F.col("__sub").alias("__s"),
            "__off",
        )
    )
    cum = (F.col("__off") + F.col("__lcum")).cast("bigint")
    return (
        local.join(
            F.broadcast(offsets),
            (local[lang_col] == offsets["__lang"])
            & (local["__band"] == offsets["__b"])
            & (local["__sub"] == offsets["__s"]),
        )
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.col("n_tokens"),
            cum.alias("cum_tokens"),
            (cum <= F.lit(budget_tokens)).alias("selected"),
        )
    )
