"""Data-profiling operators: key-skew diagnosis and per-column profiles.

At 100 TB you profile BEFORE you run: a join or aggregation keyed on a
column with one hot value stragglers on a single reducer (the failure mode
``operators.relational.salted_join`` mitigates), and a column that is 40%
NULL or constant changes every downstream decision. Both reports are
two-level aggregations — a keyed count shuffle followed by a tiny scalar
reduce — so the profile costs one pass over the data and returns rows that
fit on a screen, never a driver-side collect of the data itself.

Determinism: every ratio surfaces as a SINGLE division of two exact
integers (IEEE-identical in every engine); no multi-term float sums.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew diagnosis of ``key_col``: key cardinality, row count,
    the hottest key's count and share, and the max/mean skew ratio.

    ``skew_ratio`` ≈ 1 means uniform keys (safe to shuffle on);
    ``hot_share`` near 1 means one key owns the stage — reach for
    ``salted_join``/AQE skew handling before running the real job.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__cnt"))
    return counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("__cnt").cast("bigint").alias("n_rows"),
        F.max("__cnt").cast("bigint").alias("max_cnt"),
        F.min("__cnt").cast("bigint").alias("min_cnt"),
        (F.max("__cnt").cast("double") / F.sum("__cnt").cast("double")).alias(
            "hot_share"
        ),
        (
            (F.max("__cnt") * F.count(F.lit(1))).cast("double")
            / F.sum("__cnt").cast("double")
        ).alias("skew_ratio"),
    )


def hot_keys(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """The ``k`` hottest keys with exact counts — the keys a salting or
    AQE-skew mitigation will actually split. Deterministic total order:
    count desc, then key asc."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    return counts.orderBy(F.desc("cnt"), F.asc(key_col)).limit(k)


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile: row count, NULL count, exact distinct count,
    min and max (stringified so one schema serves every column type).
    One row per profiled column.

    Each column's profile is an independent full-column aggregate; Spark
    computes all of them in ONE pass (a single multi-aggregate projection,
    partial-aggregated map-side). Exact ``count(distinct)`` over many
    columns multiplies the aggregation's expand factor — for wide tables
    swap in ``approx_count_distinct`` per column; exactness is kept here
    for oracle-checkability.
    """
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(F.lit(1)).cast("bigint").alias(f"__{c}__n"),
                F.sum(F.col(c).isNull().cast("bigint"))
                .cast("bigint")
                .alias(f"__{c}__nulls"),
                F.count_distinct(F.col(c)).cast("bigint").alias(f"__{c}__nd"),
                F.min(F.col(c)).cast("string").alias(f"__{c}__min"),
                F.max(F.col(c)).cast("string").alias(f"__{c}__max"),
            ]
        )
    wide = df.agg(*aggs)
    profiles = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__{c}__n").alias("n_rows"),
            F.col(f"__{c}__nulls").alias("n_nulls"),
            F.col(f"__{c}__nd").alias("n_distinct"),
            F.col(f"__{c}__min").alias("min_value"),
            F.col(f"__{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(
        F.explode(F.array(*profiles)).alias("p")
    ).select("p.*")


def constraint_audit(checks: dict[str, DataFrame]) -> DataFrame:
    """dbt-style data-quality audit: union the named violation sets into
    one (check_name, n_violations) report, computed in a single job.

    Each value is a DataFrame whose ROWS ARE THE VIOLATIONS (an anti-join
    for referential integrity, a filter for range/null/uniqueness rules);
    the report only aggregates counts, so the heavy inputs are never
    collected. At 100 TB each FK check is one anti-join whose dimension
    side is broadcastable, and Catalyst prunes every check down to the
    columns it actually tests — the audit costs roughly one scan per
    distinct fact table, not per check."""
    parts = [
        v.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )
        for name, v in checks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def observed_write(
    df: DataFrame,
    path: str,
    metrics: dict[str, "F.Column"],
    *,
    file_format: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` while collecting audit metrics IN THE SAME PASS via
    ``Dataset.observe`` — row counts, null counts, sums ride the write
    job as accumulator-style aggregates, so the "write + verify what you
    wrote" pattern costs one scan, not two. At 100 TB the second
    verification scan this replaces is hours of cluster time.

    ``metrics`` values must be aggregate expressions (count/sum/min/max
    over the observed plan). Returns the observed metric dict after the
    write completes. (Spark exposes the same mechanism on streams via
    ``StreamingQueryListener``; this is the batch form.)"""
    from pyspark.sql import Observation

    obs = Observation("write_audit")
    observed = df.observe(
        obs, *[c.alias(n) for n, c in metrics.items()]
    )
    observed.write.format(file_format).mode(mode).save(path)
    return obs.get


def hourly_anomaly_flags(hourly: DataFrame) -> DataFrame:
    """Flag anomalous hours from a (event_type, hr, n) hourly count table:
    an hour is anomalous when |n - mean| > 2*stddev over its type's
    hours, rearranged to EXACT integer algebra — with H hours, S = sum(n),
    Q = sum(n^2): ``(n*H - S)^2 > 4*(Q*H - S^2)`` — no doubles, no sqrt,
    bit-identical across engines and aggregation orders.

    The per-type stats layer is vocabulary-sized and broadcast back, so
    the hourly table never reshuffles to meet it.  Shared by the batch
    audit (q144) and the streaming-maintained hourly store (s16).
    """
    from pyspark.sql import functions as F

    st = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("h"),
        F.sum("n").cast("bigint").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("q"),
    )
    joined = hourly.join(F.broadcast(st), "event_type")
    dev = F.col("n") * F.col("h") - F.col("s")
    return joined.where(
        dev * dev > F.lit(4) * (F.col("q") * F.col("h") - F.col("s") * F.col("s"))
    ).select(
        "event_type",
        F.col("hr").cast("bigint").alias("hr"),
        F.col("n").cast("bigint").alias("n"),
        F.when(F.col("n") * F.col("h") > F.col("s"), F.lit("hi"))
        .otherwise(F.lit("lo"))
        .alias("side"),
    )


def functional_dependency_audit(
    df: DataFrame, candidates: Sequence[tuple[str, str]]
) -> DataFrame:
    """Test candidate functional dependencies A -> B on one table: the FD
    holds iff ``count(distinct A) == count(distinct (A, B))``; the gap is
    the number of EXTRA (A, B) combinations — how many lhs values map to
    more than one rhs, the schema-discovery signal that tells a pipeline
    which columns are safe join/dedup keys and which only look like keys
    at small scale.

    One pass per candidate (two distinct-aggregates share the scan via
    expand), all integers; rows: (lhs, rhs, n_lhs, n_pairs, holds,
    extra_combos).
    """
    from pyspark.sql import functions as F

    parts = []
    for lhs, rhs in candidates:
        parts.append(
            df.agg(
                F.countDistinct(F.col(lhs)).cast("bigint").alias("n_lhs"),
                F.countDistinct(F.col(lhs), F.col(rhs))
                .cast("bigint")
                .alias("n_pairs"),
            ).select(
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                "n_lhs",
                "n_pairs",
                (F.col("n_pairs") == F.col("n_lhs")).alias("holds"),
                (F.col("n_pairs") - F.col("n_lhs"))
                .cast("bigint")
                .alias("extra_combos"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 10,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier tuple —
    the re-identification-risk half of the privacy family (q56 redacts
    direct PII, q227 releases noisy aggregates; this measures what the
    RAW quasi-identifiers already leak).

    Every row falls into the equivalence class of its quasi-identifier
    tuple; a class smaller than ``k`` re-identifies its members by
    linkage (Sweeney's k-anonymity), and a class whose ``sensitive_col``
    carries few DISTINCT values leaks the attribute even at size >= k
    (l-diversity). Output is one row per OBSERVED CLASS SIZE —
    ``(class_size, n_classes, n_rows, risky, min_l)`` where ``risky`` is
    the k-test on that size and ``min_l`` the worst sensitive diversity
    among classes of that size — a distribution report, deliberately NOT
    one row per class.

    Scale shape: one shuffle on the quasi tuple (class table, bounded by
    the quasi-identifier cardinality — the whole point of quasi
    identifiers is that this is small relative to the corpus), then a
    size-keyed aggregation whose output is bounded by the number of
    DISTINCT class sizes. No per-class rows ever leave the executors, so
    a 100 TB table with a billion tiny classes still reports in
    O(distinct sizes) rows. NULL quasi values form their own class (SQL
    GROUP BY semantics on both engines); rows with a NULL sensitive
    value count toward class size but not toward ``min_l``
    (count(DISTINCT) skips NULLs in both engines).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must name at least one column")
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.countDistinct(F.col(sensitive_col)).cast("bigint").alias("__l"),
    )
    return (
        classes.groupBy(F.col("__n").alias("class_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("__n").cast("bigint").alias("n_rows"),
            F.min("__l").cast("bigint").alias("min_l"),
        )
        .select(
            "class_size",
            "n_classes",
            "n_rows",
            (F.col("class_size") < F.lit(k)).alias("risky"),
            "min_l",
        )
        .orderBy("class_size")
    )
