"""Approximate-membership operators: a portable Bloom filter as column
algebra.

Scale story: semi-joining a 100 TB probe side against a large build side
shuffles both; pre-filtering the probe with a FIXED-SIZE bit set turns
that into (probe-local hashing) + a join against at most ``m`` bit rows —
broadcastable no matter how many members built it. Spark's own runtime
bloom filters (AQE ``runtime.bloomFilter``) do exactly this inside the
engine; this operator is the *explicit, engine-portable* variant — bit
positions derive from md5 (the repo's cross-engine hashing discipline,
functions/text.py:md5_u60), so a DuckDB oracle reproduces the filter
bit-for-bit and the false-positive set is deterministic, not just
bounded. Use the built-in runtime filter when you don't need portability;
use this when the filter must be persisted, shipped, or checked.

False positives pass (by design, rate set by m/k/n); false negatives are
impossible — the semi-join after the bloom stays correct, just cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.text import md5_u60


def _positions(key: Column, m: int, k: int) -> Column:
    """Array of ``k`` md5-derived bit positions in ``[0, m)`` for a key."""
    return F.array(
        *[md5_u60(key.cast("string"), seed=j) % F.lit(m) for j in range(k)]
    )


def bloom_build(
    df: DataFrame, key_col: str, *, m: int = 8192, k: int = 3
) -> DataFrame:
    """Build the bloom bit set of ``key_col``: a single-column DataFrame
    ``bit`` holding the DISTINCT set positions — at most ``m`` rows
    regardless of member count (the fixed-size property that makes the
    filter broadcastable at any build-side scale)."""
    return (
        df.select(F.explode(_positions(F.col(key_col), m, k)).alias("bit"))
        .distinct()
    )


def bloom_probe(
    probe: DataFrame, key_col: str, bits: DataFrame, *, m: int = 8192, k: int = 3
) -> DataFrame:
    """Annotate ``probe`` keys with ``bloom_pass``: true iff ALL ``k`` bit
    positions are set. One explode (k rows/key) + one broadcast join on the
    bit id + a count-per-key aggregate — the probe side is never shuffled
    by the members, only by its own key."""
    pos = probe.select(
        F.col(key_col),
        F.explode(_positions(F.col(key_col), m, k)).alias("bit"),
    )
    hits = (
        pos.join(F.broadcast(bits), "bit")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__nhit"))
    )
    return (
        probe.join(hits, key_col, "left")
        .select(
            probe["*"],
            (F.coalesce(F.col("__nhit"), F.lit(0)) == F.lit(k)).alias(
                "bloom_pass"
            ),
        )
    )


def positions_sql(key_expr: str, m: int, k: int) -> str:
    """DuckDB twin of :func:`_positions` as an UNNEST-able list literal —
    each element ``CAST(('0x' || substr(md5(j || key), 1, 15)) AS BIGINT)
    % m`` for j in 0..k-1 (matches ``md5_u60(seed=j)``)."""
    elems = ", ".join(
        f"(CAST(('0x' || substr(md5('{j}' || {key_expr}), 1, 15)) AS BIGINT)"
        f" % {m})"
        for j in range(k)
    )
    return f"[{elems}]"
