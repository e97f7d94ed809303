"""Deterministic mergeable frequency sketches.

The HLL distinct-count path (q37) is engine-approximate and gated by error
bounds; the count-min sketch here is the opposite design point: every cell
is a DETERMINISTIC function of the data (md5-derived hash rows, fixed
width), so two engines — or two partial sketches merged across a shuffle —
produce bit-identical tables, and a SQL oracle reproduces estimates
exactly.

Why this matters at 100 TB: the sketch is a ``groupBy (row, cell)`` count —
``depth x width`` cells regardless of corpus size, built with map-side
partial aggregation in one shuffle, mergeable across days/shards by cell
addition. Heavy-hitter estimation then joins a handful of probe keys
against the tiny cell table. Reference scope: the reference app has no
sketch surface (SURVEY §2.8); this follows the standard Cormode-
Muthukrishnan construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.text import md5_u60


def _cell(col, d_col, width: int):
    """Hash row ``d`` cell index for a key: md5_u60(d || key) % width —
    one independent hash row per depth index, the SQL-twin-able stand-in
    for a pairwise-independent family."""
    return (md5_u60(col, seed=d_col) % F.lit(width)).cast("bigint")


def countmin_cells(
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build the count-min cell table over one row per key OCCURRENCE.

    Returns (d, cell, c): for each of ``depth`` hash rows, the occurrence
    count landing in each of ``width`` cells. One explode by depth (bounded
    fan-out) + one partial-aggregated shuffle on (d, cell); the result is
    at most ``depth x width`` rows whatever the input size, and two cell
    tables from disjoint corpora merge by summing ``c``.
    """
    ds = F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d")
    exploded = keys.select(F.col(key_col).alias("__k"), ds)
    return (
        exploded.select(
            "d", _cell(F.col("__k"), F.col("d").cast("string"), width).alias("cell")
        )
        .groupBy("d", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_estimate(
    cells: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each probe key from the cell table: min over hash
    rows of the probed cell's count (the classic CMS upper-bound estimate;
    never an underestimate). The <= depth*width cell table broadcasts; a
    probe cell with no corpus hit counts as 0 (LEFT join + coalesce), so a
    key absent from the corpus estimates 0 instead of vanishing — callers
    joining estimates back onto their probe set keep every key."""
    ds = F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d")
    probe_cells = probes.select(F.col(key_col), ds).select(
        key_col,
        "d",
        _cell(F.col(key_col), F.col("d").cast("string"), width).alias("cell"),
    )
    return (
        probe_cells.join(F.broadcast(cells), ["d", "cell"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0)))
            .cast("bigint")
            .alias("est_n")
        )
    )
