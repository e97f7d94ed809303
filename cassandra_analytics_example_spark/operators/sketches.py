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


# ---------------------------------------------------------------- HLL ------

HLL_P = 8                 # 2^8 = 256 registers
HLL_M = 1 << HLL_P
_HLL_W = 60 - HLL_P       # rho bits left of the 60-bit md5 hash
# estimate numerator alpha_m * m^2 * 2^53, precomputed in Python and inlined
# as the SAME literal in Spark and the SQL oracle — no cross-engine constant-
# folding order to worry about
HLL_EST_NUM = 0.7213 / (1.0 + 1.079 / HLL_M) * float(HLL_M * HLL_M) * float(
    1 << 53
)


def hll_registers(
    keys: DataFrame, key_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Deterministic HLL register table over ``key_col`` values, optionally
    per group/shard: ``(group..., bucket, r)`` where bucket = top ``HLL_P``
    bits of the 60-bit md5 hash and r = max over values of the rank
    (leading-zero count + 1) of the remaining bits.

    Deterministic (md5, not engine-internal xxhash), so two engines build
    BIT-IDENTICAL registers — and registers merge across shards/days by
    per-bucket MAX (max is associative/commutative/idempotent: re-merging
    a shard is harmless, the mergeability property q135 gates). At most
    ``groups x 256`` rows regardless of corpus size; one partial-aggregated
    shuffle."""
    h = md5_u60(F.col(key_col).cast("string"))
    rem = (h % F.lit(1 << _HLL_W)).alias("rem")
    hashed = keys.select(
        *[F.col(c) for c in group_cols],
        # exact bit shift for the bucket — float division would lose
        # integer exactness above 2^53
        F.shiftright(h, _HLL_W).cast("bigint").alias("bucket"),
        rem,
    ).select(
        *group_cols,
        "bucket",
        F.when(F.col("rem") == 0, F.lit(_HLL_W + 1))
        .otherwise(F.lit(_HLL_W + 1) - F.length(F.conv(F.col("rem"), 10, 2)))
        .cast("int")
        .alias("rho"),
    )
    return hashed.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("r")
    )


def hll_estimate(registers: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Cardinality estimate from a register table, per group: the harmonic
    mean runs in EXACT integer arithmetic (each ``2^-r`` term scaled by
    ``2^53`` to a bigint power of two, summed exactly — order-independent,
    so the estimate is bit-identical in any engine at any parallelism),
    with the standard linear-counting small-range correction."""
    agg = registers.groupBy(*group_cols).agg(
        # shiftleft's bit-count arg must be an expression here, and the
        # python API only takes an int literal
        F.sum(F.expr("shiftleft(cast(1 as bigint), 53 - r)"))
        .cast("bigint")
        .alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    v = F.lit(HLL_M) - F.col("n_present")
    s_total = F.col("s_present") + v * F.lit(1 << 53)
    raw = F.lit(HLL_EST_NUM) / s_total.cast("double")
    est = F.when(
        (v > 0) & (raw < F.lit(2.5 * HLL_M)),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("est"))


def countmin_inner_product(cells_a: DataFrame, cells_b: DataFrame) -> DataFrame:
    """Join-size estimate from two count-min cell tables: ``min over hash
    rows d of sum_cell cA[d][cell] * cB[d][cell]`` — the Alon-Matias-
    Szegedy-style inner-product estimate (an upper bound in expectation
    per row; the min over independent rows tightens it).  This is the
    planner primitive: |A join B on k| = sum_k fA(k) * fB(k), estimated
    from two depth*width summaries WITHOUT touching either table again —
    at 100 TB the sketches are built in each table's single aggregation
    pass (mergeable across shards) and the estimate itself is a
    ~depth*width-row join.

    Returns one row: (est_size).
    """
    a = cells_a.select("d", "cell", F.col("c").alias("ca"))
    b = cells_b.select("d", "cell", F.col("c").alias("cb"))
    per_row = (
        a.join(b, ["d", "cell"])
        .groupBy("d")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("ip"))
    )
    return per_row.agg(F.min("ip").cast("bigint").alias("est_size"))
