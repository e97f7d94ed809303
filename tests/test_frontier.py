"""Distributed skyline: equivalence with brute-force dominance, tie
handling, and the no-global-sort plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.frontier import (
    pareto_frontier_2d,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(rows)],
        "id bigint, x bigint, y bigint",
    )


def _brute(spark, df):
    o = df.alias("o")
    t = df.alias("t")
    dominated = (
        t.join(
            o,
            (F.col("o.x") > F.col("t.x")) & (F.col("o.y") > F.col("t.y")),
            "left_semi",
        )
        .select("t.id")
    )
    return df.join(dominated, "id", "left_anti")


def test_matches_bruteforce_with_ties(spark):
    # Duplicate x values, duplicate points, a dominating chain, and a
    # column where everything shares one x — the range-partition edge
    # cases.  31 deterministic points, forced through 8 range partitions.
    rows = [
        (5, 1), (5, 9), (4, 10), (3, 2), (2, 11), (1, 1),
        (7, 7), (7, 7), (7, 3), (6, 8),
        (10, 0), (0, 20), (0, 19),
    ] + [(i % 4, (i * 7) % 13) for i in range(18)]
    df = _df(spark, rows)
    got = sorted(
        (r.x, r.y, r.id)
        for r in pareto_frontier_2d(df, "x", "y", num_partitions=8).collect()
    )
    want = sorted((r.x, r.y, r.id) for r in _brute(spark, df).collect())
    assert got == want


def test_single_point_and_all_equal(spark):
    assert pareto_frontier_2d(_df(spark, [(3, 3)]), "x", "y").count() == 1
    # All-identical points: none strictly dominates another — all survive.
    allsame = _df(spark, [(2, 2)] * 5)
    assert pareto_frontier_2d(allsame, "x", "y").count() == 5


def test_plan_no_global_sort_no_cross_join(spark):
    """The scan must be range-partitioned windows + a broadcast offset
    join: no CartesianProduct, no single-partition global Window (the
    local window partitions by __pid)."""
    df = _df(spark, [(i, i) for i in range(100)])
    plan = (
        pareto_frontier_2d(df, "x", "y", num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "__pid" in plan  # windows ride the range cells


def test_fractional_x_dominator_excluded(spark):
    """Strict dominance must hold for non-integer x: a dominator at
    x + 0.5 used to fall outside the value-based (-1) range frame and
    leave the dominated row alive (r5 ADVICE)."""
    df = spark.createDataFrame(
        [(0, 1.0, 5.0), (1, 1.5, 10.0), (2, 0.25, 12.0), (3, 0.75, 11.0)],
        "id bigint, x double, y double",
    )
    # (1.0,5.0) is dominated by (1.5,10.0); (0.25,12.0) survives (max y);
    # (0.75,11.0) survives (nothing with greater x has greater y).
    got = sorted(
        r.id for r in pareto_frontier_2d(df, "x", "y", num_partitions=1).collect()
    )
    assert got == [1, 2, 3]
    # Same answer at higher parallelism (offset layer in play).
    got8 = sorted(
        r.id for r in pareto_frontier_2d(df, "x", "y", num_partitions=8).collect()
    )
    assert got8 == [1, 2, 3]
