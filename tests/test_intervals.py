"""Bucketed interval-overlap join: semantics vs brute force, and the
plan gate that proves the range predicate never degenerates into a
nested-loop/cartesian join when both sides are large."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.intervals import (
    bucketed_interval_join,
)

H = 3_600_000_000  # one hour in µs


def _intervals(spark, name, spec):
    return spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(spec)],
        f"{name}_id bigint, {name}_start bigint, {name}_end bigint",
    )


def test_matches_bruteforce(spark):
    # Deterministic mix: sub-bucket, bucket-spanning, touching, disjoint.
    left = _intervals(
        spark,
        "l",
        [
            (0, H // 2),            # first half of hour 0
            (H // 4, 3 * H),        # spans hours 0-3
            (5 * H, 5 * H),         # a point
            (7 * H + 1, 8 * H - 1), # strictly inside hour 7
        ],
    )
    right = _intervals(
        spark,
        "r",
        [
            (H // 3, H // 3 + 10),  # inside l0 and l1
            (3 * H, 4 * H),         # touches l1 at exactly 3H
            (5 * H, 6 * H),         # covers the point l2
            (9 * H, 10 * H),        # overlaps nothing
        ],
    )
    got = (
        bucketed_interval_join(
            left, right, "l_start", "l_end", "r_start", "r_end",
            bucket_us=H,
        )
        .select("l_id", "r_id", "overlap_us")
        .collect()
    )
    brute = (
        left.crossJoin(right)
        .where(
            (F.col("l_start") <= F.col("r_end"))
            & (F.col("r_start") <= F.col("l_end"))
        )
        .select(
            "l_id",
            "r_id",
            (
                F.least("l_end", "r_end")
                - F.greatest("l_start", "r_start")
            ).alias("overlap_us"),
        )
        .collect()
    )
    key = lambda r: (r.l_id, r.r_id)  # noqa: E731
    assert sorted(got, key=key) == sorted(brute, key=key)
    # Spot-check the shapes the fixture encodes.
    pairs = {(r.l_id, r.r_id): r.overlap_us for r in got}
    assert pairs[(1, 1)] == 0            # point touch at 3H
    assert (2, 2) in pairs               # point interval covered
    assert not any(r_id == 3 for _, r_id in pairs)  # disjoint right


def test_dedupes_multi_bucket_pairs(spark):
    # A pair sharing 4 buckets must still appear exactly once.
    left = _intervals(spark, "l", [(0, 4 * H - 1)])
    right = _intervals(spark, "r", [(H, 2 * H)])
    got = bucketed_interval_join(
        left, right, "l_start", "l_end", "r_start", "r_end", bucket_us=H
    ).collect()
    assert len(got) == 1
    assert got[0].overlap_us == H


def test_large_both_sides_no_nested_loop(spark):
    """The whole point of the decomposition: with NEITHER side broadcast,
    the candidate join is an equi-join on the bucket id — a hash/sort-merge
    join, never CartesianProduct or BroadcastNestedLoopJoin."""
    left = _intervals(spark, "l", [(i * H, i * H + H // 2) for i in range(50)])
    right = _intervals(spark, "r", [(i * H + H // 4, i * H + H) for i in range(50)])
    plan = bucketed_interval_join(
        left, right, "l_start", "l_end", "r_start", "r_end",
        bucket_us=H, broadcast_right=False,
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q167_plan_no_cartesian(spark):
    """q167's session x incident join must ride the bucket equi-key; the
    only nested-loop in the plan is the one-row totals broadcast."""
    from cassandra_analytics_example_spark.queries import load_all

    df = load_all()["q167_incident_session_overlap"].fn(
        spark, "/root/testdata/sf0.01"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_duplicate_rows_keep_their_pairs(spark):
    """Two fully-identical input rows must each emit their pairs — the
    dedupe collapses only the bucket-explode fan-out, not duplicate
    source rows (r5 ADVICE: dedupe is by row identity, not column set)."""
    left = spark.createDataFrame(
        [(0, 3 * H), (0, 3 * H)], "l_start bigint, l_end bigint"
    )
    right = spark.createDataFrame(
        [(H, 2 * H)], "r_start bigint, r_end bigint"
    )
    got = bucketed_interval_join(
        left, right, "l_start", "l_end", "r_start", "r_end", bucket_us=H
    )
    # Each duplicate left row overlaps the single right row → 2 pairs,
    # even though both spans share 3 buckets with it.
    assert got.count() == 2
