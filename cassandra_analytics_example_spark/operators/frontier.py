"""Distributed 2D Pareto frontier (skyline) — a prefix scan, not a sort.

A row is dropped iff some other row strictly beats it on BOTH axes
(``x' > x AND y' > y``).  The textbook single-node solution sorts by x
descending and keeps rows whose y exceeds the running max — a global
ordered scan, which on a cluster means one executor owning the whole
corpus.  This module runs the same scan as a two-layer prefix max, the
offset-layer pattern shared with the exact-quantile selector
(operators/quantiles.py) and shard packing (operators/chunking.py):

1. range-repartition on x descending — each partition owns a contiguous
   x-slice, equal x values never split across partitions;
2. LOCAL running max of y over strictly-greater x (a range-frame window
   whose partition is the range cell, never the corpus);
3. per-partition y maxima -> broadcast cumulative prefix maxima; the
   global running max is ``greatest(local, offset)``.

Cost: one range shuffle + one bounded window + one tiny broadcast —
identical asymptotics at 10 rows or 10 billion.  Ties on x survive
(strict dominance needs both axes strictly greater), so the result is
deterministic without a tiebreak column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.checkpoints import (
    pin_partition_ids,
)


def pareto_frontier_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    num_partitions: int = 64,
) -> DataFrame:
    """Rows of ``df`` not strictly dominated on (x, y); both numeric."""
    # pin_partition_ids: local layer + offsets layer join back on __pid —
    # frozen mapping required (operators/checkpoints.py:pin_partition_ids).
    part = pin_partition_ids(
        df.repartitionByRange(
            num_partitions, F.col(x_col).desc()
        ).withColumn("__pid", F.spark_partition_id())
    )

    # Local prefix max over STRICTLY greater x. A value-based range frame
    # (rangeBetween ..., -1 over x desc) would only exclude same-x rows
    # when x values are integer-spaced — a fractional dominator at
    # x + 0.5 would fall outside the frame and a dominated row would
    # survive. dense_rank is integer-spaced by construction: rows with
    # __dr' <= __dr - 1 are exactly the strictly-greater-x rows, for any
    # numeric x type. Both windows share the (pid, x desc) sort, so this
    # is still one window exchange.
    w_sort = Window.partitionBy("__pid").orderBy(F.col(x_col).desc())
    w_strict = (
        Window.partitionBy("__pid")
        .orderBy("__dr")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn("__dr", F.dense_rank().over(w_sort)).withColumn(
        "__lm", F.max(y_col).over(w_strict)
    )

    # Offset layer: partitions earlier in the range order hold strictly
    # greater x (equal keys are never split by the range partitioner), so
    # their y maxima are prefix state for every row here.
    cells = part.groupBy("__pid").agg(F.max(y_col).alias("__cm"))
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = cells.select(
        "__pid", F.max("__cm").over(w_off).alias("__off")
    )

    glob = local.join(F.broadcast(offsets), "__pid").withColumn(
        "__pm", F.greatest(F.col("__lm"), F.col("__off"))
    )
    return (
        glob.where(
            F.col("__pm").isNull() | (F.col("__pm") <= F.col(y_col))
        )
        .drop("__pid", "__dr", "__lm", "__off", "__pm")
    )
