"""Bucketed interval-overlap join — range predicates without a cross
product.

A naive interval-overlap join (``l.start <= r.end AND r.start <= l.end``)
has no equi key, so Catalyst can only plan it as a (broadcast) nested-loop
join: quadratic work the moment both sides are large.  The scalable
decomposition is the classic spatial-join trick on the time axis:

1. explode every interval into the fixed-width buckets it touches
   (``sequence(start div W, end div W)``);
2. equi-join on the bucket id — candidates are only interval pairs that
   share a bucket, so per-bucket density bounds the work;
3. de-duplicate pairs (a pair sharing k buckets appears k times) and
   re-check the exact predicate (bucket overlap is necessary, not
   sufficient, when intervals don't align to bucket edges).

Cost: one shuffle per side on the bucket key (or none for a broadcast
side), candidate count = sum over buckets of |L_b| x |R_b| — linear for
time-local data instead of |L| x |R|.  Pick ``bucket_us`` near the median
interval length: too small multiplies bucket rows per interval, too large
multiplies candidates per bucket.

No counterpart in the reference (558-LoC Scala ETL, SURVEY §2 scope
note); this is the analytics-surface range-join family (q93 band join,
q129 point-in-time join) extended to interval x interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_us: int = 3_600_000_000,
    broadcast_right: bool = False,
) -> DataFrame:
    """Overlap-join two interval tables on closed intervals [start, end].

    Returns one row per overlapping (left, right) pair carrying ALL
    columns of both inputs (names must not collide) plus ``overlap_us`` =
    ``least(ends) - greatest(starts)`` (>= 0; 0 means point touch).
    Both bounds are epoch-microsecond bigints.
    """
    # Row identity BEFORE the bucket explode: a pair sharing k buckets is
    # k copies of the SAME (left-row, right-row) identity, so deduping on
    # the id pair collapses exactly the explode fan-out. Deduping on the
    # full column set instead would also merge genuinely distinct but
    # fully-identical input rows, silently losing their pairs.
    lb = left.withColumn("__lid", F.monotonically_increasing_id()).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"{l_start} div {bucket_us}"),
                F.expr(f"{l_end} div {bucket_us}"),
            )
        ),
    )
    rb = right.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"{r_start} div {bucket_us}"),
                F.expr(f"{r_end} div {bucket_us}"),
            )
        ),
    )
    if broadcast_right:
        rb = F.broadcast(rb)
    cand = lb.join(rb, "__b").drop("__b")
    pairs = (
        cand.dropDuplicates(["__lid", "__rid"])
        .where(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
        )
        .drop("__lid", "__rid")
    )
    return pairs.withColumn(
        "overlap_us",
        F.least(F.col(l_end), F.col(r_end))
        - F.greatest(F.col(l_start), F.col(r_start)),
    )
