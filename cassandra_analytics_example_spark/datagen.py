"""Synthetic row generator — the reference's S2/S3/T1 operators done
DataFrame-native.

Reference behavior (``SparkUtils.scala:102-117``): generate ``records`` rows of
``(id: Long, course: Binary = UTF-8 bytes of a UUID string, marks: Long = id)``
split evenly across ``slices`` partitions (remainder folded into the last),
rows produced lazily per partition via ``mapPartitionsWithIndex``.

Here ``spark.range(0, records, 1, slices)`` already gives the same
even-split-with-remainder partition arithmetic and pipelined (iterator-based)
row production inside whole-stage codegen — no RDD, no Python in the loop.

Two variants:

* ``gen_dataset``     — faithful: random UUID course (non-deterministic, like
                        ``UUID.randomUUID`` at ``SparkUtils.scala:113``).
* ``gen_dataset_deterministic`` — hash-checkable: course derived from id
                        (FIXTURES.md group A suggests this for oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TEST_SCHEMA_DDL = "id BIGINT NOT NULL, course BINARY NOT NULL, marks BIGINT NOT NULL"


def _base_range(spark: SparkSession, records: int, slices: int) -> DataFrame:
    if records < 0:
        raise ValueError(f"records must be >= 0, got {records}")
    if slices < 1:
        raise ValueError(f"slices must be >= 1, got {slices}")
    return spark.range(0, records, 1, numPartitions=slices)


def gen_dataset(spark: SparkSession, records: int, slices: int) -> DataFrame:
    """Faithful generator: (id, course=utf8(uuid()), marks=id)."""
    return _base_range(spark, records, slices).select(
        F.col("id"),
        F.encode(F.expr("uuid()"), "utf-8").alias("course"),
        F.col("id").alias("marks"),
    )


def gen_dataset_deterministic(
    spark: SparkSession, records: int, slices: int
) -> DataFrame:
    """Deterministic generator for hash-checkable round trips: course is the
    UTF-8 bytes of ``crs-%032d`` of the id — same 36-byte width as the UUID
    string the reference writes (``SparkUtils.scala:113``)."""
    return _base_range(spark, records, slices).select(
        F.col("id"),
        F.encode(F.format_string("crs-%032d", F.col("id")), "utf-8").alias(
            "course"
        ),
        F.col("id").alias("marks"),
    )
