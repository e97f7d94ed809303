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


WIDE_SCHEMA_DDL = (
    "id BIGINT NOT NULL, course BINARY NOT NULL, "
    "tags ARRAY<STRING> NOT NULL, attrs MAP<STRING, BIGINT> NOT NULL, "
    "addr STRUCT<city: STRING, zip: BIGINT> NOT NULL, "
    "pair STRUCT<first: BIGINT, second: STRING> NOT NULL"
)


def gen_wide_types_deterministic(
    spark: SparkSession, records: int, slices: int
) -> DataFrame:
    """Deterministic generator for the CQL collection-type surface the
    converter jar exposes (SURVEY §1.2, ``run.sh:37``): list/set → array,
    map → map, UDT → struct, tuple → two-field struct, plus the blob the
    3-column reference table already covers. Every value derives from the
    id, so a SQL oracle regenerates the content from ``range()`` exactly:

    * ``tags``  = ['t<id%5>', 'u<id%3>']          (CQL list<text>)
    * ``attrs`` = {'a': id, 'b': 2*id}            (CQL map<text,bigint>)
    * ``addr``  = ('city-<id%7>', 10000 + id%100) (CQL UDT)
    * ``pair``  = (id, 's<id%11>')                (CQL tuple<bigint,text>)
    """
    i = F.col("id")
    return _base_range(spark, records, slices).select(
        i,
        F.encode(F.format_string("crs-%032d", i), "utf-8").alias("course"),
        F.array(
            F.concat(F.lit("t"), (i % 5).cast("string")),
            F.concat(F.lit("u"), (i % 3).cast("string")),
        ).alias("tags"),
        F.create_map(
            F.lit("a"), i, F.lit("b"), (F.lit(2) * i)
        ).alias("attrs"),
        F.struct(
            F.concat(F.lit("city-"), (i % 7).cast("string")).alias("city"),
            (F.lit(10000) + i % 100).alias("zip"),
        ).alias("addr"),
        F.struct(
            i.alias("first"),
            F.concat(F.lit("s"), (i % 11).cast("string")).alias("second"),
        ).alias("pair"),
    )
