"""Fixture-table loaders for query callables.

``events`` needs special handling: the fixture parquet stores
``timestamp[ns]`` which Spark's vectorized parquet reader rejects outright
(PARQUET_TYPE_ILLEGAL). The loader flips the documented escape hatch
``spark.sql.legacy.parquet.nanosAsLong`` and derives:

* ``ts_ns`` — raw nanosecond epoch (bigint, lossless);
* ``ts_us`` — microsecond epoch (bigint; exact in doubles too);
* ``ts``   — TimestampType at µs (Spark's native resolution).

DuckDB reads the same file natively at ns, so oracle SQL uses
``epoch_us(ts)`` / ``date_trunc`` which agree with the µs derivations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        F.col("ts").alias("ts_ns"),
        F.expr("ts div 1000").alias("ts_us"),
        F.expr("timestamp_micros(ts div 1000)").alias("ts"),
    )
