"""Fixture-table loaders for query callables.

``events`` needs special handling: fixture generations have stored ``ts``
either as ``timestamp[ns]`` (which Spark's vectorized parquet reader
rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` lifts it to a raw
bigint) or as ``timestamp[us]`` (read natively as TIMESTAMP_NTZ). The
loader is schema-adaptive and always derives the same three columns, so
every query sees one stable surface regardless of fixture vintage:

* ``ts_ns`` — nanosecond epoch (bigint; lossless for ns fixtures, µs×1000
  otherwise);
* ``ts_us`` — microsecond epoch (bigint; exact in doubles too);
* ``ts``   — TimestampType at µs (Spark's native resolution).

DuckDB reads the same file natively, so oracle SQL uses ``epoch_us(ts)`` /
``epoch_ns(ts)`` / ``date_trunc`` which agree with these derivations under
the UTC session timezone.
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
    ts_type = dict(raw.dtypes)["ts"]
    if ts_type in ("bigint", "long"):  # ns fixture via nanosAsLong
        ts_ns = F.col("ts")
        ts_us = F.expr("ts div 1000")
        ts = F.expr("timestamp_micros(ts div 1000)")
    else:  # native timestamp / timestamp_ntz fixture (µs resolution)
        ts = F.col("ts").cast("timestamp")  # NTZ→TS is identity under UTC
        ts_us = F.unix_micros(ts)
        ts_ns = ts_us * F.lit(1000)
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        "props",
        ts_ns.alias("ts_ns"),
        ts_us.alias("ts_us"),
        ts.alias("ts"),
    )
