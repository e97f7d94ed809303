"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` re-export the engine's query registry
(cassandra_analytics_example_spark/queries/) — one entry per implemented
operator from SURVEY.md §2/§7, each with a DuckDB-checkable ANSI-SQL twin
where SQL-expressible (streaming entries are rows-only by design).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cassandra_analytics_example_spark.queries import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the pricing-summary aggregate (q01) — a pushed-down
    filter + 8-way hash aggregate over lineitem, the engine's bread and
    butter shape."""
    registry = load_all()
    return registry["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator; (spark, sf_dir) -> DataFrame."""
    return {name: qd.fn for name, qd in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per query (omitted → rows-only check)."""
    return {
        name: qd.oracle for name, qd in load_all().items() if qd.oracle is not None
    }
