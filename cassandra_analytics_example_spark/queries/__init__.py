"""Query registry — the engine's named query surface.

Every implemented operator (SURVEY.md §2 + §7) registers here as a
``QueryDef``: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where
SQL-expressible, an ANSI-SQL oracle string DuckDB can run over the same
parquet tables. ``__spark_entry__.py`` re-exports the registry as the driver
contract (``queries()`` / ``oracle_sql()``).

Determinism contract (what makes the oracle hash-match possible):

* money aggregates go through exact DECIMAL (functions/numeric.py);
* hashes are md5-based (functions/text.py), never murmur/xxhash;
* every ranking has a total order (explicit key tie-breaks);
* timestamps surface as integer epoch-µs or ISO strings, never raw
  engine-native timestamps;
* column names are aliased identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QueryDef] = {}

_MODULES = (
    "cassandra_analytics_example_spark.queries.reference",
    "cassandra_analytics_example_spark.queries.relational",
    "cassandra_analytics_example_spark.queries.events",
    "cassandra_analytics_example_spark.queries.llm",
    "cassandra_analytics_example_spark.queries.streaming",
)


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QueryDef]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return REGISTRY
