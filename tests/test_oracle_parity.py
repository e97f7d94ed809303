"""Mirror of the driver's t2 correctness gate: run every registered query in
Spark AND its DuckDB oracle on the same parquet tables, compare row count,
column names, and the full (order-insensitive) value multiset — EXACTLY, no
float tolerance, because the engine's determinism conventions (decimal sums,
md5 hashing, ordered float folds) are designed to make that possible.

Set SPARK_GRAFT_ORACLE_DIR to test another scale factor (default sf0.001;
the driver runs sf0.01).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from cassandra_analytics_example_spark.queries import load_all
from cassandra_analytics_example_spark.sources.registry import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.001")

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, qd in REGISTRY.items() if qd.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, qd in REGISTRY.items() if not qd.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return float(v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return v


def _rows(pairs):
    return sorted(
        (tuple(_canon(v) for v in row) for row in pairs),
        key=lambda r: tuple(str(x) for x in r),
    )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    scols = sorted(sdf.columns)
    spark_rows = [
        tuple(row[c] for c in scols) for row in sdf.collect()
    ]

    res = duck.execute(qd.oracle)
    dcols_full = [d[0] for d in res.description]
    drows_raw = res.fetchall()
    dcols = sorted(dcols_full)
    idx = [dcols_full.index(c) for c in dcols]
    duck_rows = [tuple(r[i] for i in idx) for r in drows_raw]

    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s, d = _rows(spark_rows), _rows(duck_rows)
    mismatches = [
        (a, b) for a, b in zip(s, d) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns
