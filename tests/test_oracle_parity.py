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


def _type_kind(t: str) -> str:
    """Canonical type family, mirroring the driver's typed value-hash.

    The driver hashes Arrow-typed values, so DuckDB ``sum(BIGINT)`` surfacing
    as ``decimal128(38,0)`` hash-mismatches a Spark ``bigint`` even when the
    Python values are equal ints (round-1 red rows). Collapse both sides'
    type names into families and require them to match.
    """
    t = t.lower()
    if t.startswith(("int", "uint", "bigint", "smallint", "tinyint", "long", "short", "byte")):
        return "int"
    if t.startswith(("float", "double", "halffloat")):
        return "float"
    if t.startswith(("decimal", "hugeint", "int128")):
        return "decimal"
    if t.startswith(("string", "large_string", "varchar", "utf8")):
        return "string"
    if t.startswith(("bool",)):
        return "bool"
    if t.startswith(("timestamp",)):
        return "timestamp"
    if t.startswith(("date",)):
        return "date"
    if t.startswith(("binary", "large_binary", "blob")):
        return "binary"
    if t.startswith(("list", "array")):
        return "array"
    return t


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    qd = REGISTRY[name]
    sdf = qd.fn(spark, SF_DIR)
    scols = sorted(sdf.columns)
    stypes = dict(sdf.dtypes)
    spark_rows = [
        tuple(row[c] for c in scols) for row in sdf.collect()
    ]
    # pinned layers live in the SQL CacheManager until cleared; 317
    # queries in one session would otherwise accumulate 300+ entries
    spark.catalog.clearCache()

    atable = duck.execute(qd.oracle).fetch_arrow_table()
    dtypes = {f.name: str(f.type) for f in atable.schema}
    dcols_full = atable.column_names
    drows_raw = [
        tuple(col[i] for col in cols)
        for cols in [[c.to_pylist() for c in atable.columns]]
        for i in range(atable.num_rows)
    ]
    dcols = sorted(dcols_full)
    idx = [dcols_full.index(c) for c in dcols]
    duck_rows = [tuple(r[i] for i in idx) for r in drows_raw]

    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    type_mismatch = {
        c: (stypes[c], dtypes[c])
        for c in scols
        if _type_kind(stypes[c]) != _type_kind(dtypes[c])
    }
    assert not type_mismatch, (
        f"{name}: Arrow type-family mismatch (driver would hash-fail): "
        f"{type_mismatch}"
    )
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
