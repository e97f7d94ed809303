"""Brute-force twins for the round-9 registry additions.

The new entries' oracles are structural SQL (the same operator family on
the DuckDB side), so these twins pin the SEMANTICS against independent
Python references instead — the same discipline as the r7 metric twins:
an oracle that mirrors the engine's formula proves cross-engine
portability, a brute-force twin proves the formula itself.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from cassandra_analytics_example_spark.queries import load_all


def test_bag_set_ops_match_python_multiset_laws(spark):
    """INTERSECT ALL / EXCEPT ALL against collections.Counter on random
    multisets (heavy duplication): surviving multiplicity must be
    min(m_l, m_r) for the intersection and max(0, m_l - m_r) for the
    difference — the SQL-standard bag laws, checked key by key."""
    rng = np.random.default_rng(20260815)
    left = rng.integers(0, 40, 2000).tolist()
    right = rng.integers(0, 40, 1500).tolist()
    ldf = spark.createDataFrame([(v,) for v in left], ["k"])
    rdf = spark.createDataFrame([(v,) for v in right], ["k"])
    lc, rc = Counter(left), Counter(right)

    got_i = Counter(
        r["k"] for r in ldf.intersectAll(rdf).collect()
    )
    want_i = {k: min(lc[k], rc[k]) for k in lc if min(lc[k], rc[k]) > 0}
    assert got_i == Counter(want_i)

    got_e = Counter(r["k"] for r in ldf.exceptAll(rdf).collect())
    want_e = {k: lc[k] - rc[k] for k in lc if lc[k] - rc[k] > 0}
    assert got_e == Counter(want_e)


def test_native_recursion_agrees_with_closed_form_rollup(spark, sf_dir):
    """Cross-query consistency: q283's native WITH RECURSIVE walk and
    q262's closed-form power-of-10 explode traverse the SAME parent(k) =
    k div 10 tree, so their per-ancestor descendant counts (node < 100)
    must agree exactly — the iterative front end against the closed
    form, neither trusted over the other."""
    reg = load_all()
    native = {
        r["node"]: r["n_desc"]
        for r in reg["q283_recursive_cte_sql"].fn(spark, sf_dir).collect()
    }
    closed = {
        r["node"]: r["n_desc"]
        for r in reg["q262_subtree_rollup"].fn(spark, sf_dir).collect()
    }
    assert native == closed
    # and the depth statistic is internally consistent: parent(k)=k div 10
    # means max_depth of node n equals digits(max descendant) - digits(n)
    depths = {
        r["node"]: r["max_depth"]
        for r in reg["q283_recursive_cte_sql"].fn(spark, sf_dir).collect()
    }
    maxkey = max(
        r["node"] for r in reg["q262_subtree_rollup"].fn(spark, sf_dir)
        .collect()
    )  # bounded: nodes < 100; recompute true max from the part table below
    import os

    import pyarrow.parquet as pq

    pk = pq.read_table(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"]
    )["p_partkey"].to_pylist()
    for node, d in depths.items():
        # deepest descendant of `node` is the longest key with `node` as
        # decimal prefix
        want = max(
            len(str(k)) - len(str(node))
            for k in pk
            if str(k).startswith(str(node))
        )
        assert d == want, (node, d, want)


def test_unpivot_is_exact_inverse_of_pivot_roundtrip(spark):
    """melt(wide) then pivot back must reproduce the wide table exactly
    (the q286/q50 pair as mutual inverses on a synthetic frame)."""
    wide = spark.createDataFrame(
        [(i, i * 2, i * i) for i in range(50)], ["k", "m1", "m2"]
    )
    long = wide.unpivot(["k"], ["m1", "m2"], "measure", "val")
    back = long.groupBy("k").pivot("measure", ["m1", "m2"]).sum("val")
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, wide.collect()))
    assert got == want
