"""Randomized equivalence checks for the candidate-generation operators:
each bucketed/blocked/prefix-filtered join must agree EXACTLY with its
brute-force definition on seeded random data — the property the fixed
oracle corpus cannot probe (its shapes are static). Completeness bugs in
candidate generation (a pair missed by the blocking scheme) are the
silent failure mode of every scale-path operator here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.membership import (
    bloom_build,
    bloom_probe,
)
from cassandra_analytics_example_spark.operators.relational import (
    banded_self_join,
)


def test_banded_self_join_matches_brute_force(spark):
    """Cell-bucketed band join == brute-force |Δv| <= band on random
    values, including cell-boundary pairs and duplicate values."""
    rng = np.random.default_rng(20260813)
    n, band = 800, 50
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            # cluster values so cells are uneven; include exact dupes
            "v": np.sort(rng.integers(0, 4000, n)),
            "grp": rng.integers(0, 3, n),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        banded_self_join(df, "id", "v", band)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    m = pdf.merge(pdf, how="cross", suffixes=("_a", "_b"))
    m = m[(m.id_a < m.id_b) & ((m.v_a - m.v_b).abs() <= band)]
    want = (
        m.assign(delta=(m.v_a - m.v_b).abs())[["id_a", "id_b", "delta"]]
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want), (len(got), len(want))
    assert (got["id_a"].values == want["id_a"].values).all()
    assert (got["id_b"].values == want["id_b"].values).all()
    assert (got["delta"].values == want["delta"].values).all()


def test_bloom_probe_never_false_negative(spark):
    """Bloom property on random member/probe sets: every true member must
    pass; false positives are allowed and counted against the expected
    rate for the (m, k, n) sizing."""
    rng = np.random.default_rng(7)
    members = pd.DataFrame({"k": rng.choice(100_000, 2_000, replace=False)})
    probes = pd.DataFrame({"k": rng.choice(100_000, 5_000, replace=False)})
    mdf = spark.createDataFrame(members)
    pdf = spark.createDataFrame(probes)
    bits = bloom_build(mdf, "k", m=65536, k=3)
    out = bloom_probe(pdf, "k", bits, m=65536, k=3).toPandas()
    member_set = set(members["k"])
    is_member = out["k"].isin(member_set)
    assert out.loc[is_member, "bloom_pass"].all(), "false negative!"
    fp = out.loc[~is_member, "bloom_pass"].mean()
    # fill ratio ~ 1-exp(-k*n/m) ≈ 0.088 → fp ≈ 0.088^3 ≈ 7e-4; allow 10x
    assert fp <= 0.01, f"false-positive rate {fp:.4f} above sizing bound"


def test_overlap_join_matches_brute_force(spark):
    """Prefix-filtered overlap join == brute-force intersection count on
    random small-vocabulary documents (the pigeonhole completeness
    argument, checked empirically)."""
    from cassandra_analytics_example_spark.operators.dedup import overlap_join

    rng = np.random.default_rng(99)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(120):
        sz = rng.integers(5, 35)
        toks = rng.choice(vocab, sz, replace=False)
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    T = 12
    got = {
        (r.id_a, r.id_b): r.overlap
        for r in overlap_join(df, "doc_id", "text", min_overlap=T).collect()
    }
    sets = {i: set(t.split(" ")) for i, t in docs}
    want = {}
    for a in range(120):
        for b in range(a + 1, 120):
            o = len(sets[a] & sets[b])
            if o >= T:
                want[(a, b)] = o
    assert got == want


def test_edit_distance_neardup_within_block_complete(spark):
    """Within a shared (lang, prefix) block, every pair at distance <=
    max_dist must surface with the exact levenshtein value (blocking may
    drop cross-block pairs by design — in-block completeness is the
    contract)."""
    from cassandra_analytics_example_spark.operators.dedup import (
        edit_distance_neardup,
    )

    base = "abcd efgh ijkl mnop qrst uvwx yzab cdef"
    rows = []
    for i in range(30):
        s = list(base)
        # mutate up to 3 positions AFTER the 4-char block prefix
        for _ in range(i % 4):
            s[10 + (i * 7) % 20] = "xyz"[i % 3]
        rows.append((i, "en", "".join(s)))
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    got = {
        (r.id_a, r.id_b): r.lev
        for r in edit_distance_neardup(
            df, "doc_id", "text", block_cols=["lang"], max_dist=8
        ).collect()
    }

    def lev(a, b):
        import itertools

        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    texts = {i: t[:32] for i, _l, t in rows}
    want = {}
    for a in range(30):
        for b in range(a + 1, 30):
            if texts[a][:4] == texts[b][:4]:
                d = lev(texts[a], texts[b])
                if d <= 8:
                    want[(a, b)] = d
    assert got == want
