"""Round-11 guard hardening (r10 ADVICE, high + medium).

The r10 advisor empirically confirmed a silent-optimization hole in the
saturation guard: a consumer that equi-joins or null-filters a
``_guarded_union``-protected frame on its id columns makes Catalyst infer
``IsNotNull`` on the join keys, push it through the union into the guard
branch (whose columns were foldable ``lit(NULL)``), constant-fold the
branch to an empty relation, and delete the ``raise_error`` — restoring
the exact silent zero-recall cliff the guard exists to close. The
flagship ``minhash_lsh_dedup`` (registered q21) hit this in-pipeline: its
own size-prefilter joins stripped the candidate-frame guard.

Fix under test here — the ROOT fix, not a placement change:
``_guarded_union``'s branch columns are built by ``_nonfoldable_null``
(NULL derived from the runtime ``__g`` column), so ConstantFolding
cannot prove them NULL and an inferred ``IsNotNull`` survives as a
runtime filter over the (zero-row, or raising) guard branch — for ANY
downstream consumer, in-repo or user-written. The guard therefore stays
in its original in-generator position inside ``lsh_candidate_pairs``
(an end-of-pipeline re-derivation was implemented and then REJECTED on
measurement: its bucket lineage stopped matching canonically inside the
composed minhash plan and the signature pipeline ran twice — 1.24x,
SCALE_PROBE_r11.json; the shipped form shares the bucket frame via an
explicit persist, 1.065x).

Every assertion pattern here was first confirmed by hand on this tree
(Spark 4.1.2): pre-fix, the JOIN/FILTER plans contained no raise_error
and collect() returned 0 rows silently; post-fix they raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.dedup import (
    connected_components,
    dedup_keep_list,
    embedding_near_dup_pairs,
    lsh_candidate_pairs,
    minhash_lsh_dedup,
    simhash_near_dup_pairs,
)

# 6 DISTINCT texts sharing a long common base: they survive the exact-dedup
# pre-pass, and their shingle sets overlap enough that every MinHash band
# has collision buckets (deterministic: md5-based signatures). With
# max_bucket_size=1 every collision bucket (size >= 2 by construction) is
# dropped -> guaranteed saturation whenever ANY band collision exists.
_BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _near_dup_docs(spark):
    return spark.createDataFrame(
        [(i, _BASE + f" unique{i}") for i in range(6)], ["doc_id", "text"]
    )


def _saturated_sigs(spark):
    # 5 identical signatures: every band bucket has 5 members > cap 4
    return spark.createDataFrame(
        [(i, [7] * 16) for i in range(5)],
        "doc_id bigint, sig array<bigint>",
    )


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_minhash_lsh_dedup_raises_through_full_pipeline(spark):
    """The r10 advisor's exact repro, inverted: with every collision
    bucket dropped, minhash_lsh_dedup (q21's operator) raises at action
    time instead of returning 0 rows, and raise_error survives the
    optimizer despite the pipeline's internal id_a/id_b inner joins."""
    d = minhash_lsh_dedup(
        _near_dup_docs(spark), "doc_id", "text", max_bucket_size=1
    )
    assert "raise_error" in _optimized(d)
    with pytest.raises(Exception, match="BlockingSaturationError"):
        d.collect()
    # opt-out restores the audited silent-empty path
    assert (
        minhash_lsh_dedup(
            _near_dup_docs(spark), "doc_id", "text",
            max_bucket_size=1, on_saturation="ignore",
        ).collect()
        == []
    )


def test_minhash_lsh_dedup_healthy_run_unaffected(spark):
    """The end-guard adds zero rows and no NULL contamination on a
    healthy (uncapped-bucket) run: all C(6,2) near-dup pairs of the
    common-base corpus come back, ids non-null."""
    rows = minhash_lsh_dedup(
        _near_dup_docs(spark), "doc_id", "text",
        max_bucket_size=1000, jaccard_threshold=0.5,
    ).collect()
    assert len(rows) == 15
    assert all(r.id_a is not None and r.jaccard is not None for r in rows)


def test_guard_survives_join_and_null_filter_consumers(spark):
    """The medium r10 finding: ANY consumer equi-joining or null-filtering
    a guarded frame previously folded the guard away. With
    _nonfoldable_null branch columns, raise_error stays in the OPTIMIZED
    plan and fires at action time under both consumer shapes."""
    cands = lsh_candidate_pairs(
        _saturated_sigs(spark), "doc_id", max_bucket_size=4
    )

    other = spark.createDataFrame([(0,), (1,)], "id_a bigint")
    joined = cands.join(other, "id_a")
    assert "raise_error" in _optimized(joined)
    with pytest.raises(Exception, match="BlockingSaturationError"):
        joined.collect()

    filtered = cands.filter(F.col("id_a").isNotNull())
    assert "raise_error" in _optimized(filtered)
    with pytest.raises(Exception, match="BlockingSaturationError"):
        filtered.collect()


def test_guard_survives_in_repo_compositions(spark):
    """Every in-repo consumer of a guarded pair frame keeps the raise:
    connected_components over saturated MinHash candidates and over
    saturated SimHash pairs, and the end-to-end dedup_keep_list (which
    composes minhash_lsh_dedup -> connected_components -> anti-join)."""
    cands = lsh_candidate_pairs(
        _saturated_sigs(spark), "doc_id", max_bucket_size=4
    )
    with pytest.raises(Exception, match="BlockingSaturationError"):
        connected_components(cands).collect()

    sh_pairs = simhash_near_dup_pairs(
        spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)],
            ["doc_id", "text"],
        ),
        "doc_id", "text", max_bucket_size=4,
    )
    with pytest.raises(Exception, match="SimHashSaturationError"):
        connected_components(sh_pairs).collect()

    with pytest.raises(Exception, match="BlockingSaturationError"):
        dedup_keep_list(
            _near_dup_docs(spark), "doc_id", "text", max_bucket_size=1
        ).collect()


def test_embedding_guard_survives_join_consumer(spark):
    """Same hardening on the sign-LSH path: a saturated
    embedding_near_dup_pairs frame joined on id_a still raises."""
    emb = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(5)],
        "vec_id int, embedding array<float>",
    )
    e = embedding_near_dup_pairs(
        emb, threshold=0.9, n_bits=4, max_bucket_size=4
    )
    j = e.join(spark.createDataFrame([(0,), (1,)], "id_a int"), "id_a")
    assert "raise_error" in _optimized(j)
    with pytest.raises(Exception, match="BlockingSaturationError"):
        j.collect()


# ---------------------------------------------------------------------------
# r10 verdict task 4: the blocked-but-uncapped generators. Rarest-gram
# blocking (token_jaccard_pairs / token_containment_pairs), prefix-posting
# blocking (overlap_join), and prefix blocking (edit_distance_neardup) had
# no max-size valve, so a degenerate corpus (one universal "rare" gram /
# shared prefix) silently regrows a quadratic block — the inverse failure
# mode of the saturation cliff fixed in r10. Each now takes an optional
# cap with the same valve + loud-saturation contract; default None keeps
# registered behavior byte-identical (q22/q87/q104/q118 uncapped).
# ---------------------------------------------------------------------------


def _degenerate_docs(spark, n=5):
    # byte-identical docs: every doc's rarest grams are the same grams,
    # the shared prefix is the same prefix — one block of n everywhere.
    return spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(n)],
        ["doc_id", "text"],
    )


def test_token_jaccard_cap_saturation_raises_and_partial_drop_ok(spark):
    from cassandra_analytics_example_spark.operators.dedup import (
        token_jaccard_pairs,
    )

    sat = token_jaccard_pairs(
        _degenerate_docs(spark), "doc_id", "text", max_block_size=4
    )
    with pytest.raises(Exception, match="BlockingSaturationError"):
        sat.collect()
    assert (
        token_jaccard_pairs(
            _degenerate_docs(spark), "doc_id", "text",
            max_block_size=4, on_saturation="ignore",
        ).collect()
        == []
    )
    # partial drop: a small healthy family survives alongside the dropped
    # degenerate block -> no false alarm, its pairs emitted
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(5)]
        + [(10, "one two three four five six seven eight"),
           (11, "one two three four five six seven eight")],
        ["doc_id", "text"],
    )
    got = token_jaccard_pairs(
        docs, "doc_id", "text", max_block_size=4
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(10, 11)}


def test_token_containment_cap_saturation_raises(spark):
    from cassandra_analytics_example_spark.operators.dedup import (
        token_containment_pairs,
    )

    with pytest.raises(Exception, match="BlockingSaturationError"):
        token_containment_pairs(
            _degenerate_docs(spark), "doc_id", "text", max_block_size=4
        ).collect()
    assert (
        token_containment_pairs(
            _degenerate_docs(spark), "doc_id", "text",
            max_block_size=4, on_saturation="ignore",
        ).collect()
        == []
    )


def test_overlap_join_cap_saturation_raises_and_uncapped_identical(spark):
    from cassandra_analytics_example_spark.operators.dedup import (
        overlap_join,
    )

    with pytest.raises(Exception, match="BlockingSaturationError"):
        overlap_join(
            _degenerate_docs(spark), "doc_id", "text",
            min_overlap=3, max_posting_size=4,
        ).collect()
    # a generous cap is result-identical to the uncapped historical path
    # (the posting filter only ever removes singleton postings)
    uncapped = {
        (r.id_a, r.id_b, r.overlap)
        for r in overlap_join(
            _degenerate_docs(spark), "doc_id", "text", min_overlap=3
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b, r.overlap)
        for r in overlap_join(
            _degenerate_docs(spark), "doc_id", "text",
            min_overlap=3, max_posting_size=1000,
        ).collect()
    }
    assert uncapped == capped and len(uncapped) == 10


def test_edit_distance_cap_saturation_raises_and_partial_drop_ok(spark):
    from cassandra_analytics_example_spark.operators.dedup import (
        edit_distance_neardup,
    )

    # all 5 docs share the first 4 chars -> one prefix block of 5 > cap 4
    with pytest.raises(Exception, match="BlockingSaturationError"):
        edit_distance_neardup(
            _degenerate_docs(spark), "doc_id", "text", max_block_size=4
        ).collect()
    assert (
        edit_distance_neardup(
            _degenerate_docs(spark), "doc_id", "text",
            max_block_size=4, on_saturation="ignore",
        ).collect()
        == []
    )
    # healthy second block survives the valve
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(5)]
        + [(10, "zeta one two"), (11, "zeta one two")],
        ["doc_id", "text"],
    )
    got = edit_distance_neardup(
        docs, "doc_id", "text", max_block_size=4
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(10, 11)}


def test_capped_error_path_widens_nullability_documented(spark):
    """r11 ADVICE (documented in the dedup module docstring's capped-path
    contract): the guarded union's zero-row NULL branch makes every
    output column nullable, while uncapped results keep the source
    nullability. Pinned here so a guard rework that silently changes the
    schema contract fails a test, not a consumer's required-field write."""
    from cassandra_analytics_example_spark.operators.dedup import (
        token_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(3)]
        + [(10, "one two three four five six seven eight"),
           (11, "one two three four five six seven eight")],
        ["doc_id", "text"],
    ).withColumn("doc_id", F.col("doc_id").cast("bigint"))

    capped = token_jaccard_pairs(docs, "doc_id", "text", max_block_size=4)
    assert all(f.nullable for f in capped.schema.fields), capped.schema
    # uncapped: the id columns ride the non-null source ids through the
    # verification equi-join — no guard branch, no widening
    uncapped = token_jaccard_pairs(docs, "doc_id", "text")
    assert not uncapped.schema["id_a"].nullable
    assert not uncapped.schema["id_b"].nullable
