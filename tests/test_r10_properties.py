"""Round-10 property tests.

1. The SimHash saturated-regime recall cliff (VERDICT r9 task 1):
   * combination blocking (``simhash_near_dup_pairs_combi``) returns the
     SAME pair set as single-band blocking — escalation never changes
     results, only the candidate key space;
   * the escalation ladder (``combi_blocking_plan`` / ``combi_key_bits``)
     is a pure-integer function pinned at its boundaries;
   * ``simhash_near_dup_pairs_auto`` escalates to combination blocking
     when the corpus outgrows the single-band space, still with exact
     results;
   * a capped run whose valve drops EVERY collision bucket raises
     ``SimHashSaturationError`` at action time instead of silently
     returning zero pairs (the r9 probe's x30 regime), and
     ``on_saturation="ignore"`` restores the audited silent-empty path;
   * ``_auto`` refuses PREDICTIVELY (before any Spark work) when even the
     widest affordable plan leaves the mean bucket above the cap.

2. TABLESAMPLE self-standing property test (VERDICT r9 task 5): the q285
   oracle pins constants (cross-engine RNGs make value comparison
   impossible), so the Spark-side properties — exact ROWS count,
   seeded-repeat stability, subset containment, Bernoulli envelope across
   seeds — are asserted here directly, not only via the constant oracle.
"""

import pytest

from cassandra_analytics_example_spark.operators.dedup import (
    SimHashSaturationError,
    auto_band_width,
    combi_blocking_plan,
    combi_key_bits,
    simhash_combi_bucket_stats,
    simhash_near_dup_pairs,
    simhash_near_dup_pairs_auto,
    simhash_near_dup_pairs_combi,
)


def _corpus(spark, n=60):
    """Small corpus with known near-dup structure: 3 clone families whose
    members differ by a one-token mutation (hamming ~6-14 on the 60-bit
    fingerprint at this doc length) plus distinct filler docs. Ground
    truth comes from brute-forcing the fingerprints, so the tests assert
    RECALL, not a guessed pair list."""
    rows = []
    for fam in range(3):
        base = " ".join(f"w{fam}x{i}" for i in range(30))
        rows.append((fam * 2, base))
        rows.append((fam * 2 + 1, base.replace(f"w{fam}x7", "mut")))
    for i in range(6, n):
        rows.append((i, " ".join(f"u{i}y{j}" for j in range(30))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairset(df):
    return {(r.id_a, r.id_b, r.hamming) for r in df.collect()}


def _brute_pairs(spark, docs, max_hamming):
    """All-pairs ground truth straight from the fingerprints."""
    from cassandra_analytics_example_spark.operators.dedup import simhash

    fp = {
        r.doc_id: r.simhash
        for r in simhash(docs, "doc_id", "text", n_bits=60).collect()
        if r.simhash is not None
    }
    ids = sorted(fp)
    return {
        (a, b, bin(fp[a] ^ fp[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fp[a] ^ fp[b]).count("1") <= max_hamming
    }


def test_combi_blocking_matches_single_band(spark):
    """Escalation is result-invariant: combination blocking at several
    piece counts returns exactly the single-band pair set AND the
    brute-force ground truth (same fingerprint, same exact-hamming
    verification, full pigeonhole recall). max_hamming=9 so the one-token
    mutant pairs are in range and pigeonhole is exercised across bands."""
    docs = _corpus(spark)
    truth = _brute_pairs(spark, docs, max_hamming=9)
    assert len(truth) >= 2  # at least some mutant families qualify
    base = _pairset(
        simhash_near_dup_pairs(
            docs, "doc_id", "text", n_bits=60, n_bands=10, max_hamming=9
        )
    )
    assert base == truth
    # combi: k = n_pieces - 9 pieces must agree; 11 pieces -> C(11,2)=55
    # tables of ~10-bit keys
    for n_pieces in (10, 11):
        combi = _pairset(
            simhash_near_dup_pairs_combi(
                docs, "doc_id", "text", n_bits=60, n_pieces=n_pieces,
                max_hamming=9,
            )
        )
        assert combi == truth, n_pieces


def test_combi_key_bits_and_plan_ladder():
    """Pure-integer escalation ladder pinned: key widths grow with piece
    count, the plan picks the smallest sufficient p, and the table budget
    is honored."""
    # 60 bits, hamming 3: p=4 -> 15-bit keys (the single-band cap),
    # p=5 -> 24, p=6 -> 30, p=7 -> 32 (4 narrowest of [9,9,9,9,8,8,8]
    # = 8+8+8+9 = 33)... exact values pinned below.
    assert combi_key_bits(60, 4, 3) == 15
    assert combi_key_bits(60, 5, 3) == 24
    assert combi_key_bits(60, 6, 3) == 30
    assert combi_key_bits(60, 7, 3) == 33
    assert combi_key_bits(60, 8, 3) == 36
    # plan: smallest p whose 2^bits >= N << margin
    assert combi_blocking_plan(5_000) == (4, 15)        # 2^15 >= 20k
    assert combi_blocking_plan(10_000) == (5, 24)       # needs escalation
    assert combi_blocking_plan(4_000_000) == (5, 24)    # 2^24 = 16.7M >= 16M
    assert combi_blocking_plan(5_000_000) == (6, 30)    # 2^24 < 20M <= 2^30
    assert combi_blocking_plan(2_000_000_000) == (7, 33)  # 2^33 = 8.6e9 >= 8e9
    assert combi_blocking_plan(3_000_000_000) == (8, 36)  # 2^36 >= 1.2e10
    # table budget honored: C(7,4)=35 > 30 stops the ladder at p=6
    p, bits = combi_blocking_plan(10**12, max_tables=30)
    assert (p, bits) == (6, 30)
    # widest-affordable fallback still returns a plan past the target
    p, bits = combi_blocking_plan(10**15)
    assert bits == combi_key_bits(60, p, 3)
    with pytest.raises(ValueError, match="max_tables"):
        combi_blocking_plan(100, max_hamming=3, max_tables=3)


def test_auto_escalates_past_single_band_cap(spark):
    """_auto with a corpus size that saturates the single-band space (the
    r9 probe regime: narrow fingerprint, N >> 2^max_width) escalates to
    combination blocking and still returns the exact pair set."""
    docs = _corpus(spark)
    truth = _brute_pairs(spark, docs, max_hamming=3)
    # n_docs=10**6 saturates 60//4=15-bit single bands (2^15 < 4e6):
    # plan -> combination blocking; results must match ground truth.
    escalated = _pairset(
        simhash_near_dup_pairs_auto(
            docs, "doc_id", "text", n_bits=60, n_docs=10**6
        )
    )
    assert escalated == truth


def test_all_buckets_dropped_raises_saturation_error(spark):
    """The zero-recall cliff is LOUD: when max_bucket_size drops every
    collision bucket, the action raises with the audit numbers instead of
    returning an empty frame (r9 probe: x30 emitted 0 pairs, all 1024
    buckets dropped, only the audit knew)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)],
        ["doc_id", "text"],
    )
    capped = simhash_near_dup_pairs(
        docs, "doc_id", "text", max_bucket_size=4
    )
    with pytest.raises(Exception, match="SimHashSaturationError"):
        capped.collect()
    # opt-out restores the audited silent-empty behavior
    assert (
        simhash_near_dup_pairs(
            docs, "doc_id", "text", max_bucket_size=4, on_saturation="ignore"
        ).collect()
        == []
    )
    # same guard on the combination-blocked path
    with pytest.raises(Exception, match="SimHashSaturationError"):
        simhash_near_dup_pairs_combi(
            docs, "doc_id", "text", n_pieces=5, max_bucket_size=4
        ).collect()


def test_partial_drop_does_not_raise(spark):
    """Partial drops are legitimate valve operation: with one oversized
    bucket dropped and another surviving, the capped run succeeds and
    emits the surviving pairs (no false alarm from the guard)."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)]
        + [(5, "one two three four five six seven"),
           (6, "one two three four five six seven")],
        ["doc_id", "text"],
    )
    got = simhash_near_dup_pairs(
        docs, "doc_id", "text", max_bucket_size=4
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(5, 6)}


def test_auto_predictive_refusal():
    """_auto refuses BEFORE any Spark work when even the widest affordable
    combination blocking leaves the mean bucket at/above the cap —
    n_docs >= max_bucket_size << key_bits. No SparkSession needed: the
    raise must happen during planning."""
    with pytest.raises(SimHashSaturationError, match="mean bucket occupancy"):
        simhash_near_dup_pairs_auto(
            None,  # df untouched on the refusal path
            "doc_id",
            "text",
            n_docs=2**40,
            max_bucket_size=8,
            max_tables=30,  # caps the ladder at 30-bit keys
        )
    # same corpus without a cap plans fine (full recall, audited floor)
    p, bits = combi_blocking_plan(2**40, max_tables=30)
    assert bits == 30


def test_combi_bucket_stats_audit(spark):
    """The combi audit twin reports the drop exactly like the single-band
    twin: every bucket of the 5-clone family is oversized and flagged."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(5)],
        ["doc_id", "text"],
    )
    stats = simhash_combi_bucket_stats(
        docs, "doc_id", "text", n_pieces=5, max_bucket_size=4
    ).collect()
    assert stats and all(r.n_ids == 5 and r.dropped and r.n_pairs == 10
                         for r in stats)
    # C(5, 2) = 10 combo tables, one bucket each for identical docs
    assert len(stats) == 10


def test_auto_band_width_unchanged_regression():
    """The r10 escalation must not move the sub-cap auto widths the
    registered queries (and their DuckDB oracle twins) pin."""
    assert auto_band_width(50) == 8
    assert auto_band_width(500) == 11
    assert auto_band_width(5000) == 15
    assert auto_band_width(10**9) == 15


def test_q285_tablesample_properties_self_standing(spark, sf_dir):
    """VERDICT r9 task 5: the q285 oracle pins constants (cross-engine
    RNGs), so the TABLESAMPLE properties are asserted Spark-side here —
    exact ROWS-clause count, and for THREE seeds: seeded-repeat
    stability, subset containment, and the 6-sigma Chernoff envelope on
    the Bernoulli fraction. A regression of the Spark SQL to a
    trivially-true form can no longer hide behind the constant oracle."""
    import math

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cust.createOrReplaceTempView("cust_tsmp_prop_v")
    n_total = cust.count()

    n_rows = spark.sql(
        "SELECT count(*) AS n FROM (SELECT * FROM cust_tsmp_prop_v "
        "TABLESAMPLE (50 ROWS))"
    ).collect()[0].n
    assert n_rows == min(50, n_total)

    for seed in (7, 42, 20260816):
        q = (
            "SELECT c_custkey FROM cust_tsmp_prop_v "
            f"TABLESAMPLE (20 PERCENT) REPEATABLE ({seed})"
        )
        s1 = sorted(r.c_custkey for r in spark.sql(q).collect())
        s2 = sorted(r.c_custkey for r in spark.sql(q).collect())
        assert s1 == s2, f"seed {seed}: not repeat-stable"
        all_keys = {r.c_custkey for r in cust.select("c_custkey").collect()}
        assert set(s1) <= all_keys, f"seed {seed}: not a subset"
        envelope = 6 * math.sqrt(0.16 * n_total) + 8
        assert abs(len(s1) - 0.2 * n_total) <= envelope, (
            f"seed {seed}: sample fraction outside 6-sigma envelope "
            f"({len(s1)} of {n_total})"
        )


def test_combi_pigeonhole_recall_pure():
    """Hypothesis pin of the combination-blocking recall guarantee, pure
    integers (no Spark): for ANY piece count p and ANY pair of 60-bit
    fingerprints within hamming h <= p-1, at least one of the
    C(p, p-h)-piece combination keys matches exactly — the geometry
    invariant ``simhash_near_dup_pairs_combi`` builds its equi-join on.
    Mirrors the Column construction bit-for-bit (shiftright + mask +
    shifted OR over ``_piece_slices``)."""
    import itertools

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cassandra_analytics_example_spark.operators.dedup import (
        _piece_slices,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(0, 2**60 - 1),
        st.integers(4, 9),
        st.data(),
    )
    def check(fp_a, p, data):
        h = data.draw(st.integers(0, p - 1))
        n_flip = data.draw(st.integers(0, h))
        positions = data.draw(
            st.lists(
                st.integers(0, 59), min_size=n_flip, max_size=n_flip,
                unique=True,
            )
        )
        fp_b = fp_a
        for pos in positions:
            fp_b ^= 1 << pos
        slices = _piece_slices(60, p)
        agree = p - h

        def keys(fp):
            out = []
            for combo in itertools.combinations(range(p), agree):
                key, shift = 0, 0
                for pi in combo:
                    s, w = slices[pi]
                    key |= ((fp >> s) & ((1 << w) - 1)) << shift
                    shift += w
                out.append(key)
            return out

        assert any(a == b for a, b in zip(keys(fp_a), keys(fp_b))), (
            p, h, positions,
        )

    check()


def test_piece_slices_tile_exactly():
    """The slices tile the fingerprint with no gap/overlap at every piece
    count, widest-first deterministically."""
    from cassandra_analytics_example_spark.operators.dedup import (
        _piece_slices,
    )

    for n_bits in (32, 60):
        for p in range(1, n_bits + 1):
            sl = _piece_slices(n_bits, p)
            assert len(sl) == p
            pos = 0
            widths = []
            for start, w in sl:
                assert start == pos and w >= 1
                pos += w
                widths.append(w)
            assert pos == n_bits
            assert widths == sorted(widths, reverse=True)
            assert max(widths) - min(widths) <= 1


def test_lsh_and_embedding_all_dropped_raise(spark):
    """The zero-recall guard generalizes to the MinHash band and
    embedding sign-LSH paths (same cliff class as the SimHash probe): a
    capped run whose valve drops EVERY collision bucket raises
    BlockingSaturationError at action time; on_saturation='ignore'
    restores the audited silent-empty behavior."""
    import pytest as _pytest

    from cassandra_analytics_example_spark.operators.dedup import (
        embedding_near_dup_pairs,
        lsh_candidate_pairs,
    )

    # 5 identical signatures: every band bucket has 5 members > cap 4
    sigs = spark.createDataFrame(
        [(i, [7] * 16) for i in range(5)],
        "doc_id bigint, sig array<bigint>",
    )
    with _pytest.raises(Exception, match="BlockingSaturationError"):
        lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=4).collect()
    assert (
        lsh_candidate_pairs(
            sigs, "doc_id", max_bucket_size=4, on_saturation="ignore"
        ).collect()
        == []
    )

    # 5 same-direction vectors: one sign bucket of 5 members > cap 4
    emb = spark.createDataFrame(
        [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(5)],
        "vec_id int, embedding array<float>",
    )
    with _pytest.raises(Exception, match="BlockingSaturationError"):
        embedding_near_dup_pairs(
            emb, threshold=0.9, n_bits=4, max_bucket_size=4
        ).collect()
    assert (
        embedding_near_dup_pairs(
            emb, threshold=0.9, n_bits=4, max_bucket_size=4,
            on_saturation="ignore",
        ).collect()
        == []
    )


def test_saturation_guard_reuses_bucket_shuffle(spark):
    """_guarded_union's cost claim, pinned in the executed plan: the
    guard's audit aggregate and the pair expansion consume ONE shared
    bucket materialization, so the guard costs one bucket-table scan —
    not a second candidate pipeline. Round 11 changed the sharing
    mechanism from AQE exchange reuse (which held here but broke
    canonical matching inside the composed minhash_lsh_dedup plan,
    re-running the signature pipeline — SCALE_PROBE_r11.json) to an
    explicit persist of the bucket frame inside _guarded_union: both
    branches must show an InMemoryTableScan of the bucket cache, and the
    bucket groupBy exchange must appear at most once."""
    from cassandra_analytics_example_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    sigs = spark.createDataFrame(
        [(i, [7] * 16) for i in range(5)]
        + [(9, [8] * 16), (10, [8] * 16)],
        "doc_id bigint, sig array<bigint>",
    )
    df = lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=4)
    df.collect()  # partial drop: guard passes, plan finalizes
    # BOTH union branches must read the bucket cache: at least two
    # InMemoryRelation substitutions in the optimized plan (pair branch +
    # guard branch; >= not == so an unrelated upstream persist entering
    # this lineage later doesn't fail the sharing contract). The banded
    # shuffle then lives only INSIDE the cached plan, which materializes
    # once by construction. (Counting exchanges in the text is
    # misleading: each printed cache block inlines its child plan, so the
    # band exchange "appears" once per branch.)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("InMemoryRelation") >= 2, plan


def test_k_anonymity_audit_semantics(spark):
    """k-anonymity audit unit semantics: classes group by the quasi
    tuple (NULLs form their own class), the report is one row per
    observed class SIZE, risky = size < k, and min_l counts DISTINCT
    non-NULL sensitive values of the worst class of that size."""
    from cassandra_analytics_example_spark.operators.profiling import (
        k_anonymity_audit,
    )

    rows = [
        # class (a,1): size 3, sensitive {10, 10, 20} -> l=2
        ("a", 1, 10), ("a", 1, 10), ("a", 1, 20),
        # class (a,2): size 3, sensitive {10, NULL, NULL} -> l=1
        ("a", 2, 10), ("a", 2, None), ("a", 2, None),
        # class (b,1): size 1 -> risky at k=2
        ("b", 1, 30),
        # class (NULL,1): its own class, size 2, l=2
        (None, 1, 40), (None, 1, 50),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 int, s int")
    got = {
        r["class_size"]: r
        for r in k_anonymity_audit(df, ["q1", "q2"], "s", k=2).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1]["n_classes"] == 1 and got[1]["risky"] is True
    assert got[1]["n_rows"] == 1 and got[1]["min_l"] == 1
    assert got[2]["n_classes"] == 1 and got[2]["risky"] is False
    assert got[2]["min_l"] == 2  # the NULL-quasi class, two balances
    assert got[3]["n_classes"] == 2 and got[3]["n_rows"] == 6
    assert got[3]["min_l"] == 1  # (a,2): NULL sensitive not counted
    import pytest as _pytest
    with _pytest.raises(ValueError, match="quasi_cols"):
        k_anonymity_audit(df, [], "s")
