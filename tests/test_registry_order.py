"""Evidence-aware registry ordering (no Spark needed — pure Python).

The per-round driver samples roughly the first 50 entries of ``queries()``
in dict order for its CORRECTNESS gate.  ``load_all()`` therefore orders the
registry by verification evidence: queries with no driver-green row in any
``CORRECTNESS_r*.json`` come first, then least-recently-verified.  These
tests pin that contract against synthetic evidence records so a refactor
can't silently push unverified queries back out of the driver's window.
"""

from __future__ import annotations

from cassandra_analytics_example_spark.queries import (
    REGISTRY,
    _evidence_order,
    _verification_round,
    load_all,
)


def test_verification_round_green_row():
    rec = {"a": (2, {"hash_match": True})}
    assert _verification_round("a", True, rec) == 2


def test_verification_round_never_checked():
    assert _verification_round("zzz", True, {}) == -1


def test_verification_round_red_row_does_not_count():
    rec = {"a": (2, {"hash_match": False, "err": "boom"})}
    assert _verification_round("a", True, rec) == -1


def test_rows_only_green_counts_only_without_oracle():
    rec = {"s": (1, {"err": "no_oracle", "spark_rows": 5})}
    # streaming-style query (no oracle): rows-only row is evidence
    assert _verification_round("s", False, rec) == 1
    # oracle-declaring query: needs a hash-green row, rows-only is stale
    assert _verification_round("s", True, rec) == -1


def test_load_all_puts_unverified_first():
    """Every query the committed CORRECTNESS artifacts never hash-verified
    must appear before every query with green evidence — the unverified
    set can exceed one round's ~50-entry driver window (new queries keep
    registering), but no VERIFIED query may sit ahead of an unverified
    one and consume a window slot."""
    ordered = list(load_all())
    assert len(ordered) == len(REGISTRY)
    idx = {n: i for i, n in enumerate(ordered)}
    # q01 was green in both committed rounds; every never-verified query
    # must precede it
    for name in ("q41_dedup_clusters", "q85_training_pipeline_e2e",
                 "s09_stream_foreach_batch_upsert", "q76_forget_propagation"):
        assert idx[name] < idx["q01_pricing_summary"], (
            f"{name} at {idx[name]} behind verified q01 at "
            f"{idx['q01_pricing_summary']}"
        )
    # and the verified block sits wholly behind the unverified block:
    # q01 cannot occupy an early-window slot while any unverified waits
    n_unverified = sum(
        1 for n in ordered if idx[n] < idx["q01_pricing_summary"]
    )
    assert idx["q01_pricing_summary"] >= n_unverified


def test_evidence_order_is_stable_for_ties():
    names = [n for n in REGISTRY][:10]
    once = _evidence_order(names)
    twice = _evidence_order(names)
    assert once == twice
