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
    must appear before every query with green evidence."""
    ordered = list(load_all())
    assert len(ordered) == len(REGISTRY)
    # q01 was green in both committed rounds; it must not occupy the window
    idx = {n: i for i, n in enumerate(ordered)}
    assert idx["q01_pricing_summary"] > 45
    # the round-2 audit's unverified set must sit inside the ~50-entry window
    for name in ("q41_dedup_clusters", "q85_training_pipeline_e2e",
                 "s09_stream_foreach_batch_upsert", "q76_forget_propagation"):
        assert idx[name] < 45, f"{name} at {idx[name]} — outside driver window"


def test_evidence_order_is_stable_for_ties():
    names = [n for n in REGISTRY][:10]
    once = _evidence_order(names)
    twice = _evidence_order(names)
    assert once == twice
