#!/usr/bin/env python3
"""Saturated-regime SimHash probe, round 10 (VERDICT r9 task 1).

The r9 cap probe exposed the recall cliff: at 30x corpus on a saturated
32-bit/4-band blocking with ``max_bucket_size=128``, ALL 1024 collision
buckets were dropped and ``emitted_pairs`` was 0 — runtime stayed linear
but the operator silently deduplicated nothing. Round 10 closed it two
ways; this probe demonstrates both on the exact r9 regime:

* **loud failure** — the same direct ``simhash_near_dup_pairs`` call now
  raises ``SimHashSaturationError`` at action time when the valve drops
  every bucket (x30), instead of returning an empty frame; at x10, where
  269 of 1024 buckets survive, it still emits pairs (partial drops remain
  legitimate valve operation);
* **escalated recovery** — ``simhash_near_dup_pairs_auto`` detects that
  the corpus outgrows the single-band space and escalates to
  piece-combination blocking (``combi_blocking_plan``: 32 bits / hamming 3
  at 150k docs → 8 pieces, C(8,5)=56 tables, 20-bit guaranteed keys), so
  the SAME corpus + cap emits non-zero pairs at x30 with ~corpus-linear
  runtime.

Usage: python3 tools/scale_probe_cap_r10.py
Writes the "simhash_saturation_r10" section of SCALE_PROBE_r10.json.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_analytics_example_spark.operators.dedup import (
    auto_band_width,
    combi_blocking_plan,
    simhash_near_dup_pairs,
    simhash_near_dup_pairs_auto,
)
from cassandra_analytics_example_spark.session import get_spark
from tools.scale_probe30 import merge_section
from tools.scale_probe30_control import build_control

OUT10 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.environ.get("SPARK_GRAFT_CAP_PROBE_OUT", "SCALE_PROBE_r10.json"),
)

N_BITS, N_BANDS, CAP = 32, 4, 128


def run_direct(spark, sf_dir: str) -> dict:
    """The r9 regime verbatim: direct capped call. Returns either the
    emitted-pair count or the loud saturation error."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    t0 = time.time()
    try:
        n_pairs = simhash_near_dup_pairs(
            docs, "doc_id", "text", n_bits=N_BITS, n_bands=N_BANDS,
            max_bucket_size=CAP,
        ).count()
        return {
            "n_docs": n_docs,
            "emitted_pairs": n_pairs,
            "raised": False,
            "run_sec": round(time.time() - t0, 3),
        }
    except Exception as exc:  # the guard surfaces as a Spark runtime error
        head = str(exc).split("\n")[0][:200]
        return {
            "n_docs": n_docs,
            "emitted_pairs": None,
            "raised": "SimHashSaturationError" in str(exc),
            "error_head": head,
            "run_sec": round(time.time() - t0, 3),
        }


def run_auto(spark, sf_dir: str) -> dict:
    """The fixed entry point on the same corpus + cap: escalates blocking."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    width = auto_band_width(n_docs, n_bands=N_BANDS, n_bits=N_BITS)
    plan = combi_blocking_plan(n_docs, n_bits=N_BITS, max_hamming=3)
    t0 = time.time()
    n_pairs = simhash_near_dup_pairs_auto(
        docs, "doc_id", "text", n_bits=N_BITS, n_bands=N_BANDS,
        max_bucket_size=CAP, n_docs=n_docs,
    ).count()
    return {
        "n_docs": n_docs,
        "single_band_width": width,
        "single_band_space": 1 << width,
        "escalated_plan": {"n_pieces": plan[0], "key_bits": plan[1]},
        "emitted_pairs": n_pairs,
        "run_sec": round(time.time() - t0, 3),
    }


def main() -> None:
    spark = get_spark(app_name="scale-probe-saturation-r10")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    tmp = tempfile.mkdtemp(prefix="scale_probe_cap_r10_")
    build_control(spark, tmp, 10)
    build_control(spark, tmp, 30)

    direct10 = run_direct(spark, f"{tmp}/x10")
    direct30 = run_direct(spark, f"{tmp}/x30")
    auto10 = run_auto(spark, f"{tmp}/x10")
    auto30 = run_auto(spark, f"{tmp}/x30")
    ratio = round(auto30["run_sec"] / max(0.001, auto10["run_sec"]), 3)
    results = {
        "settings": {
            "n_bits": N_BITS, "n_bands": N_BANDS, "max_bucket_size": CAP,
            "note": "exact r9 cliff regime: 32-bit/4-band saturates at "
            "8-bit bands, 150k docs swamp the 256-bucket space",
        },
        "direct_x10": direct10,
        "direct_x30": direct30,
        "auto_x10": auto10,
        "auto_x30": auto30,
        "auto_t30_over_t10": ratio,
    }
    # the cliff is now loud: the r9 silent-zero case raises
    assert direct30["raised"] is True, direct30
    # partial-drop regime still works silently (valve, audited)
    assert direct10["raised"] is False and direct10["emitted_pairs"] > 0
    # the escalated path recovers recall at BOTH scales with linear runtime
    assert auto10["emitted_pairs"] > 0, auto10
    assert auto30["emitted_pairs"] > 0, auto30
    assert auto30["emitted_pairs"] >= auto10["emitted_pairs"]
    assert ratio < 6.0, f"escalated run not corpus-linear: {ratio}"
    merge_section(OUT10, "simhash_saturation_r10", results)
    import json

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
