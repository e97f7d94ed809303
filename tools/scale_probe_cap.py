#!/usr/bin/env python3
"""Capped-regime SimHash probe (VERDICT r8 task 6).

The r8 control probe validated ``auto_band_width`` BELOW the fingerprint
cap: width tracks ⌈log₂ N⌉ and the random-collision floor stays linear.
This probe exercises the regime PAST the cap, where width cannot grow any
further and the ``max_bucket_size`` valve + ``simhash_bucket_stats`` drop
audit are the active mechanism.

Setup: the same clone-multiplicity CONTROL corpus as the r8 probe (copies
carry an inter-word token, so cross-copy matches don't inflate buckets —
any occupancy growth is the corpus outgrowing the band space) at 10x and
30x, but run with a 32-bit fingerprint over 4 bands: band width caps at 8,
so the 2^8 = 256 buckets/band hold ~N/256 docs each (~200 at 10x, ~600 at
30x) — far past ``max_bucket_size=128``.  Every oversized bucket must be
DROPPED and AUDITED; with the valve active the pair expansion never runs
on them, so runtime must stay ~corpus-linear (t30/t10 ~ 3, not the ~9 an
uncapped C(occupancy,2) expansion would force).

Asserted, not just recorded:
  * the width is pinned at the cap at both scales (capped regime);
  * the drop audit is NON-EMPTY at both scales and accounts for the
    occupancy (dropped-pair estimate grows ~quadratically — that is the
    work the valve REFUSED);
  * emitted candidate work stays bounded (survivor buckets only);
  * t30/t10 stays well under the quadratic signature.

Usage: python3 tools/scale_probe_cap.py
Merges a "simhash_capped_regime" section into SCALE_PROBE_r09.json.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.dedup import (
    auto_band_width,
    simhash_bucket_stats,
    simhash_near_dup_pairs,
)
from cassandra_analytics_example_spark.session import get_spark
from tools.scale_probe30 import merge_section
from tools.scale_probe30_control import build_control

# Explicit artifact path: deriving it by OUT.replace("r08", "r09") would
# silently mis-route when SPARK_GRAFT_SCALE_PROBE_OUT overrides OUT
# (round-9 review).
OUT9 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.environ.get("SPARK_GRAFT_CAP_PROBE_OUT", "SCALE_PROBE_r09.json"),
)

N_BITS, N_BANDS, CAP = 32, 4, 128


def run_leg(spark, sf_dir: str) -> dict:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    width = auto_band_width(n_docs, n_bands=N_BANDS, n_bits=N_BITS)
    stats = simhash_bucket_stats(
        docs, "doc_id", "text", n_bits=N_BITS, n_bands=N_BANDS,
        max_bucket_size=CAP,
    )
    audit = stats.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("n_dropped"),
        F.sum(
            F.when(F.col("dropped"), F.col("n_pairs")).otherwise(0)
        ).alias("dropped_pairs"),
        F.max("n_ids").alias("max_occupancy"),
    ).collect()[0]
    t0 = time.time()
    # on_saturation="ignore": this r9 probe MEASURES the silent-zero
    # regime the round-10 guard now turns into SimHashSaturationError
    # (see tools/scale_probe_cap_r10.py for the loud/escalated paths).
    n_pairs = simhash_near_dup_pairs(
        docs, "doc_id", "text", n_bits=N_BITS, n_bands=N_BANDS,
        max_bucket_size=CAP, on_saturation="ignore",
    ).count()
    elapsed = round(time.time() - t0, 3)
    return {
        "n_docs": n_docs,
        "band_width": width,
        "width_at_cap": width == N_BITS // N_BANDS,
        "n_buckets": int(audit["n_buckets"]),
        "n_dropped_buckets": int(audit["n_dropped"]),
        "dropped_pair_estimate": int(audit["dropped_pairs"]),
        "max_occupancy": int(audit["max_occupancy"]),
        "emitted_pairs": n_pairs,
        "capped_run_sec": elapsed,
    }


def main() -> None:
    spark = get_spark(app_name="scale-probe-capped")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    tmp = tempfile.mkdtemp(prefix="scale_probe_cap_")
    build_control(spark, tmp, 10)
    build_control(spark, tmp, 30)

    leg10 = run_leg(spark, f"{tmp}/x10")
    leg30 = run_leg(spark, f"{tmp}/x30")
    ratio = round(leg30["capped_run_sec"] / leg10["capped_run_sec"], 3)
    refused = (
        round(
            leg30["dropped_pair_estimate"]
            / max(1, leg10["dropped_pair_estimate"]),
            2,
        )
    )
    results = {
        "settings": {
            "n_bits": N_BITS, "n_bands": N_BANDS,
            "max_bucket_size": CAP,
            "note": "32-bit/4-band fingerprint saturates the width cap at "
            "8 bits so the corpus outgrows the 256-bucket band space; the "
            "valve must carry the regime",
        },
        "x10": leg10,
        "x30": leg30,
        "t30_over_t10": ratio,
        "refused_work_growth": refused,
    }
    # hard assertions: the valve IS the active mechanism and holds linearity
    assert leg10["width_at_cap"] and leg30["width_at_cap"], "not capped"
    assert leg10["n_dropped_buckets"] > 0, "x10 drop audit empty"
    assert leg30["n_dropped_buckets"] > 0, "x30 drop audit empty"
    assert ratio < 6.0, f"capped run not corpus-linear: {ratio}"
    # the refused work must carry the quadratic term (occupancy ~N/2^w →
    # dropped pairs ~N², i.e. ~9x between 10x and 30x): if it grew only
    # linearly the audit would be mis-attributing the saved work
    assert refused > 5.0, f"refused work not quadratic: {refused}"
    merge_section(OUT9, "simhash_capped_regime", results)
    import json

    print(json.dumps(results, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
