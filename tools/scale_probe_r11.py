#!/usr/bin/env python3
"""Round-11 mechanism probes (VERDICT r10 task 7: scale probe on any
mechanism-level change). Three sections, merged into SCALE_PROBE_r11.json:

* ``guard_overhead_r11`` — re-measure the saturation-guard cost after the
  round-11 hardening (non-foldable NULL branch columns via
  ``_nonfoldable_null`` + END-of-pipeline placement in
  ``minhash_lsh_dedup``): guarded vs ``on_saturation="ignore"`` best-of-3
  cache-cold at sf0.1. r10 measured 1.05x for the (fold-away-prone)
  candidate-frame guard; the hardened guard must stay in that band.

* ``new_cap_overhead_r11`` — the four generators that gained the
  cap+guard valve this round (rarest-gram jaccard, containment,
  prefix-posting overlap, prefix edit-distance) measured capped-generous
  (valve active, nothing dropped, guard armed) vs historical uncapped at
  sf0.01: the valve's bookkeeping must be noise-level when it never fires
  (read ABSOLUTE deltas — fixed stages on sub-second baselines).

* ``pagerank_shape_r11`` — the rewritten ``pagerank_integer`` (window
  out-degree in one cached (src,dst,outdeg) table, per-edge quota) timed
  at sf0.01 vs sf0.1 (10x lineitem): growth should stay ~linear-ish in
  edge count, pinning that the per-iteration savings did not trade away
  scale behavior.

* ``cap_growth_r11`` — the valve's reason-for-being, measured: a
  degenerate shared-prefix corpus grown 4x reads ~16x uncapped
  (quadratic block) vs ~2x capped (block dropped, healthy families
  still paired).

Usage: python3 tools/scale_probe_r11.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.dedup import (
    edit_distance_neardup,
    minhash_lsh_dedup,
    overlap_join,
    token_containment_pairs,
    token_jaccard_pairs,
)
from cassandra_analytics_example_spark.operators.graph import (
    pagerank_integer,
)
from cassandra_analytics_example_spark.session import get_spark
from tools.scale_probe30 import merge_section

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALE_PROBE_r11.json",
)
SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"


def best_of(spark, build, n=3) -> float:
    best = float("inf")
    for _ in range(n):
        spark.catalog.clearCache()
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def probe_guard(spark) -> dict:
    guarded = best_of(
        spark,
        lambda: minhash_lsh_dedup(
            docs(spark, SF01), "doc_id", "text", max_bucket_size=1000
        ),
    )
    unguarded = best_of(
        spark,
        lambda: minhash_lsh_dedup(
            docs(spark, SF01), "doc_id", "text", max_bucket_size=1000,
            on_saturation="ignore",
        ),
    )
    return {
        "query_shape": "minhash_lsh_dedup sf0.1, max_bucket_size=1000, "
        "best-of-3 cache-cold",
        "guarded_sec": guarded,
        "unguarded_sec": unguarded,
        "overhead_ratio": round(guarded / max(0.001, unguarded), 3),
        "note": "r11 hardened guard: non-foldable NULL branch columns + "
        "explicit persist of the bucket frame inside _guarded_union. "
        "History: r10's 1.05x was measured with the guard silently "
        "folded away inside minhash (the ADVICE bug) - the true cost was "
        "never measured; an end-of-pipeline re-derivation measured 1.24x "
        "(signature pipeline ran twice - ReuseExchange canonical match "
        "broke inside the composed plan); the persist makes the sharing "
        "deterministic",
        "loadavg": float(open("/proc/loadavg").read().split()[0]),
    }


def probe_new_caps(spark) -> dict:
    # sf0.01: the UNCAPPED baselines are the quadratic-hazard paths the
    # caps exist for — at sf0.1 the prefix-block baseline itself blows up
    # (which is the point of the valve, but makes a timed baseline
    # useless); the valve's bookkeeping overhead is scale-independent.
    d = docs(spark, SF001)
    cases = {
        "token_jaccard": (
            lambda: token_jaccard_pairs(d, "doc_id", "text"),
            lambda: token_jaccard_pairs(
                d, "doc_id", "text", max_block_size=100000
            ),
        ),
        "token_containment": (
            lambda: token_containment_pairs(d, "doc_id", "text"),
            lambda: token_containment_pairs(
                d, "doc_id", "text", max_block_size=100000
            ),
        ),
        "overlap_join": (
            lambda: overlap_join(d, "doc_id", "text", min_overlap=8),
            lambda: overlap_join(
                d, "doc_id", "text", min_overlap=8,
                max_posting_size=100000,
            ),
        ),
        "edit_distance": (
            lambda: edit_distance_neardup(d, "doc_id", "text"),
            lambda: edit_distance_neardup(
                d, "doc_id", "text", max_block_size=100000
            ),
        ),
    }
    out = {}
    for name, (uncapped, capped) in cases.items():
        tu = best_of(spark, uncapped)
        tc = best_of(spark, capped)
        out[name] = {
            "uncapped_sec": tu,
            "capped_guarded_sec": tc,
            "overhead_ratio": round(tc / max(0.001, tu), 3),
        }
    out["note"] = (
        "cap generous (100k) so the valve is armed but never drops; "
        "overhead = valve bookkeeping + armed guard, sf0.01 documents, "
        "best-of-3 cache-cold"
    )
    out["loadavg"] = float(open("/proc/loadavg").read().split()[0])
    return out


def probe_pagerank(spark) -> dict:
    def ranks(sf_dir):
        def build():
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            baskets = li.groupBy("l_orderkey").agg(
                F.collect_set("l_partkey").alias("ps")
            )
            edges = (
                baskets.select(F.explode("ps").alias("src"), "ps")
                .select("src", F.explode("ps").alias("dst"))
                .where(F.col("src") != F.col("dst"))
                .select("src", "dst")
                .distinct()
            )
            return pagerank_integer(edges, iterations=5)

        return build

    t001 = best_of(spark, ranks(SF001))
    t01 = best_of(spark, ranks(SF01))
    return {
        "sf0.01_sec": t001,
        "sf0.1_sec": t01,
        "t10x_over_t1x": round(t01 / max(0.001, t001), 3),
        "note": "10x lineitem -> ~10x edges; ratio well under 10 means "
        "fixed per-iteration stage overhead still dominates at sf0.1 "
        "(amortizes at scale); the rewrite is one cached "
        "(src,dst,outdeg) table + per-edge quota (oracle's formulation)",
        "loadavg": float(open("/proc/loadavg").read().split()[0]),
    }


def probe_cap_growth(spark) -> dict:
    """Degenerate-corpus growth for the new edit-distance valve: a corpus
    with ONE shared-prefix family of size N (plus N healthy two-member
    families) makes the uncapped prefix self-join do N^2/2 comparisons —
    4x corpus => ~16x work — while the capped run drops that block and
    scales with the healthy families only. This is the quadratic blowup
    the r10 verdict's task-4 valve exists to prevent, measured."""
    import time as _t

    def corpus(n):
        rows = [(i, "HDR common boilerplate line %d" % (i % 7),) for i in range(n)]

        def code(j):
            # 3-letter base-26 code + trailing space = a UNIQUE 4-char
            # prefix per family (block_prefix=4). The first version used
            # f"fam{j}", which made every digit-family collide into the
            # "fam1"/"fam2"... blocks and get DROPPED by the cap — the
            # capped leg then measured fixed overhead, not healthy-pair
            # preservation (caught in round-11 self-review).
            a, b, c = j % 26, (j // 26) % 26, (j // 676) % 26
            return chr(97 + c) + chr(97 + b) + chr(97 + a)

        rows += [
            (10_000_000 + 2 * j + k, f"{code(j)} text body {k}")
            for j in range(n)
            for k in range(2)
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    from cassandra_analytics_example_spark.operators.dedup import (
        edit_distance_neardup,
    )

    out = {}
    for n in (1000, 4000):
        d = corpus(n)
        t0 = _t.time()
        edit_distance_neardup(d, "doc_id", "text").write.format(
            "noop"
        ).mode("overwrite").save()
        t_uncapped = round(_t.time() - t0, 3)
        t0 = _t.time()
        capped = edit_distance_neardup(d, "doc_id", "text", max_block_size=100)
        n_capped_pairs = capped.count()
        t_capped = round(_t.time() - t0, 3)
        # the capped run must PRESERVE the healthy families' pairs (one
        # per 2-member family), not just run fast because everything was
        # dropped — recorded so the artifact proves the claim it makes.
        out[f"x{n}"] = {
            "uncapped_sec": t_uncapped,
            "capped_sec": t_capped,
            "capped_pairs": n_capped_pairs,
            "healthy_families": n,
        }
    u1, u4 = out["x1000"]["uncapped_sec"], out["x4000"]["uncapped_sec"]
    c1, c4 = out["x1000"]["capped_sec"], out["x4000"]["capped_sec"]
    out["uncapped_t4x_over_t1x"] = round(u4 / max(0.001, u1), 2)
    out["capped_t4x_over_t1x"] = round(c4 / max(0.001, c1), 2)
    out["note"] = (
        "one shared-4-char-prefix family of size N + N healthy 2-member "
        "families; uncapped growth should read ~quadratic (16x work at "
        "4x corpus), capped ~flat/linear (degenerate block dropped, "
        "healthy pairs still emitted)"
    )
    out["loadavg"] = float(open("/proc/loadavg").read().split()[0])
    return out


def main() -> None:
    spark = get_spark(app_name="scale-probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    merge_section(OUT, "guard_overhead_r11", probe_guard(spark))
    merge_section(OUT, "new_cap_overhead_r11", probe_new_caps(spark))
    merge_section(OUT, "pagerank_shape_r11", probe_pagerank(spark))
    merge_section(OUT, "cap_growth_r11", probe_cap_growth(spark))
    spark.stop()


if __name__ == "__main__":
    main()
