#!/usr/bin/env python3
"""PROBE_R14_Q21.json: pre-validate the r14 fix for the q21 AQE
mis-coalescing defect WITHOUT editing the operator (the r13 evidence
window is at 48/50, and `_lsh_buckets`/`lsh_candidate_pairs` share a
~14-query void family — the edit itself is scheduled for r14; see
SCALE_PROBE_r13.json `q21_aqe_coalesce_triage.fix_plan_r14`).

The defect (triaged in r13): AQE's BYTE-based partition coalescing
shrinks the band-bucket groupBy exchange to 2-5 tasks because collision
lists are small in bytes but quadratic in compute (in-bucket pair
expansion + Jaccard verification), serializing ~11 s of executor time
per task while 30 cores idle — a 2.5x wall tax at EVERY scale, and the
same byte heuristic would serialize verification identically at 1000
executors.

The planned fix, replicated here by monkeypatching the module globals
the pipeline resolves at call time (tools/ are not fingerprinted, so
this voids nothing):

* ``pin``: ``repartition(width, band, bhash)`` BEFORE the bucket
  groupBy in ``_lsh_buckets`` — REPARTITION_BY_NUM is exempt from AQE
  coalescing, the groupBy rides the explicit exchange
  (ENSURE_REQUIREMENTS satisfied, no second shuffle), and collect_list
  has no map-side combine so the swap is cost-neutral. The quadratic
  explode stage then runs at full width.
* ``pin_spread``: additionally ``spread()`` the candidate frame
  returned by ``lsh_candidate_pairs`` so the shingle-intersect
  verification join cannot ride a coalesced read either.

Per (variant, scale): best-of-2 cache-cold wall, shuffle bytes written
(2nd run), rows out, and an order-insensitive full-value hash
(sum of xxhash64(id_a, id_b, jaccard)) — the fix claim is
RESULT-IDENTITY plus the wall cut, both measured, so r14 can apply the
edit as a verified-plan change instead of a hypothesis.

Scaled fixtures reuse the r13 alphabet-rotation recipe (bijective
char map per copy: intra-copy Jaccard preserved exactly, cross-copy
similarity killed, output pairs exactly linear by construction).

Usage: python tools/probe_r14_q21_pinned_width.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.session import get_spark, spread
from cassandra_analytics_example_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _shuffle_bytes(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm = sc._jvm
    gw = sc._gateway
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    return sum(
        stages.apply(i).shuffleWriteBytes() for i in range(stages.size())
    )


def _build_scaled_docs(spark, base_dir: str, out_dir: str, copies: int):
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    parts = []
    for c in range(copies):
        rot = ALPHA[c:] + ALPHA[:c]
        mangled = F.translate(F.col("text"), ALPHA, rot)
        parts.append(
            docs.select(
                (F.col("doc_id") + c * OFFSET).alias("doc_id"),
                mangled.alias("text"),
                "lang",
                "source",
                F.length(mangled).alias("n_chars"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def _pinned_lsh_buckets(signatures, id_col, num_bands, rows_per_band):
    """r14 candidate: identical banding, width-pinned bucket exchange."""
    bands = []
    for b in range(num_bands):
        lo = b * rows_per_band + 1
        bands.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(",", *[
                        F.element_at("sig", lo + r).cast("string")
                        for r in range(rows_per_band)
                    ])
                ).alias("bhash"),
            )
        )
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*bands)).alias("b")
    ).select(id_col, "b.band", "b.bhash")
    width = signatures.sparkSession.sparkContext.defaultParallelism
    return (
        banded.repartition(width, "band", "bhash")
        .groupBy("band", "bhash")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") > 1)
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBE_R14_Q21.json"
    spark = get_spark(
        app_name="probe-r14-q21",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )

    from cassandra_analytics_example_spark.queries import load_all

    registry = load_all()
    fn = registry["q21_minhash_lsh_neardup"].fn

    orig_buckets = dedup._lsh_buckets
    orig_pairs = dedup.lsh_candidate_pairs

    def spread_pairs(*a, **k):
        return spread(orig_pairs(*a, **k))

    variants = {
        "baseline": {},
        "pin": {"_lsh_buckets": _pinned_lsh_buckets},
        "pin_spread": {
            "_lsh_buckets": _pinned_lsh_buckets,
            "lsh_candidate_pairs": spread_pairs,
        },
    }

    root = tempfile.mkdtemp(prefix="probe_r14_q21_")
    dirs = {"raw_sf0.1": SF_DIR}
    for s in (3, 10):
        d = os.path.join(root, f"x{s}")
        os.makedirs(d, exist_ok=True)
        t0 = time.perf_counter()
        _build_scaled_docs(spark, SF_DIR, d, s)
        print(f"built x{s} in {time.perf_counter()-t0:.1f}s", flush=True)
        dirs[f"x{s}"] = d

    report = {
        "metric": "probe_r14_q21_pinned_width",
        "sf_base": 0.1,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "width": spark.sparkContext.defaultParallelism,
        "variants": {},
        "note": (
            "best-of-2 cache-cold wall + shuffle bytes written (2nd run); "
            "value_hash = sum(xxhash64(id_a, id_b, cast(jaccard as "
            "string))) — order-insensitive full-value identity across "
            "variants is the fix's correctness claim"
        ),
    }

    for vname, patches in variants.items():
        for attr, repl in patches.items():
            setattr(dedup, attr, repl)
        try:
            rec = {}
            for sname, d in dirs.items():
                walls = []
                sb = rows = vhash = None
                for run in range(2):
                    spark.catalog.clearCache()
                    b0 = _shuffle_bytes(spark)
                    t0 = time.perf_counter()
                    df = fn(spark, d)
                    _force(df)
                    walls.append(time.perf_counter() - t0)
                    sb = _shuffle_bytes(spark) - b0
                    if run == 1:
                        agg = df.agg(
                            F.count("*").alias("n"),
                            # decimal(38,0) sum: the session runs ANSI
                            # mode, where a bigint sum of xxhash64
                            # values raises ARITHMETIC_OVERFLOW
                            F.sum(
                                F.xxhash64(
                                    "id_a",
                                    "id_b",
                                    F.col("jaccard").cast("string"),
                                ).cast("decimal(38,0)")
                            ).alias("h"),
                        ).collect()[0]
                        # Decimal -> str for JSON round-trip
                        rows, vhash = agg["n"], str(agg["h"])
                rec[sname] = {
                    "wall_sec": round(min(walls), 3),
                    "shuffle_mb": round(sb / 1e6, 2),
                    "rows": rows,
                    "value_hash": vhash,
                }
                print(
                    f"{vname} {sname}: wall {min(walls):.2f}s "
                    f"shuffle {sb/1e6:.1f}MB rows {rows}",
                    flush=True,
                )
            report["variants"][vname] = rec
        finally:
            dedup._lsh_buckets = orig_buckets
            dedup.lsh_candidate_pairs = orig_pairs

    base = report["variants"]["baseline"]
    for vname in ("pin", "pin_spread"):
        v = report["variants"][vname]
        report["variants"][vname]["result_identical_to_baseline"] = all(
            v[s]["rows"] == base[s]["rows"]
            and v[s]["value_hash"] == base[s]["value_hash"]
            for s in dirs
        )
        report["variants"][vname]["wall_gain"] = {
            s: round(base[s]["wall_sec"] / v[s]["wall_sec"], 2) for s in dirs
        }

    report["loadavg_end"] = round(os.getloadavg()[0], 2)
    shutil.rmtree(root, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
