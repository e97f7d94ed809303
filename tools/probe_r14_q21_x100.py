#!/usr/bin/env python3
"""100x leg for the FIXED q21 plan (r13 verdict task 5 stretch).

Extends the r13 alphabet-rotation recipe to 100 copies with four
bijective char-map/text-order families so no cross-copy exact dups
survive the exact-dedup pre-pass:

  family 0 (copies  0-25): translate(alpha -> rot_c(alpha))
  family 1 (copies 26-51): rot + REVERSED text (the r13 30x extension)
  family 2 (copies 52-77): translate(alpha -> rot_c(REVERSED alpha))
  family 3 (copies 78-99): flipped alphabet + reversed text

Char translations preserve intra-copy shingle equality exactly; text
reversal perturbs a handful of borderline pairs across the 0.5
threshold (3 of 30x241 at x30 — the same caveat applies per reversed
family). The claim under test is the fixed plan's WALL exponent, not an
exact output-linearity identity: rows are recorded so the reader can
normalize.

Per scale (x10 / x30 / x100): best-of-2 cache-cold noop wall + rows.
Writes PROBE_R14_Q21_X100.json.
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

from cassandra_analytics_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFFSET = 10_000_000
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _copy_expr(c: int):
    rot = ALPHA[c % 26:] + ALPHA[:c % 26]
    fam = c // 26
    if fam in (2, 3):
        rot = rot[::-1]
    mangled = F.translate(F.col("text"), ALPHA, rot)
    if fam in (1, 3):
        mangled = F.reverse(mangled)
    return mangled


def build(spark, out_dir: str, copies: int) -> None:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = []
    for c in range(copies):
        mangled = _copy_expr(c)
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
    out.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBE_R14_Q21_X100.json"
    spark = get_spark(app_name="probe-r14-q21-x100")
    from cassandra_analytics_example_spark.queries import load_all

    fn = load_all()["q21_minhash_lsh_neardup"].fn
    root = tempfile.mkdtemp(prefix="probe_q21_x100_")
    report = {
        "metric": "probe_r14_q21_x100",
        "sf_base": 0.1,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "legs": {},
        "note": (
            "fixed plan (r14 spread landed); best-of-2 cache-cold noop "
            "wall; 4 bijective copy families (rotation / +reversal / "
            "flipped-alphabet / both) so exact-dedup cannot collapse "
            "copies; reversal families perturb a few borderline pairs "
            "across the 0.5 threshold, so rows are reported for "
            "normalization rather than asserted exactly linear"
        ),
    }
    for copies in (10, 30, 100):
        d = os.path.join(root, f"x{copies}")
        os.makedirs(d, exist_ok=True)
        t0 = time.perf_counter()
        build(spark, d, copies)
        bt = round(time.perf_counter() - t0, 1)
        walls, rows = [], None
        for run in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, d)
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            if run == 1:
                rows = df.count()
        report["legs"][f"x{copies}"] = {
            "wall_sec": round(min(walls), 2),
            "rows": rows,
            "build_sec": bt,
        }
        print(f"x{copies}: wall {min(walls):.2f}s rows {rows}", flush=True)
        shutil.rmtree(d, ignore_errors=True)
    l = report["legs"]
    report["wall_ratio_x100_over_x10"] = round(
        l["x100"]["wall_sec"] / l["x10"]["wall_sec"], 2
    )
    report["loadavg_end"] = round(os.getloadavg()[0], 2)
    shutil.rmtree(root, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
