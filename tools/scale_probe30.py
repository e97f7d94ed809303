#!/usr/bin/env python3
"""30x scale probe for the heaviest compose-ops (VERDICT r6 task 4).

The 10x probe cannot distinguish "super-unity because true pair output
grows super-linearly with copy-count" (legitimate: every copy-group IS a
real near-dup cluster, and pairs per cluster grow quadratically in the
clone count) from "quietly quadratic in corpus size" (a bug). One more
decade decides it: we build x10 and x30 corpora with the SAME copy
methodology as rounds 4-6, and for each op record

  * t10, t30   — best-of-2 wall time (noop sink, same as scale_probe.py)
  * out10/out30 — OUTPUT row counts at each scale

If runtime is linear in corpus + emitted pairs, then
t30/t10 ≈ α·3 + β·(out30/out10) for mixes of scan and pair work, so the
per-output-normalized ratio (t30/t10)/(out30/out10) must be ≤ ~3 — and a
genuinely quadratic corpus term would push t30/t10 toward 9 even with
FLAT output growth. We record both raw and normalized ratios.

Usage: python3 tools/scale_probe30.py [query ...]
Writes SCALE_PROBE_r07.json (section "ops30") at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.queries import load_all
from cassandra_analytics_example_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    os.environ.get("SPARK_GRAFT_SCALE_PROBE_OUT", "SCALE_PROBE_r08.json"),
)
DEFAULT_OPS = [
    "q191_canonical_selection",
    "q205_simhash_eval",
    "q21_minhash_lsh_neardup",
    "q142_substring_dup_spans",
    "q143_pagerank_items",
    "q280_related_items_ppr",
]
ID_STRIDE = 10_000_000


def _union(parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def copy_relational(spark, dst: str, copies: int) -> None:
    """Dims copied unscaled; keyed fact tables unioned with offset keys —
    the copy methodology shared by the 30x probe and its control."""
    for dim in ("customer", "nation", "region", "supplier", "part"):
        spark.read.parquet(f"{BASE}/{dim}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{dim}.parquet")
    for tbl, key in (
        ("lineitem", "l_orderkey"),
        ("orders", "o_orderkey"),
        ("events", "event_id"),
    ):
        t = spark.read.parquet(f"{BASE}/{tbl}.parquet")
        _union(
            [
                t.withColumn(key, F.col(key) + F.lit(i * ID_STRIDE))
                for i in range(copies)
            ]
        ).write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet")


def copy_embeddings_jittered(spark, dst: str, copies: int) -> None:
    """Embeddings unioned with offset ids and a per-copy jitter so copies
    are near- but not exact duplicates — shared by probe and control."""
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    e_parts = []
    for i in range(copies):
        jitter = F.lit(float(i) * 1e-4)
        e_parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * ID_STRIDE)).alias("vec_id"),
                F.transform(
                    F.col("embedding"), lambda x: (x + jitter).cast("float")
                ).alias("embedding"),
                "label",
            )
        )
    _union(e_parts).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )


def merge_section(out_path: str, section: str, results: dict) -> None:
    """Merge a probe section into the (possibly existing) report file."""
    report = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            report = json.load(f)
    report.setdefault("metric", "scale_probe_30x")
    report.setdefault(section, {}).update(results)
    report["loadavg_1min_at_end"] = float(
        open("/proc/loadavg").read().split()[0]
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("merged into", out_path)


def build_scaled(spark, out_dir: str, copies: int) -> None:
    """Same copy methodology as tools/scale_probe.py rounds 4-6: distinct
    per-copy text suffix / embedding jitter / offset keys, dims unscaled."""
    dst = f"{out_dir}/x{copies}"
    copy_relational(spark, dst, copies)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    _union(
        [
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copy{i}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(len(f" copy{i}"))).alias(
                    "n_chars"
                ),
            )
            for i in range(copies)
        ]
    ).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    copy_embeddings_jittered(spark, dst, copies)


def time_op(spark, fn, sf_dir: str, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    registry = load_all()
    spark = get_spark(app_name="scale-probe-30x")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    tmp = tempfile.mkdtemp(prefix="scale_probe30_")
    build_scaled(spark, tmp, 10)
    build_scaled(spark, tmp, 30)

    results = {}
    for name in ops:
        fn = registry[name].fn
        out10 = fn(spark, f"{tmp}/x10").count()
        out30 = fn(spark, f"{tmp}/x30").count()
        t10 = time_op(spark, fn, f"{tmp}/x10")
        t30 = time_op(spark, fn, f"{tmp}/x30")
        raw = round(t30 / t10, 2) if t10 else None
        out_growth = round(out30 / out10, 2) if out10 else None
        results[name] = {
            "t10": t10,
            "t30": t30,
            "ratio_30v10": raw,
            "out10": out10,
            "out30": out30,
            "out_growth": out_growth,
            "ratio_per_output": (
                round(raw / out_growth, 2) if raw and out_growth else None
            ),
        }
        print(name, results[name], flush=True)

    merge_section(OUT, "ops30", results)
    spark.stop()


if __name__ == "__main__":
    main()
