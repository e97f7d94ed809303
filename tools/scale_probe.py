#!/usr/bin/env python3
"""10x scale probe: measure each operator at 1x and 10x content and record
the runtime ratio — the sub-quadratic-growth gate behind SCALE_PROBE_r*.json.

Methodology (kept identical to the round-4/5 probes so ratios are
comparable): the 10x corpus is built by unioning ten DISTINCT copies —
documents get a per-copy text suffix (so exact-dedup pre-passes see 10x
distinct content, not one collapsed copy) and offset doc_ids; embeddings get
a per-copy deterministic jitter and offset vec_ids. Ratio ~<= 10 means
at-most-linear growth; sub-1 ratios are the fixed per-query floor
(~0.3-0.7s of scheduler/codegen) amortizing. The signal is the ABSENCE of
super-linear growth, not the exact number — pair-emitting dedup ops can
legitimately exceed 10x when the scaled corpus contains genuinely more true
pairs (each copy-group is a real near-dup cluster; see SCALE_PROBE_r05
note on q21).

Usage: python3 tools/scale_probe.py [query ...]   (default: round-5 new ops)
Merges results into SCALE_PROBE_r05.json at the repo root.
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
    os.environ.get("SPARK_GRAFT_PROBE_OUT", "SCALE_PROBE_r07.json"),
)
# Round-7 default: every batch query never probed in r4-r6 — closes 10x
# probe coverage to the full batch registry (281/281). Computed as
# registry batch names minus the union of SCALE_PROBE_r0{4,5,6}.json ops.
DEFAULT_OPS = "UNPROBED"


def unprobed_ops(registry) -> list:
    """Batch registry entries absent from every prior probe file."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen = set()
    for fname in (
        "SCALE_PROBE_r04.json",
        "SCALE_PROBE_r05.json",
        "SCALE_PROBE_r06.json",
    ):
        path = os.path.join(root, fname)
        if os.path.exists(path):
            with open(path) as f:
                seen |= set(json.load(f).get("ops", {}))
    return [n for n in registry if n.startswith("q") and n not in seen]
COPIES = 10
ID_STRIDE = 10_000_000


def build_scaled(spark, out_dir: str) -> None:
    # Dimension tables ride along unscaled at both scales: fact growth is
    # the stress mode; customers/nations stay the same population.
    for dim in ("customer", "nation", "region", "supplier", "part"):
        d = spark.read.parquet(f"{BASE}/{dim}.parquet")
        d.write.mode("overwrite").parquet(f"{out_dir}/x1/{dim}.parquet")
        d.write.mode("overwrite").parquet(f"{out_dir}/x10/{dim}.parquet")

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    docs.write.mode("overwrite").parquet(f"{out_dir}/x1/documents.parquet")
    emb.write.mode("overwrite").parquet(f"{out_dir}/x1/embeddings.parquet")

    # lineitem scales by offsetting the ORDER key and keeping part keys:
    # 10x more baskets over the same item vocabulary — the realistic growth
    # mode for co-occurrence ops (pairs grow linearly with baskets while
    # per-item counts deepen 10x)
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    li.write.mode("overwrite").parquet(f"{out_dir}/x1/lineitem.parquet")
    li_parts = [
        li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * ID_STRIDE)
        )
        for i in range(COPIES)
    ]
    li10 = li_parts[0]
    for p in li_parts[1:]:
        li10 = li10.unionByName(p)
    li10.write.mode("overwrite").parquet(f"{out_dir}/x10/lineitem.parquet")

    # orders scale by offsetting o_orderkey over the same customers/dates:
    # 10x orders per customer/date — deepens the FD/profile group stress
    ordr = spark.read.parquet(f"{BASE}/orders.parquet")
    ordr.write.mode("overwrite").parquet(f"{out_dir}/x1/orders.parquet")
    o_parts = [
        ordr.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * ID_STRIDE)
        )
        for i in range(COPIES)
    ]
    o10 = o_parts[0]
    for p in o_parts[1:]:
        o10 = o10.unionByName(p)
    o10.write.mode("overwrite").parquet(f"{out_dir}/x10/orders.parquet")

    # events scale by offsetting event_ids on the SAME users/types/hours:
    # group populations deepen 10x — the stress mode for the monitoring
    # family (q144 anomaly stats, q145 drift halves).  (This round's
    # events vintage is timestamp[us], which plain spark.read handles; a
    # ns vintage would need the nanosAsLong conf — see queries/_tables.py.)
    ev = spark.read.parquet(f"{BASE}/events.parquet")
    ev.write.mode("overwrite").parquet(f"{out_dir}/x1/events.parquet")
    ev_parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * ID_STRIDE))
        for i in range(COPIES)
    ]
    ev10 = ev_parts[0]
    for p in ev_parts[1:]:
        ev10 = ev10.unionByName(p)
    ev10.write.mode("overwrite").parquet(f"{out_dir}/x10/events.parquet")

    d_parts = []
    e_parts = []
    for i in range(COPIES):
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" copy{i}")).alias("text"),
                "lang",
                "source",
                (F.col("n_chars") + F.lit(len(f" copy{i}"))).alias("n_chars"),
            )
        )
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
    d10 = d_parts[0]
    for p in d_parts[1:]:
        d10 = d10.unionByName(p)
    e10 = e_parts[0]
    for p in e_parts[1:]:
        e10 = e10.unionByName(p)
    d10.write.mode("overwrite").parquet(f"{out_dir}/x10/documents.parquet")
    e10.write.mode("overwrite").parquet(f"{out_dir}/x10/embeddings.parquet")


def time_op(spark, fn, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    registry = load_all()
    ops = sys.argv[1:] or unprobed_ops(registry)
    print(f"probing {len(ops)} ops", flush=True)
    spark = get_spark(app_name="scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    tmp = tempfile.mkdtemp(prefix="scale_probe_")
    build_scaled(spark, tmp)

    results = {}
    for name in ops:
        t1 = time_op(spark, registry[name].fn, f"{tmp}/x1")
        t10 = time_op(spark, registry[name].fn, f"{tmp}/x10")
        results[name] = {
            "t1": t1,
            "t10": t10,
            "ratio": round(t10 / t1, 2) if t1 else None,
        }
        print(name, results[name], flush=True)

    report = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            report = json.load(f)
    report.setdefault("metric", "scale_probe")
    report.setdefault("ops", {}).update(results)
    report["loadavg_1min_at_end"] = float(
        open("/proc/loadavg").read().split()[0]
    )
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("merged into", OUT)
    spark.stop()


if __name__ == "__main__":
    main()
