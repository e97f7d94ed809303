#!/usr/bin/env python3
"""Probe: eager-materialize pin_partition_ids frames?

The range-pinned frames (quantile/rank spines) are consumed by 2+ plan
branches; AQE launches those consumer stages CONCURRENTLY, and whichever
tasks lose the per-block compute race sit in RDD block locks — observed
as a 31 s-run / 0.4 s-CPU / zero-shuffle stage in q168 (32 slots held by
waiters). Variant `eager` fills the cache with one count() before any
consumer builds.

Call-time patch of every module binding (operators import the symbol by
name), zero-void. Best-of-2 cache-cold wall per (variant, query).

Usage: python tools/probe_r14_eager_pid_pin.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_analytics_example_spark.operators import (
    checkpoints,
    frontier,
    quantiles,
    ranking,
    rankstats,
)
from cassandra_analytics_example_spark.operators.checkpoints import release_pins
from cassandra_analytics_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q168_histogram_quantile_sketch",
    "q253_rfm_segments",
    "q233_spearman_chars_tokens",
    "q244_average_precision_exact",
    "q249_cusum_changepoint",
    "q169_pareto_frontier",
]
MODULES = [checkpoints, frontier, quantiles, ranking, rankstats]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBE_R14_EAGER_PID.json"
    spark = get_spark(app_name="probe-r14-eager-pid")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from cassandra_analytics_example_spark.queries import load_all

    registry = load_all()
    orig = checkpoints.pin_partition_ids

    def eager(df):
        pinned = orig(df)
        pinned.count()
        return pinned

    report = {"metric": "probe_r14_eager_pid_pin", "sf_dir": SF_DIR,
              "loadavg_start": round(os.getloadavg()[0], 2), "variants": {}}
    for vname, impl in (("baseline", orig), ("eager", eager)):
        for m in MODULES:
            if hasattr(m, "pin_partition_ids"):
                m.pin_partition_ids = impl
        try:
            rec = {}
            for name in QUERIES:
                walls = []
                for _ in range(2):
                    release_pins(spark, all_threads=True)
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    registry[name].fn(spark, SF_DIR).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    walls.append(time.perf_counter() - t0)
                rec[name] = round(min(walls), 3)
                print(vname, name, rec[name], flush=True)
            report["variants"][vname] = rec
        finally:
            for m in MODULES:
                if hasattr(m, "pin_partition_ids"):
                    m.pin_partition_ids = orig
    report["loadavg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
