#!/usr/bin/env python3
"""Probe: do multi-consumer pinned layers get materialized MORE THAN ONCE
when AQE launches consumer stages concurrently (the persist race), and
does an eager materialization of the pin close it?

Variants, via call-time patching of session.pin_small (zero-void — the
operators late-import it):

* baseline — pin_small = persist only (shipped behavior)
* eager    — pin_small = persist + count() (cache filled BEFORE consumers
             build, so no branch recomputes the layer)

Per (variant, query): best-of-2 cache-cold wall + total executor run ms
(the duplicated work shows up as executor time, not always wall).

Usage: python tools/probe_r14_eager_pin.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_analytics_example_spark import session as sess
from cassandra_analytics_example_spark.operators.checkpoints import release_pins
from cassandra_analytics_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "q95_bm25_retrieval",
    "q130_bigram_logprob",
    "q67_unigram_logprob",
    "q137_minhash_calibration",
    "q59_tfidf_top_terms",
]


def total_run_ms(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway
    lst = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    return sum(lst.apply(i).executorRunTime() for i in range(lst.size()))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PROBE_R14_EAGER_PIN.json"
    spark = get_spark(
        app_name="probe-r14-eager-pin",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from cassandra_analytics_example_spark.queries import load_all

    registry = load_all()
    orig_pin = sess.pin_small

    def eager_pin(df):
        pinned = orig_pin(df)
        pinned.count()
        return pinned

    report = {"metric": "probe_r14_eager_pin", "sf_dir": SF_DIR,
              "loadavg_start": round(os.getloadavg()[0], 2), "variants": {}}
    for vname, fn_pin in (("baseline", orig_pin), ("eager", eager_pin)):
        sess.pin_small = fn_pin
        try:
            rec = {}
            for name in QUERIES:
                walls, runs = [], []
                for _ in range(2):
                    release_pins(spark, all_threads=True)
                    spark.catalog.clearCache()
                    r0 = total_run_ms(spark)
                    t0 = time.perf_counter()
                    registry[name].fn(spark, SF_DIR).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    walls.append(time.perf_counter() - t0)
                    runs.append(total_run_ms(spark) - r0)
                rec[name] = {
                    "wall_sec": round(min(walls), 3),
                    "executor_run_sec": round(min(runs) / 1000, 2),
                }
                print(vname, name, rec[name], flush=True)
            report["variants"][vname] = rec
        finally:
            sess.pin_small = orig_pin
    report["loadavg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
