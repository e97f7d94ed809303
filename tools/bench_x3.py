#!/usr/bin/env python3
"""x3 bench leg for the heavy queries (VERDICT r14 item 5).

At sf0.1 the per-query working sets are fixed-overhead-bound: the r14
driver's 8-core run BEAT its 32-core run, so the headline bench can no
longer see parallelism regressions (the q21 serialization defect class).
This leg restores that measurement power WITHOUT touching the driver
contract: it composes a x3 fixture from sf0.1 (bijective copy families —
the r13/r14 probe recipes — so exact-dedup cannot collapse the copies),
then times the top-10 heavies with bench.py methodology (best-of-3,
cache-cold, noop sink) at 32 AND 8 cores in separate processes, and
writes one self-report JSON with the 8/32 wall ratios. The sf0.1
headline bench line is unchanged; this is an additions-only artifact
(BENCH_SELF_r15_X3.json).

Copy recipes (value-preserving where a query aggregates, key-offset /
bijective-mangle where dedup would collapse copies):
- documents: alphabet-rotation text copies + doc_id offset (disjoint
  vocabulary per copy, shingle/band buckets stay small).
- lineitem: l_orderkey/l_partkey offsets (graph/basket copies disjoint).
- events: event_id/user_id offsets, ts preserved (x3 users, x3
  concurrent intervals at every instant).
- embeddings: vec_id offset + cyclic coordinate rotation by copy index
  (norms preserved, cross-copy vectors not near-identical).
- dims (customer/orders/part/supplier/nation/region): copied through.

Usage:
  python tools/bench_x3.py build [fixture_dir]   # compose the fixture
  python tools/bench_x3.py time  [fixture_dir]   # one timing pass at
                                                 # local[$SPARK_GRAFT_CPUS]
  python tools/bench_x3.py full  [fixture_dir] [out.json]
      # build + 32-core pass + 8-core pass (subprocesses) + report
"""

from __future__ import annotations

import json
import os
import shutil
import string
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SPARK_GRAFT_X_COPIES", "3"))
OFFSET = 10_000_000
ALPHA = string.ascii_lowercase

HEAVIES = [
    "q21_minhash_lsh_neardup",
    "q137_minhash_calibration",
    "q143_pagerank_items",
    "q231_peak_concurrency",
    "q253_rfm_segments",
    "q22_token_jaccard_neardup",
    "q23_simhash_hamming",
    "q287_simhash_combi_blocking",
    "q130_bigram_logprob",
    "q116_semdedup",
    "q01_pricing_summary",  # host control
]


def build(fixture_dir: str) -> None:
    from pyspark.sql import functions as F

    from cassandra_analytics_example_spark.session import get_spark

    spark = get_spark(app_name="bench-x3-build")
    os.makedirs(fixture_dir, exist_ok=True)

    def union_copies(df, build_one):
        out = build_one(df, 0)
        for c in range(1, COPIES):
            out = out.unionByName(build_one(df, c))
        return out

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))

    def doc_copy(d, c):
        rot = ALPHA[c:] + ALPHA[:c]
        mangled = F.translate(F.col("text"), ALPHA, rot)
        return d.select(
            (F.col("doc_id") + c * OFFSET).alias("doc_id"),
            mangled.alias("text"),
            "lang",
            "source",
            F.length(mangled).alias("n_chars"),
        )

    union_copies(docs, doc_copy).write.mode("overwrite").parquet(
        os.path.join(fixture_dir, "documents.parquet")
    )

    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet"))
    union_copies(
        li,
        lambda d, c: d.withColumn(
            "l_orderkey", F.col("l_orderkey") + c * OFFSET
        ).withColumn("l_partkey", F.col("l_partkey") + c * OFFSET),
    ).write.mode("overwrite").parquet(os.path.join(fixture_dir, "lineitem.parquet"))

    from cassandra_analytics_example_spark.queries.relational import table

    ev = table(spark, BASE, "events")
    union_copies(
        ev,
        lambda d, c: d.withColumn(
            "event_id", F.col("event_id") + c * OFFSET
        ).withColumn("user_id", F.col("user_id") + c * OFFSET),
    ).write.mode("overwrite").parquet(os.path.join(fixture_dir, "events.parquet"))

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))

    def emb_copy(d, c):
        dim = len(d.select("embedding").first()[0])
        rolled = F.concat(
            F.slice("embedding", c + 1, dim - c), F.slice("embedding", 1, c)
        ) if c else F.col("embedding")
        return d.select(
            (F.col("vec_id") + c * OFFSET).alias("vec_id"),
            rolled.alias("embedding"),
            "label",
        )

    union_copies(emb, emb_copy).write.mode("overwrite").parquet(
        os.path.join(fixture_dir, "embeddings.parquet")
    )

    for dim in ("customer", "orders", "part", "supplier", "nation", "region"):
        src = os.path.join(BASE, f"{dim}.parquet")
        dst = os.path.join(fixture_dir, f"{dim}.parquet")
        if os.path.isfile(src):
            shutil.copy(src, dst)
        else:
            shutil.copytree(src, dst, dirs_exist_ok=True)
    print(f"built x{COPIES} fixture at {fixture_dir}", flush=True)


def _heavies():
    only = os.environ.get("SPARK_GRAFT_X_ONLY", "")
    if only:
        want = {n.strip() for n in only.split(",") if n.strip()}
        return [n for n in HEAVIES if n in want]
    return HEAVIES


def time_pass(fixture_dir: str) -> None:
    from cassandra_analytics_example_spark.operators.checkpoints import (
        release_pins,
    )
    from cassandra_analytics_example_spark.queries import load_all
    from cassandra_analytics_example_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="bench-x3-time")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in _heavies():
        walls = []
        for _ in range(3):
            release_pins(spark, all_threads=True)
            spark.catalog.clearCache()
            t0 = time.monotonic()
            registry[name].fn(spark, fixture_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.monotonic() - t0, 3))
        out[name] = min(walls)
        print(f"x3 {name}: {min(walls)} {walls}", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"),
                      "queries": out}))


def full(fixture_dir: str, out_path: str) -> None:
    if not os.path.isdir(fixture_dir):
        subprocess.run(
            [sys.executable, __file__, "build", fixture_dir], check=True
        )
    legs = {}
    for cpus in ("32", "8"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        r = subprocess.run(
            [sys.executable, __file__, "time", fixture_dir],
            env=env, check=True, capture_output=True, text=True,
        )
        legs[cpus] = json.loads(r.stdout.strip().splitlines()[-1])["queries"]
        print(f"-- {cpus}-core leg done", flush=True)
    ratios = {
        q: round(legs["8"][q] / legs["32"][q], 3)
        for q in legs["32"]
        if legs["32"][q] > 0
    }
    report = {
        "metric": "bench_x3_heavies",
        "base": BASE,
        "copies": COPIES,
        "queries_limited_to": os.environ.get("SPARK_GRAFT_X_ONLY") or None,
        "note": "additions-only self-report (VERDICT r14 item 5); the "
        "sf0.1 driver bench line is unchanged. ratio_8_over_32 > 1.5 "
        "means the query's x3 working set exercises the extra cores "
        "again (a future serialization regression reads ~1.0 here).",
        "walls_32": legs["32"],
        "walls_8": legs["8"],
        "ratio_8_over_32": ratios,
        "loadavg_end": os.getloadavg()[0],
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(ratios, indent=1, sort_keys=True))
    print("->", out_path)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    fixture_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_x3"
    if mode == "build":
        build(fixture_dir)
    elif mode == "time":
        time_pass(fixture_dir)
    else:
        out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
            ROOT, "BENCH_SELF_r15_X3.json"
        )
        full(fixture_dir, out)


if __name__ == "__main__":
    main()
