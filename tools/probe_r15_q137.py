#!/usr/bin/env python3
"""r15 probe: q137's pinned-layer redundant compute (VERDICT r14 'weak' #1).

The r14 profile showed 97 s executor for an 8 s wall: five full-lineage
stages (scan -> window dedup -> shingles -> signatures) with REAL CPU each,
i.e. the sh_df / sigs pins do NOT dedupe their concurrent AQE consumers at
sf0.1. Variants, all computing the registered q137 result:

  A baseline       shipped code (two lazy pins, 4 verification joins)
  B eager2         shipped shape + sequenced count() on both pins
  C combined       ONE pin carrying (doc_id, __sh, sig), 2 verification joins
  D combined_eager C + one count() on the combined pin before consumers

Each variant: cache-cold, best-of-3 noop wall, per-stage executor table of
the LAST run, and a full-value result hash (sorted collect -> md5) so value
parity across variants is checked in the same probe.

Usage: python tools/probe_r15_q137.py [out.json]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.checkpoints import release_pins
from cassandra_analytics_example_spark.session import get_spark, pin_small

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def stages(spark):
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway
    lst = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = {}
    for i in range(lst.size()):
        s = lst.apply(i)
        out[(s.stageId(), s.attemptId())] = {
            "run_ms": s.executorRunTime(),
            "cpu_ms": s.executorCpuTime() // 1_000_000,
            "tasks": s.numCompleteTasks(),
        }
    return out


def _reps(spark):
    from cassandra_analytics_example_spark.queries.relational import table

    docs = table(spark, SF_DIR, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "text")
    )


def _verify(pairs, sa, sb, ha, hb):
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(sa, "id_a").join(sb, "id_b").join(ha, "id_a").join(hb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("sig_matches"),
            inter.cast("bigint").alias("inter"),
            (F.size("sh_a") + F.size("sh_b") - inter).cast("bigint").alias("uni"),
        )
    )


def build_baseline(spark, eager: bool):
    from cassandra_analytics_example_spark.functions.text import shingles
    from cassandra_analytics_example_spark.operators.dedup import (
        lsh_candidate_pairs,
        signatures_from_shingles,
    )

    reps = _reps(spark)
    sh_df = pin_small(
        reps.select("doc_id", F.array_distinct(shingles("text", 5)).alias("__sh"))
    )
    if eager:
        sh_df.count()
    sigs = pin_small(signatures_from_shingles(sh_df, "doc_id"))
    if eager:
        sigs.count()
    pairs = lsh_candidate_pairs(sigs, "doc_id", 4, 4, max_bucket_size=1000)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    ha = sh_df.select(F.col("doc_id").alias("id_a"), F.col("__sh").alias("sh_a"))
    hb = sh_df.select(F.col("doc_id").alias("id_b"), F.col("__sh").alias("sh_b"))
    return _verify(pairs, sa, sb, ha, hb)


def build_combined(spark, eager: bool):
    from cassandra_analytics_example_spark.functions.text import md5_u60, shingles
    from cassandra_analytics_example_spark.operators.dedup import (
        MINHASH_P,
        lsh_candidate_pairs,
        minhash_seeds,
    )

    reps = _reps(spark)
    sh_df = reps.select(
        "doc_id", F.array_distinct(shingles("text", 5)).alias("__sh")
    )
    hashed = sh_df.select(
        "doc_id",
        "__sh",
        F.transform(F.col("__sh"), lambda s: md5_u60(s) % MINHASH_P).alias("__hv"),
    )
    ab = minhash_seeds(16)

    def component(i: int):
        a, b = ab[i]
        return F.array_min(
            F.transform(F.col("__hv"), lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P)
        ).alias(f"h{i}")

    base = pin_small(
        hashed.select(
            "doc_id", "__sh", F.array(*[component(i) for i in range(16)]).alias("sig")
        )
    )
    if eager:
        base.count()
    sigs = base.select("doc_id", "sig")
    pairs = lsh_candidate_pairs(sigs, "doc_id", 4, 4, max_bucket_size=1000)
    a = base.select(
        F.col("doc_id").alias("id_a"),
        F.col("sig").alias("sig_a"),
        F.col("__sh").alias("sh_a"),
    )
    b = base.select(
        F.col("doc_id").alias("id_b"),
        F.col("sig").alias("sig_b"),
        F.col("__sh").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("sig_matches"),
            inter.cast("bigint").alias("inter"),
            (F.size("sh_a") + F.size("sh_b") - inter).cast("bigint").alias("uni"),
        )
    )


def build_combined_long(spark):
    """C's combined pin, but the verification attaches BOTH sides with ONE
    streamed read of the pin: pairs unpivoted to (id_a, id_b, doc_id),
    broadcast onto the pin, grouped back per pair. Valid because reps'
    doc_id is unique by construction (row_number dedup), so each pair
    matches exactly two rows. Halves the expensive array-column cache
    decode (the real cost the r14 profile misread as a fill race)."""
    from cassandra_analytics_example_spark.functions.text import md5_u60, shingles
    from cassandra_analytics_example_spark.operators.dedup import (
        MINHASH_P,
        lsh_candidate_pairs,
        minhash_seeds,
    )

    reps = _reps(spark)
    sh_df = reps.select(
        "doc_id", F.array_distinct(shingles("text", 5)).alias("__sh")
    )
    hashed = sh_df.select(
        "doc_id",
        "__sh",
        F.transform(F.col("__sh"), lambda s: md5_u60(s) % MINHASH_P).alias("__hv"),
    )
    ab = minhash_seeds(16)

    def component(i: int):
        a, b = ab[i]
        return F.array_min(
            F.transform(F.col("__hv"), lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P)
        ).alias(f"h{i}")

    base = pin_small(
        hashed.select(
            "doc_id", "__sh", F.array(*[component(i) for i in range(16)]).alias("sig")
        )
    )
    sigs = base.select("doc_id", "sig")
    pairs = lsh_candidate_pairs(sigs, "doc_id", 4, 4, max_bucket_size=1000)
    plong = pairs.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("doc_id")
    )
    att = base.join(F.broadcast(plong), "doc_id")
    side_a = F.col("doc_id") == F.col("id_a")
    per_pair = att.groupBy("id_a", "id_b").agg(
        F.first(F.when(side_a, F.col("sig")), ignorenulls=True).alias("sig_a"),
        F.first(F.when(~side_a, F.col("sig")), ignorenulls=True).alias("sig_b"),
        F.first(F.when(side_a, F.col("__sh")), ignorenulls=True).alias("sh_a"),
        F.first(F.when(~side_a, F.col("__sh")), ignorenulls=True).alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return per_pair.select(
        "id_a",
        "id_b",
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("sig_matches"),
        inter.cast("bigint").alias("inter"),
        (F.size("sh_a") + F.size("sh_b") - inter).cast("bigint").alias("uni"),
    )


def result_hash(df) -> str:
    rows = sorted(tuple(r) for r in df.collect())
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_r15_q137.json"
    spark = get_spark(
        app_name="probe-r15-q137",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    variants = {
        "A_baseline": lambda: build_baseline(spark, eager=False),
        "B_eager2": lambda: build_baseline(spark, eager=True),
        "C_combined": lambda: build_combined(spark, eager=False),
        "D_combined_eager": lambda: build_combined(spark, eager=True),
        "E_combined_long": lambda: build_combined_long(spark),
    }
    only = os.environ.get("PROBE_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items() if k in only.split(",")}
    report = {"metric": "probe_r15_q137", "sf_dir": SF_DIR,
              "loadavg_start": os.getloadavg()[0], "variants": {}}
    for vname, builder in variants.items():
        walls = []
        stage_tbl = None
        for run in range(3):
            release_pins(spark, all_threads=True)
            spark.catalog.clearCache()
            before = stages(spark)
            t0 = time.monotonic()
            df = builder()
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            after = stages(spark)
            new = {k: v for k, v in after.items() if k not in before}
            stage_tbl = sorted(
                ((k[0], v) for k, v in new.items()),
                key=lambda kv: -kv[1]["run_ms"],
            )
        release_pins(spark, all_threads=True)
        spark.catalog.clearCache()
        h = result_hash(builder())
        release_pins(spark, all_threads=True)
        spark.catalog.clearCache()
        run_s = sum(v["run_ms"] for _, v in stage_tbl) / 1000
        cpu_s = sum(v["cpu_ms"] for _, v in stage_tbl) / 1000
        report["variants"][vname] = {
            "walls": walls, "best_wall": min(walls),
            "executor_run_sec_lastrun": round(run_s, 2),
            "executor_cpu_sec_lastrun": round(cpu_s, 2),
            "result_hash": h,
            "heavy_stages": [
                {"stage": sid, **v} for sid, v in stage_tbl[:6]
            ],
        }
        print(f"{vname}: walls={walls} run={run_s:.1f}s cpu={cpu_s:.1f}s hash={h[:12]}",
              flush=True)
    report["loadavg_end"] = os.getloadavg()[0]
    hashes = {v["result_hash"] for v in report["variants"].values()}
    report["all_hashes_equal"] = len(hashes) == 1
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("parity:", report["all_hashes_equal"], "->", out_path)


if __name__ == "__main__":
    main()
