#!/usr/bin/env python3
"""SCALE_PROBE_TEXT_SKEW_r13.json: scaling curves for three more scale
claims that were line-reads until now, completing the r13 measured-curve
sweep (heavyweights: SCALE_PROBE_r13.json; similarity:
SCALE_PROBE_SIMILARITY_r13.json; streaming: STREAM_THROUGHPUT_r13.json):

* q62 salted skew join — the planted 80%-hot-key demo (lineitem rows
  with l_orderkey%10<8 all map to supplier key 1, salted 8x). Scaling
  lineitem by copy GROWS THE HOT KEY ABSOLUTELY (80% of 10x rows on one
  key): the exact shape where an unsalted shuffle join degrades to one
  straggler task. The claim under test: salting keeps the join ~linear
  as the hot key grows.
* q95 BM25 retrieval — posting-list scoring with a fixed query-term
  set; claim: corpus-linear (per-doc term stats + vocab-sized
  broadcast).
* q130 bigram LM with backoff — the vocab-sized-broadcast-layers claim
  from the r12 verdict plan audit; corpus-linear expected.

Fixtures reuse the r13 recipes: alphabet-rotation document copies
(bijective char map — intra-copy token/ngram structure exact,
cross-copy vocabulary disjoint, so vocab grows ~linearly with copies:
the honest worst case for broadcast-layer claims) and
l_orderkey/l_partkey-offset lineitem copies with the supplier table
passed through unchanged (suppkeys preserved so the dim join stays
valid and the hot key accumulates every copy's skewed rows).

Per (query, scale): best-of-2 cache-cold wall + shuffle bytes written
(2nd run) + rows; exponent = least-squares slope of log(metric) vs
log(scale) over {1,3,10}; wall exponents under-read on cheap legs
(fixed scheduler floor) — shuffle-bytes exponent is the scale-honest
claim.

Usage: python tools/scale_probe_text_skew_r13.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = [1, 3, 10]
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


def _build_scaled(spark, base_dir: str, out_dir: str, copies: int) -> None:
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))

    def union_copies(df, build):
        parts = [build(df, c) for c in range(copies)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

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
        os.path.join(out_dir, "documents.parquet")
    )
    union_copies(
        li,
        lambda d, c: d.withColumn(
            "l_orderkey", F.col("l_orderkey") + c * OFFSET * 100
        ).withColumn("l_partkey", F.col("l_partkey") + c * OFFSET),
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "lineitem.parquet"))
    # dim side passes through unchanged: suppkeys preserved so every
    # copy's skewed rows land on the SAME hot supplier key
    shutil.copy(
        os.path.join(base_dir, "supplier.parquet"),
        os.path.join(out_dir, "supplier.parquet"),
    )


def _fit_exponent(scales, values):
    pts = [
        (math.log(s), math.log(v))
        for s, v in zip(scales, values)
        if v and v > 0
    ]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 3)


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "SCALE_PROBE_TEXT_SKEW_r13.json"
    )
    spark = get_spark(
        app_name="scale-probe-text-skew-r13",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )

    from cassandra_analytics_example_spark.queries import load_all

    registry = load_all()
    targets = [
        "q62_salted_skew_join",
        "q95_bm25_retrieval",
        "q130_bigram_logprob",
    ]

    root = tempfile.mkdtemp(prefix="scale_probe_ts_r13_")
    report = {
        "metric": "scale_probe_text_skew_r13",
        "sf_base": 0.1,
        "scales": SCALES,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "queries": {},
        "note": (
            "best-of-2 cache-cold wall + shuffle bytes written (2nd run) "
            "per scale; exponent = least-squares slope of log(metric) vs "
            "log(scale); q62's hot supplier key receives 80% of EVERY "
            "lineitem copy (absolute skew growth), document copies are "
            "alphabet-rotated (disjoint cross-copy vocabulary - the "
            "honest worst case for vocab-broadcast claims); wall "
            "exponents under-read on cheap legs - shuffle-bytes exponent "
            "is the scale-honest claim"
        ),
    }
    dirs = {}
    for s in SCALES:
        d = os.path.join(root, f"x{s}")
        os.makedirs(d, exist_ok=True)
        t0 = time.perf_counter()
        _build_scaled(spark, SF_DIR, d, s)
        print(f"built x{s} in {time.perf_counter()-t0:.1f}s", flush=True)
        dirs[s] = d

    for name in targets:
        fn = registry[name].fn
        rec = {"wall_sec": {}, "shuffle_mb": {}, "rows": {}}
        for s in SCALES:
            walls = []
            sb = None
            rows = None
            for run in range(2):
                spark.catalog.clearCache()
                b0 = _shuffle_bytes(spark)
                t0 = time.perf_counter()
                df = fn(spark, dirs[s])
                _force(df)
                walls.append(time.perf_counter() - t0)
                sb = _shuffle_bytes(spark) - b0
                if run == 1:
                    rows = df.count()
            rec["wall_sec"][str(s)] = round(min(walls), 3)
            rec["shuffle_mb"][str(s)] = round(sb / 1e6, 2)
            rec["rows"][str(s)] = rows
            print(
                f"{name} x{s}: wall {min(walls):.2f}s "
                f"shuffle {sb/1e6:.1f}MB rows {rows}",
                flush=True,
            )
        svals = [rec["wall_sec"][str(s)] for s in SCALES]
        bvals = [rec["shuffle_mb"][str(s)] for s in SCALES]
        rec["wall_exponent"] = _fit_exponent(SCALES, svals)
        rec["shuffle_exponent"] = _fit_exponent(SCALES, bvals)
        rec["wall_ratio_10x"] = (
            round(svals[-1] / svals[0], 2) if svals[0] else None
        )
        report["queries"][name] = rec

    report["loadavg_end"] = round(os.getloadavg()[0], 2)
    shutil.rmtree(root, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
