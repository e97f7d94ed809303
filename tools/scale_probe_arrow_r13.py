#!/usr/bin/env python3
"""SCALE_PROBE_ARROW_r13.json: scaling curves for the two registered
operators that CROSS INTO PYTHON (Arrow ``mapInPandas``) — the last
perf surface without a measured curve, and the one a PySpark engine
must defend hardest: every other operator family stays JVM-side, so
the Arrow crossing is where a per-row or per-batch regression would
silently cap cluster throughput.

* q30 multimodal features — real PPM/PGM + RIFF/WAVE decoders over
  binary payload columns, batch-shaped Arrow transfer
  (operators/multimodal.py; the claim from the §2 table: "Arrow-
  batched, fuzz-tested decoders", never row-at-a-time Python).
* q127 compression quality — zlib compression-ratio scoring (no ANSI
  zlib exists, so this is a legitimate Python crossing by necessity).

Fixtures: the r13 alphabet-rotation document copies (payloads are
derived deterministically from document content, so the decoded
feature distribution replicates per copy while doc_ids stay disjoint).

Per (query, scale): best-of-2 cache-cold wall + shuffle bytes written
(2nd run) + rows + rows/sec; exponent = least-squares slope of
log(metric) vs log(scale) over {1,3,10}. The claim under test is
constant-per-row cost through the crossing: marginal rows/sec between
x1 and x10 should hold or improve as batching amortizes.

Usage: python tools/scale_probe_arrow_r13.py [out.json]
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
        sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_ARROW_r13.json"
    )
    spark = get_spark(
        app_name="scale-probe-arrow-r13",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )

    from cassandra_analytics_example_spark.queries import load_all

    registry = load_all()
    targets = [
        "q30_multimodal_features",
        "q127_compression_quality",
    ]

    root = tempfile.mkdtemp(prefix="scale_probe_arrow_r13_")
    report = {
        "metric": "scale_probe_arrow_r13",
        "sf_base": 0.1,
        "scales": SCALES,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "queries": {},
        "note": (
            "best-of-2 cache-cold wall + shuffle bytes written (2nd run) "
            "per scale over the two Arrow mapInPandas crossings; the "
            "claim under test is constant-per-row crossing cost - "
            "marginal rows/sec between x1 and x10 should hold or improve "
            "as Arrow batching amortizes; wall exponents under-read on "
            "cheap legs (fixed scheduler floor)"
        ),
    }
    dirs = {}
    for s in SCALES:
        d = os.path.join(root, f"x{s}")
        os.makedirs(d, exist_ok=True)
        t0 = time.perf_counter()
        _build_scaled_docs(spark, SF_DIR, d, s)
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
        rvals = [rec["rows"][str(s)] for s in SCALES]
        rec["wall_exponent"] = _fit_exponent(SCALES, svals)
        rec["shuffle_exponent"] = _fit_exponent(SCALES, bvals)
        rec["wall_ratio_10x"] = (
            round(svals[-1] / svals[0], 2) if svals[0] else None
        )
        dw = svals[-1] - svals[0]
        rec["marginal_rows_per_sec"] = (
            round((rvals[-1] - rvals[0]) / dw) if dw > 0.05 else None
        )
        report["queries"][name] = rec

    report["loadavg_end"] = round(os.getloadavg()[0], 2)
    shutil.rmtree(root, ignore_errors=True)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
