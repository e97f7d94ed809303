#!/usr/bin/env python3
"""SCALE_PROBE_SIMILARITY_r13.json: measured scaling curves for the
similarity/ANN surface, extending the r13 heavyweight probe
(tools/scale_probe_r13.py) to the three queries whose 100 TB claims in
the r12 verdict rest on line-reads of the operator design:

* q116 semdedup — the claim is BOTH halves linear in N (corpus-sized
  cell count makes in-cell expansion N * target_cell_size; sign-bucket
  filtering makes centroid assignment constant per row). The operator
  docstring records a pre-fix 22x-at-10x measurement; this probe records
  the POST-design curve as an artifact.
* q32 IVF top-k — fixed 8-cell layout, fixed 10-query set: compute is
  queries * cell_size, linear in N.
* q25 brute-force top-k — the exactly-linear control (corpus scan per
  query batch, broadcast queries, no shuffle of the corpus vectors).

Scaled fixtures: per-copy vec_id offset + per-copy COORDINATE ROTATION
of the embedding array (the vector analog of the r13 alphabet-rotation
recipe for documents). A coordinate permutation is orthogonal, so every
intra-copy cosine is preserved EXACTLY (the base corpus's similarity
structure replicates per copy); the fixture embeddings are
near-isotropic (measured: component mean -0.0007, intra-pair cos>=0.35
rate 0.19%, cross-rotation rate 0.21% — cross-copy pairs behave like
the base corpus's own random pairs), so the corpus grows without a
cluster-growth confound. Labels ride unchanged; queries stay the base
vec_id < 10 set (copy 0 is the identity rotation at offset 0).

Per (query, scale): best-of-2 cache-cold wall + shuffle bytes written
(2nd run) + rows out; exponent = least-squares slope of log(metric) vs
log(scale) over {1,3,10}. Wall exponents under-read on sub-second legs
(fixed scheduler/codegen floor — r04 finding); the shuffle-bytes
exponent is the scale-honest claim.

Usage: python tools/scale_probe_similarity_r13.py [out.json]
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


def _build_scaled_emb(spark, base_dir: str, out_dir: str, copies: int):
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    parts = []
    for c in range(copies):
        # rotate coordinates by c: element i of the copy = element
        # ((i + c) mod dim) of the base — orthogonal, intra-copy cosines
        # exact; copy 0 (c=0) is the identity, keeping the query set
        rotated = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.element_at(
                "embedding", ((i + F.lit(c)) % dim + 1).cast("int")
            ),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + c * OFFSET).alias("vec_id"),
                rotated.cast("array<float>").alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(
        os.path.join(out_dir, "embeddings.parquet")
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
        sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE_SIMILARITY_r13.json"
    )
    spark = get_spark(
        app_name="scale-probe-similarity-r13",
        extra_conf={"spark.ui.retainedStages": "100000"},
    )

    from cassandra_analytics_example_spark.queries import load_all

    registry = load_all()
    targets = [
        "q25_knn_bruteforce",
        "q32_knn_ivf",
        "q116_semdedup",
    ]

    root = tempfile.mkdtemp(prefix="scale_probe_sim_r13_")
    report = {
        "metric": "scale_probe_similarity_r13",
        "sf_base": 0.1,
        "scales": SCALES,
        "loadavg_start": round(os.getloadavg()[0], 2),
        "queries": {},
        "note": (
            "best-of-2 cache-cold wall + shuffle bytes written (2nd run) "
            "per scale; exponent = least-squares slope of log(metric) vs "
            "log(scale); coordinate-rotation copies (orthogonal, "
            "intra-copy cosines exact, near-isotropic base so cross-copy "
            "pairs match the base corpus's random-pair rate); wall "
            "exponents under-read on sub-second legs - the shuffle-bytes "
            "exponent is the scale-honest claim"
        ),
    }
    dirs = {}
    for s in SCALES:
        d = os.path.join(root, f"x{s}")
        os.makedirs(d, exist_ok=True)
        t0 = time.perf_counter()
        _build_scaled_emb(spark, SF_DIR, d, s)
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
