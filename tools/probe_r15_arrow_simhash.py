#!/usr/bin/env python3
"""r15 probe: Arrow port of the SimHash fingerprint fold (follow-up to the
verdict-mandated q57 experiment that landed bit-exact and faster).

The JVM variant folds an n_bits-wide counter array per document through
interpreted higher-order functions (r14 profile: 44.7/21.2 s executor on
q23/q287). The Arrow variant computes the same fingerprint per doc in
numpy (md5 via hashlib — identical to md5_u60's first-15-hex-chars
semantics). Everything is exact integers, so parity is a plain value
compare of the (id, simhash) frames, plus q23's full result.

Usage: python tools/probe_r15_arrow_simhash.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cassandra_analytics_example_spark.operators.checkpoints import release_pins
from cassandra_analytics_example_spark.queries import load_all
from cassandra_analytics_example_spark.queries.relational import table
from cassandra_analytics_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def simhash_arrow(df, id_col, text_col, n_bits=32, gram_n=3):
    from pyspark.sql.types import LongType, StructField, StructType

    from cassandra_analytics_example_spark.session import spread

    def batches(it):
        import hashlib

        import numpy as np
        import pyarrow as pa

        shifts = np.arange(n_bits, dtype=np.int64)
        weights = (np.int64(1) << shifts)

        def fp_of(text):
            if text is None:
                return None
            toks = text.split(" ")
            if gram_n > 1:
                if len(toks) < gram_n:
                    return None  # empty feature set -> NULL fingerprint
                feats = {
                    " ".join(toks[i: i + gram_n])
                    for i in range(len(toks) - gram_n + 1)
                }
            else:
                feats = set(toks)
            if not feats:
                return None
            hs = np.fromiter(
                (
                    int(hashlib.md5(f.encode("utf-8")).hexdigest()[:15], 16)
                    for f in feats
                ),
                dtype=np.int64,
                count=len(feats),
            )
            ones = ((hs[:, None] >> shifts) & 1).sum(axis=0)
            return int(weights[(2 * ones) > len(feats)].sum())

        for b in it:
            ids = b.column(0)
            fps = [fp_of(t) for t in b.column(1).to_pylist()]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(fps, pa.int64())], names=["__id", "simhash"]
            )

    schema = StructType(
        [
            StructField("__id", df.schema[id_col].dataType),
            StructField("simhash", LongType()),
        ]
    )
    return (
        spread(df)
        .select(id_col, text_col)
        .mapInArrow(batches, schema)
        .withColumnRenamed("__id", id_col)
    )


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_r15_arrow_simhash.json"
    registry = load_all()
    spark = get_spark(app_name="probe-r15-arrow-simhash")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from cassandra_analytics_example_spark.operators.dedup import simhash

    docs = table(spark, SF_DIR, "documents")
    report = {"metric": "probe_r15_arrow_simhash", "sf_dir": SF_DIR,
              "loadavg_start": os.getloadavg()[0]}
    # exact fingerprint parity on both registered geometries
    for tag, nb, gn in (("q23_geom", 60, 3), ("unigram_geom", 32, 1)):
        a = {r["doc_id"]: r["simhash"]
             for r in simhash(docs, "doc_id", "text", nb, gn).collect()}
        b = {r["doc_id"]: r["simhash"]
             for r in simhash_arrow(docs, "doc_id", "text", nb, gn).collect()}
        report[f"parity_{tag}"] = a == b
        report[f"rows_{tag}"] = len(a)
        print(tag, "parity:", a == b, len(a), "rows", flush=True)
    # timing: JVM fold vs arrow fold, fingerprint stage only
    for vname, fn in (
        ("jvm_fold", lambda: simhash(docs, "doc_id", "text", 60, 3)),
        ("arrow_fold", lambda: simhash_arrow(docs, "doc_id", "text", 60, 3)),
        ("q01_control", lambda: registry["q01_pricing_summary"].fn(spark, SF_DIR)),
    ):
        walls = []
        for _ in range(3):
            release_pins(spark, all_threads=True)
            spark.catalog.clearCache()
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        report[vname] = {"walls": walls, "best_wall": min(walls)}
        print(vname, walls, flush=True)
    report["loadavg_end"] = os.getloadavg()[0]
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("->", out_path)


if __name__ == "__main__":
    main()
