#!/usr/bin/env python3
"""r15 probe (VERDICT r14 item 4): ONE Arrow-boundary experiment on the
interpreted higher-order-function fold family — q57 repetition_signals.

The HOF variant runs the per-doc run-length fold as interpreted Catalyst
``aggregate``; the Arrow variant ships (id, text) through ``mapInArrow``
and computes the same five INTEGER stats per document in Python
(collections.Counter — C-implemented), returning ints so the final
double ratios are computed by the IDENTICAL Spark expressions (float ops
never cross the boundary; bit parity is then decidable on full rows).

Parity harness: both variants collected and compared EXACTLY — integers
by value, doubles by struct-packed bits. Timing: best-of-3 cache-cold
noop walls + q01 control.

Usage: python tools/probe_r15_arrow_q57.py [out.json]
"""

from __future__ import annotations

import json
import os
import struct
import sys
import time
from collections import Counter
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.checkpoints import release_pins
from cassandra_analytics_example_spark.queries import load_all
from cassandra_analytics_example_spark.queries.relational import table
from cassandra_analytics_example_spark.session import get_spark, spread

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_STATS_SCHEMA = (
    "doc_id long, n_tokens bigint, runs bigint, best bigint, "
    "ng bigint, ndg bigint"
)


def _doc_stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for batch in batches:
        ids = batch.column(0)
        texts = batch.column(1).to_pylist()
        n_tokens, runs, best, ng, ndg = [], [], [], [], []
        for t in texts:
            toks = t.split(" ")  # == F.split(text, " "): literal space
            c = Counter(toks)
            n_tokens.append(len(toks))
            runs.append(len(c))
            best.append(max(c.values()))
            if len(toks) >= 2:
                grams = [
                    toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
                ]
                ng.append(len(grams))
                ndg.append(len(set(grams)))
            else:
                ng.append(0)
                ndg.append(0)
        yield pa.RecordBatch.from_arrays(
            [
                ids,
                pa.array(n_tokens, pa.int64()),
                pa.array(runs, pa.int64()),
                pa.array(best, pa.int64()),
                pa.array(ng, pa.int64()),
                pa.array(ndg, pa.int64()),
            ],
            names=["doc_id", "n_tokens", "runs", "best", "ng", "ndg"],
        )


def build_arrow(spark):
    docs = table(spark, SF_DIR, "documents")
    stats = (
        spread(docs)
        .select("doc_id", "text")  # prune BEFORE the opaque boundary (§4.1)
        .mapInArrow(_doc_stats, _STATS_SCHEMA)
    )
    nt = F.col("n_tokens").cast("double")
    return stats.select(
        F.col("doc_id"),
        F.col("n_tokens"),
        (F.lit(1.0) - F.col("runs").cast("double") / nt).alias(
            "dup_token_ratio"
        ),
        (F.col("best").cast("double") / nt).alias("top_token_share"),
        F.when(
            F.col("ng") > 0,
            F.lit(1.0)
            - F.col("ndg").cast("double") / F.col("ng").cast("double"),
        ).alias("dup_2gram_ratio"),
    )


def canon(rows) -> list[tuple]:
    out = []
    for r in rows:
        out.append(
            tuple(
                struct.pack(">d", v).hex() if isinstance(v, float) else v
                for v in r
            )
        )
    return sorted(out)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_r15_arrow_q57.json"
    registry = load_all()
    spark = get_spark(app_name="probe-r15-arrow-q57")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    variants = {
        "hof": lambda: registry["q57_repetition_signals"].fn(spark, SF_DIR),
        "arrow": lambda: build_arrow(spark),
        "q01_control": lambda: registry["q01_pricing_summary"].fn(spark, SF_DIR),
    }
    report = {"metric": "probe_r15_arrow_q57", "sf_dir": SF_DIR,
              "loadavg_start": os.getloadavg()[0], "variants": {}}
    for vname, builder in variants.items():
        walls = []
        for _ in range(3):
            release_pins(spark, all_threads=True)
            spark.catalog.clearCache()
            t0 = time.monotonic()
            builder().write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
        report["variants"][vname] = {"walls": walls, "best_wall": min(walls)}
        print(vname, walls, flush=True)
    a = canon(variants["hof"]().collect())
    b = canon(variants["arrow"]().collect())
    report["rows"] = len(a)
    report["bit_parity"] = a == b
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        report["first_diffs"] = [list(map(str, d)) for d in diff]
    report["loadavg_end"] = os.getloadavg()[0]
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print("bit_parity:", report["bit_parity"], "rows:", report["rows"], "->", out_path)


if __name__ == "__main__":
    main()
