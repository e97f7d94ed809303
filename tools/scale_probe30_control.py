#!/usr/bin/env python3
"""Corpus-linearity CONTROL for the 30x probe (VERDICT r6 task 4).

The main 30x probe (tools/scale_probe30.py) scales documents by unioning
near-identical copies, so every base doc becomes a near-dup cluster whose
size equals the copy count: candidate pairs per cluster grow as C(k,2),
i.e. C(30,2)/C(10,2) = 9.67x between the two scales. A pair-emitting op
that is perfectly linear in (corpus + candidate pairs) therefore shows
t30/t10 ~ 9-10 on that corpus — indistinguishable, by timing alone, from
a quietly corpus-quadratic op.

This control removes the confound: each copy's text gets a copy-specific
token injected between every pair of words (regexp_replace of ' ' with
' cN '), so shingles/simhash bands/substring chunks never match across
copies and cluster sizes DO NOT grow with the copy count. On this corpus
candidate pairs grow ~linearly with the corpus, so a corpus-linear op
must show t30/t10 ~ 3 (plus fixed-floor amortization); a corpus-quadratic
term would still push toward 9.

Together the two runs separate the hypotheses:
  main 30x  ~9-10  AND  control ~3   => linear in corpus + emitted pairs
  control >> 3                        => genuine super-linear corpus term

The copy/timing/merge METHODOLOGY is imported from scale_probe30 (one
source of truth — a fix there cannot desynchronize the control from the
probe it exists to calibrate); only the documents mangling differs.

Usage: python3 tools/scale_probe30_control.py [query ...]
Merges a "ops30_control" section into SCALE_PROBE_r07.json.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.queries import load_all
from cassandra_analytics_example_spark.session import get_spark
from tools.scale_probe30 import (
    BASE,
    ID_STRIDE,
    OUT,
    _union,
    copy_embeddings_jittered,
    copy_relational,
    merge_section,
    time_op,
)

# The pair-emitting text ops whose main-probe ratios are dominated by
# clone-multiplicity pair growth.
DEFAULT_OPS = [
    "q191_canonical_selection",
    "q205_simhash_eval",
    "q21_minhash_lsh_neardup",
    "q142_substring_dup_spans",
]


def build_control(spark, out_dir: str, copies: int) -> None:
    """Same table set as scale_probe30.build_scaled, but documents get a
    copy-specific inter-word token so copies are NOT near-dups of each
    other (cluster sizes stay at the base corpus's own dup structure)."""
    dst = f"{out_dir}/x{copies}"
    copy_relational(spark, dst, copies)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    d_parts = []
    for i in range(copies):
        token = f" c{i} "
        mangled = F.regexp_replace(F.col("text"), " ", token)
        d_parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * ID_STRIDE)).alias("doc_id"),
                mangled.alias("text"),
                "lang",
                "source",
                F.length(mangled).alias("n_chars"),
            )
        )
    _union(d_parts).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    copy_embeddings_jittered(spark, dst, copies)


def main() -> None:
    ops = sys.argv[1:] or DEFAULT_OPS
    registry = load_all()
    spark = get_spark(app_name="scale-probe-30x-control")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    tmp = tempfile.mkdtemp(prefix="scale_probe30c_")
    build_control(spark, tmp, 10)
    build_control(spark, tmp, 30)

    results = {}
    for name in ops:
        fn = registry[name].fn
        out10 = fn(spark, f"{tmp}/x10").count()
        out30 = fn(spark, f"{tmp}/x30").count()
        t10 = time_op(spark, fn, f"{tmp}/x10")
        t30 = time_op(spark, fn, f"{tmp}/x30")
        results[name] = {
            "t10": t10,
            "t30": t30,
            "ratio_30v10": round(t30 / t10, 2) if t10 else None,
            "out10": out10,
            "out30": out30,
        }
        print(name, results[name], flush=True)

    merge_section(OUT, "ops30_control", results)
    spark.stop()


if __name__ == "__main__":
    main()
