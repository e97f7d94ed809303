"""Multi-scale oracle-parity sweep — the scale-sensitive-bug net.

Runs the exact driver-mirror parity suite (tests/test_oracle_parity.py:
row count + column names + full value multiset vs DuckDB, no tolerance)
at EVERY generated scale factor and records one JSON artifact. The
driver's own gate runs at sf0.01; the suite default is sf0.001; this
sweep adds sf0.1 — bench scale, where multi-partition inputs exercise
partition-boundary sampling, AQE re-planning, and spill paths that the
small scales plan away (the round-7 partition-id row-loss bug in
ks_grouped was invisible below sf0.1 — this sweep is what caught it).

Usage: ``python tools/parity_sweep.py [out.json]`` (default
``PARITY_SWEEP_r07.json`` at the repo root). Each scale runs in a fresh
pytest process so Spark session state can't bleed between scales.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = ["sf0.001", "sf0.01", "sf0.1"]


def run_scale(sf: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_ORACLE_DIR"] = f"/root/testdata/{sf}"
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_oracle_parity.py", "-q"],
        cwd=ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    tail = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
    m = re.search(r"(\d+) passed", tail)
    f = re.search(r"(\d+) failed", tail)
    failed_names = re.findall(
        r"FAILED tests/test_oracle_parity\.py::\S*\[(\S+)\]", proc.stdout
    )
    return {
        "passed": int(m.group(1)) if m else 0,
        "failed": int(f.group(1)) if f else 0,
        "failed_queries": failed_names,
        "summary_line": tail,
    }


def main() -> None:
    out_path = os.path.join(
        ROOT,
        sys.argv[1]
        if len(sys.argv) > 1
        else os.environ.get(
            "SPARK_GRAFT_PARITY_SWEEP_OUT", "PARITY_SWEEP_r08.json"
        ),
    )
    report = {"metric": "oracle_parity_by_scale", "scales": {}}
    for sf in SCALES:
        print(f"sweeping {sf} ...", flush=True)
        report["scales"][sf] = run_scale(sf)
        print(sf, report["scales"][sf]["summary_line"], flush=True)
    report["all_green"] = all(
        s["failed"] == 0 and s["passed"] > 0
        for s in report["scales"].values()
    )
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
