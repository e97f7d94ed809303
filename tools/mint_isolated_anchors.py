#!/usr/bin/env python3
"""Mint per-process isolated bench anchors (r11 verdict task 6).

The in-suite anchors (BENCH_ANCHOR_COLD.json) are position-dependent: a
query's number amortizes JVM/JIT/codegen state accumulated by the 50+
queries that ran before it in the same session.  Three rounds of drift
triage (q143 in r10/r11, q16 in r11) traced back to exactly that — so this
tool records, for every headline query, its time in a FRESH JVM: one
``SPARK_GRAFT_BENCH_ONLY=<query> bench.py`` subprocess per (query, session),
best-of-3 cache-cold runs inside the session (bench.py's own discipline),
minima across sessions as the stable statistic (r11 finding: fresh-process
numbers are only comparable to other fresh-process numbers; minima filter
load bursts, which are upward-only).

Sessions are interleaved session-major (session 1 of every query, then
session 2, ...) so a sustained host-load period taxes all queries instead
of concentrating on whichever query was being minted at the time.

State is written incrementally to ``--state`` after every session, so the
mint is resumable (Ctrl-C / crash / chunked runs all pick up where they
left off).  ``--finalize`` folds the state into the output artifact.

Usage:
  python tools/mint_isolated_anchors.py --queries q16_user_sessions,q01_pricing_summary --sessions 4
  python tools/mint_isolated_anchors.py --all --sessions 3          # full headline set
  python tools/mint_isolated_anchors.py --finalize --out BENCH_ANCHOR_ISOLATED.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

DEFAULT_STATE = ROOT / ".scratch" / "anchor_mint_state.json"

#: stamped on every entry written by a --merge finalize in THIS round
MINT_ROUND = 15


def headline_names() -> list[str]:
    import bench

    return list(bench.HEADLINE)


def load_state(path: Path) -> dict:
    if path.exists():
        with open(path) as f:
            return json.load(f)
    return {"sessions": {}}


def save_state(path: Path, state: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, path)


def run_session(name: str, sf_dir: str, runs: int) -> dict:
    """One fresh-JVM bench session for a single query; returns the parsed
    full report's timing plus the session's ambient loadavg."""
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = name
    env["SPARK_GRAFT_BENCH_RUNS"] = str(runs)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    load0 = os.getloadavg()[0]
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        cwd=str(ROOT),
        timeout=1800,
    )
    wall = round(time.time() - t0, 1)
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench session for {name} failed (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}"
        )
    report = json.loads(proc.stdout.splitlines()[0])
    t = report["queries"][name]
    return {"sec": t, "loadavg_pre": round(load0, 2), "wall": wall}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sessions", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--state", default=str(DEFAULT_STATE))
    ap.add_argument("--finalize", action="store_true")
    ap.add_argument(
        "--merge",
        action="store_true",
        help="with --finalize: keep the existing artifact's entries for "
        "queries NOT in the minted namespace (partial re-mint after a "
        "plan change — r13 verdict task 2 — without losing full headline "
        "coverage; re-minted entries carry their mint round)",
    )
    ap.add_argument("--out", default=str(ROOT / "BENCH_ANCHOR_ISOLATED.json"))
    ap.add_argument(
        "--label",
        default="",
        help="state-file namespace (e.g. 'pre_change' vs 'final'); keeps "
        "probe samples from mixing with final-tree anchor samples",
    )
    args = ap.parse_args()

    state_path = Path(args.state)
    state = load_state(state_path)
    ns = state.setdefault(args.label or "default", {})

    if args.finalize:
        # r12 ADVICE: finalizing with a mismatched/omitted --label on a
        # state file minted under another label would silently overwrite
        # the anchor artifact with an empty 0-query one (history kept,
        # minima lost) — refuse, and say which namespaces hold samples.
        if not ns:
            have = sorted(k for k, v in state.items() if v)
            sys.exit(
                f"--finalize: namespace {args.label or 'default'!r} in "
                f"{state_path} holds no samples; namespaces with samples: "
                f"{have or 'none'} (pass the matching --label)"
            )
        finalize(ns, args)
        return

    names = headline_names() if args.all else [
        n.strip() for n in args.queries.split(",") if n.strip()
    ]
    known = set(headline_names())
    unknown = [n for n in names if n not in known]
    if unknown:
        sys.exit(f"not in HEADLINE: {unknown}")
    if not names:
        sys.exit("nothing to do: pass --queries or --all")

    for s in range(args.sessions):
        for name in names:
            samples = ns.setdefault(name, [])
            if len(samples) >= args.sessions:
                continue
            print(
                f"[{time.strftime('%H:%M:%S')}] session {len(samples)+1}/"
                f"{args.sessions} {name} (loadavg {os.getloadavg()[0]:.2f})",
                flush=True,
            )
            rec = run_session(name, args.sf_dir, args.runs)
            samples.append(rec)
            save_state(state_path, state)
            print(f"    -> {rec['sec']}s (wall {rec['wall']}s)", flush=True)
    print("done; state at", state_path)


def finalize(ns: dict, args: argparse.Namespace) -> None:
    """Fold the state namespace into the anchor artifact format."""
    cold = {}
    cold_path = ROOT / "BENCH_ANCHOR_COLD.json"
    if cold_path.exists():
        with open(cold_path) as f:
            cold = json.load(f).get("queries", {})
    # preserve the r11 q143-settlement artifact (pre/post probe legs) —
    # it documents WHY the isolated methodology exists
    history = None
    prev = {}
    out_path = Path(args.out)
    if out_path.exists():
        with open(out_path) as f:
            prev = json.load(f)
        history = prev.get("history_r11", prev if prev.get("round") == 11 else None)
    out = {
        "artifact": "per-process isolated anchors, full headline set (r11 verdict task 6)",
        "round": 12,
        "sf": 0.1,
        "methodology": (
            "SPARK_GRAFT_BENCH_ONLY=<query> bench.py per (query, session): "
            "fresh JVM, bench.py warmups, best-of-%d cache-cold runs; "
            "sessions interleaved session-major; minimum across sessions is "
            "the anchor. Isolated numbers are only comparable to isolated "
            "numbers (fresh-process inflation vs in-suite, r11 finding); "
            "bench.py cancels the methodology factor via the q01 in-session "
            "control (vs_anchor_isolated_ctrl)." % args.runs
        ),
        "queries": {},
    }
    if args.merge:
        out["queries"].update(prev.get("queries", {}))
        if prev.get("round"):
            out["round"] = prev["round"]
            out["reminted_rounds"] = sorted(
                set(prev.get("reminted_rounds", [])) | {MINT_ROUND}
            )
    for name, samples in sorted(ns.items()):
        secs = [s["sec"] for s in samples]
        entry = {
            "sessions": secs,
            "loadavg_pre": [s["loadavg_pre"] for s in samples],
            "min": min(secs),
        }
        if args.merge:
            entry["minted_round"] = MINT_ROUND
        if name in cold:
            entry["anchor_cold"] = cold[name]
            entry["min_vs_cold"] = round(min(secs) / cold[name], 3)
        out["queries"][name] = entry
    if history:
        out["history_r11"] = history
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}: {len(out['queries'])} queries")


if __name__ == "__main__":
    main()
