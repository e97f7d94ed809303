"""Fifth batch of independent brute-force twins (rationale in
test_metric_bruteforce.py): the grouped r6 statistics — per-nation Gini,
per-slice KS drift, cohort Kaplan-Meier, per-type CUSUM, and per-nation
Spearman — checking the query-level wiring (group keys, spines, arm
splits, quantization) on top of the operator-level references that
already exist.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from tests.test_metric_bruteforce import _events_pdf, _tdiv
from tests.test_metric_bruteforce2 import _round_half_up


def _tpch_pdfs(rng, n_cust=300, n_orders=2000, n_nations=5):
    nation = pd.DataFrame(
        {
            "n_nationkey": np.arange(n_nations),
            "n_name": [f"NATION_{i}" for i in range(n_nations)],
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": np.arange(n_cust),
            "c_nationkey": rng.integers(0, n_nations, n_cust),
            "c_acctbal": rng.uniform(-999, 9999, n_cust).round(2),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders),
            "o_custkey": rng.integers(0, n_cust, n_orders),
            "o_totalprice": rng.uniform(10, 500, n_orders).round(2),
        }
    )
    return nation, customer, orders


def test_gini_by_nation_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.relational import (
        q274_gini_by_nation,
    )

    rng = np.random.default_rng(51)
    nation, customer, orders = _tpch_pdfs(rng)
    nation.to_parquet(tmp_path / "nation.parquet")
    customer.to_parquet(tmp_path / "customer.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    got = {
        r["nation"]: (r["n"], r["total"], r["gini_ppm"])
        for r in q274_gini_by_nation(spark, str(tmp_path)).collect()
    }

    nat_of = dict(zip(customer["c_custkey"], customer["c_nationkey"]))
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    spend: dict[tuple, int] = {}
    for ck, price in zip(orders["o_custkey"], orders["o_totalprice"]):
        key = (name_of[nat_of[int(ck)]], int(ck))
        spend[key] = spend.get(key, 0) + _round_half_up(float(price) * 100)
    by_nation: dict[str, list] = {}
    for (nm, _), cents in spend.items():
        by_nation.setdefault(nm, []).append(cents)
    want = {}
    for nm, vals in by_nation.items():
        vals.sort()
        n, sx = len(vals), sum(vals)
        if sx <= 0:
            continue
        srx = sum((i + 1) * v for i, v in enumerate(vals))
        want[nm] = (n, sx, _tdiv((2 * srx - (n + 1) * sx) * 1_000_000, n * sx))
    assert got == want
    assert all(0 < g < 1_000_000 for _, _, g in want.values())


def test_spearman_by_nation_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.relational import (
        q276_spearman_balance_spend,
    )

    rng = np.random.default_rng(52)
    nation, customer, orders = _tpch_pdfs(rng)
    nation.to_parquet(tmp_path / "nation.parquet")
    customer.to_parquet(tmp_path / "customer.parquet")
    orders.to_parquet(tmp_path / "orders.parquet")
    got = {
        r["nation"]: (r["n"], r["rho"])
        for r in q276_spearman_balance_spend(spark, str(tmp_path)).collect()
    }

    nat_of = dict(zip(customer["c_custkey"], customer["c_nationkey"]))
    bal_of = {
        int(k): _round_half_up(float(b) * 100)
        for k, b in zip(customer["c_custkey"], customer["c_acctbal"])
    }
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    sp: dict[int, int] = {}
    for ck, price in zip(orders["o_custkey"], orders["o_totalprice"]):
        sp[int(ck)] = sp.get(int(ck), 0) + _round_half_up(float(price) * 100)
    rows_by_nation: dict[str, list] = {}
    for ck, cents in sp.items():
        rows_by_nation.setdefault(name_of[nat_of[ck]], []).append(
            (bal_of[ck], cents)
        )

    def doubled_ranks(vals):
        cnt: dict[int, int] = {}
        for v in vals:
            cnt[v] = cnt.get(v, 0) + 1
        below, r2 = 0, {}
        for v in sorted(cnt):
            r2[v] = 2 * below + cnt[v] + 1
            below += cnt[v]
        return r2

    want = {}
    for nm, rows in rows_by_nation.items():
        rx = doubled_ranks([b for b, _ in rows])
        ry = doubled_ranks([s for _, s in rows])
        a = [rx[b] for b, _ in rows]
        b = [ry[s] for _, s in rows]
        n = len(rows)
        sx, sy = sum(a), sum(b)
        sxy = sum(x * y for x, y in zip(a, b))
        sxx = sum(x * x for x in a)
        syy = sum(y * y for y in b)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if dx <= 0 or dy <= 0:
            continue
        want[nm] = (n, float(n * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy)))
    assert set(got) == set(want)
    for nm, (n, rho) in want.items():
        assert got[nm][0] == n
        assert got[nm][1] == pytest.approx(rho, rel=1e-12, abs=1e-12)


def test_ks_drift_by_type_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q275_ks_drift_by_type,
    )

    rng = np.random.default_rng(53)
    pdf = _events_pdf(rng, 5000, 80, 4 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["d_ppm"])
        for r in q275_ks_drift_by_type(spark, str(tmp_path)).collect()
    }

    us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    mid = (int(us.min()) + int(us.max())) // 2
    by_type: dict[str, list] = {}
    for i in range(len(pdf)):
        v = _round_half_up(float(pdf["value"][i]) * 100)
        grp = 1 if us[i] >= mid else 0
        by_type.setdefault(pdf["event_type"][i], []).append((v, grp))
    want = {}
    for k, rows in by_type.items():
        n_a = sum(1 for _, g in rows if g == 0)
        n_b = len(rows) - n_a
        if n_a == 0 or n_b == 0:
            continue
        ca, cb, best = 0, 0, 0
        grouped: dict[int, list] = {}
        for v, g in rows:
            e = grouped.setdefault(v, [0, 0])
            e[g] += 1
        for v in sorted(grouped):
            ca += grouped[v][0]
            cb += grouped[v][1]
            best = max(best, abs(ca * n_b - cb * n_a))
        want[k] = (n_a, n_b, _tdiv(best * 1_000_000, n_a * n_b))
    assert got == want


def test_cohort_survival_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q277_cohort_survival,
    )

    rng = np.random.default_rng(54)
    pdf = _events_pdf(rng, 5000, 120, 21 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        (r["cohort_week"], r["t"]): (
            r["n_risk"], r["n_events"], r["n_censored"], r["log_s_nano"]
        )
        for r in q277_cohort_survival(spark, str(tmp_path)).collect()
    }

    us = pdf["ts"].astype("int64") // 1000
    fl: dict[int, list] = {}
    for u, t in zip(pdf["user_id"], us):
        e = fl.setdefault(int(u), [int(t), int(t)])
        e[0], e[1] = min(e[0], int(t)), max(e[1], int(t))
    m = max(l for _, l in fl.values())
    WEEK, DAY, HORIZON = 604_800_000_000, 86_400_000_000, 43_200_000_000
    cells: dict[tuple, list] = {}
    for f, l in fl.values():
        key = (f // WEEK, (l - f) // DAY)
        e = cells.setdefault(key, [0, 0])
        e[0] += 1
        e[1] += 1 if l <= m - HORIZON else 0
    want = {}
    for cw in {c for c, _ in cells}:
        ts = sorted(t for c, t in cells if c == cw)
        total = sum(cells[(cw, t)][0] for t in ts)
        before, logs, dead = 0, 0, False
        for t in ts:
            n, n_ev = cells[(cw, t)]
            n_risk = total - before
            before += n
            if 0 < n_ev < n_risk:
                logs += math.floor(
                    1_000_000_000.0 * math.log((n_risk - n_ev) / n_risk)
                )
            if n_ev >= n_risk:
                dead = True
            if n_ev > 0:
                want[(cw, t)] = (
                    n_risk, n_ev, n - n_ev, None if dead else logs
                )
    assert got == want
    assert len({c for c, _ in want}) >= 2  # several cohorts exercised


def test_cusum_by_type_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q278_cusum_by_type,
    )

    rng = np.random.default_rng(55)
    pdf = _events_pdf(rng, 6000, 70, 4 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["event_type"]: (
            r["n_hours"], r["n_events"], r["change_at_hour"],
            r["peak_micro_events"],
        )
        for r in q278_cusum_by_type(spark, str(tmp_path)).collect()
    }

    us = pdf["ts"].astype("int64") // 1000
    h = (us // 3_600_000_000).to_numpy()
    h0, h1 = int(h.min()), int(h.max())
    n = h1 - h0 + 1
    counts: dict[str, np.ndarray] = {}
    for hi, k in zip(h, pdf["event_type"]):
        counts.setdefault(k, np.zeros(n, dtype=np.int64))[hi - h0] += 1
    want = {}
    for k, c in counts.items():
        total = int(c.sum())
        s, peak, arg = 0, -1, None
        for i in range(n):
            s += n * int(c[i]) - total
            if abs(s) > peak:
                peak, arg = abs(s), h0 + i
        want[k] = (n, total, arg, peak * 1_000_000 // n)
    assert got == want
