"""Second batch of independent brute-force twins (see
test_metric_bruteforce.py for the rationale and division discipline):
odds ratio, MRR/hit-rate, Brier, decile gains, CCF, session entry/exit,
lag features, and the quantile treatment effect.

Float discipline: Spark's ``F.round`` on doubles goes through
``BigDecimal.valueOf(double)`` (shortest decimal repr) with HALF_UP —
``Decimal(repr(x))`` + ROUND_HALF_UP reproduces it exactly, where a naive
``floor(x + 0.5)`` can misround near representation boundaries.
"""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from tests.test_metric_bruteforce import _events_pdf, _hourly_counts, _tdiv


def _round_half_up(x: float) -> int:
    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _md5_arm(user_id) -> int:
    return int(hashlib.md5(str(int(user_id)).encode()).hexdigest()[:8], 16) % 2


def test_purchase_odds_ratio_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q247_purchase_odds_ratio,
    )

    rng = np.random.default_rng(21)
    pdf = _events_pdf(rng, 4000, 150, 3 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = q247_purchase_odds_ratio(spark, str(tmp_path)).collect()[0]

    bought: dict[int, int] = {}
    for u, k in zip(pdf["user_id"], pdf["event_type"]):
        bought[int(u)] = max(bought.get(int(u), 0), 1 if k == "purchase" else 0)
    cells = {(0, 1): 0, (0, 0): 0, (1, 1): 0, (1, 0): 0}
    for u, bt in bought.items():
        cells[(_md5_arm(u), bt)] += 1
    a, b = cells[(0, 1)], cells[(0, 0)]
    c, d = cells[(1, 1)], cells[(1, 0)]
    assert (got["a"], got["b"], got["c"], got["d"]) == (a, b, c, d)
    assert got["log_or_micro"] == math.floor(
        1_000_000.0 * math.log(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5)))
    )
    assert got["half_ci_micro"] == math.floor(
        1_000_000.0 * 1.959964
        * math.sqrt(1 / (a + 0.5) + 1 / (b + 0.5) + 1 / (c + 0.5) + 1 / (d + 0.5))
    )
    assert min(a, b, c, d) > 0  # all four cells populated


def test_mrr_hit_rate_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q259_mrr_hit_rate,
    )

    rng = np.random.default_rng(22)
    pdf = _events_pdf(rng, 3500, 140, 3 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = q259_mrr_hit_rate(spark, str(tmp_path)).collect()[0]

    per_user: dict[int, list] = {}
    us = pdf["ts"].astype("int64") // 1000
    for i in range(len(pdf)):
        per_user.setdefault(int(pdf["user_id"][i]), []).append(
            (int(us[i]), int(pdf["event_id"][i]), pdf["event_type"][i])
        )
    mrr_sum, hits, n_users = 0, 0, 0
    for evs in per_user.values():
        n_users += 1
        first_p = next(
            (pos for pos, (_, _, k) in enumerate(sorted(evs), start=1)
             if k == "purchase"),
            None,
        )
        if first_p is not None:
            mrr_sum += 1_000_000 // first_p
            hits += 1 if first_p <= 10 else 0
    assert got["n_users"] == n_users
    assert got["mrr_micro"] == mrr_sum // n_users
    assert got["hit10_permille"] == hits * 1000 // n_users
    assert 0 < got["hit10_permille"] < 1000


def _emb_pdf(rng, n, dims=16):
    return pd.DataFrame(
        {
            "vec_id": np.arange(n),
            "embedding": [
                rng.uniform(-1, 1, dims).astype(np.float32) for _ in range(n)
            ],
            "label": rng.integers(0, 10, n).astype(np.int32),
        }
    )


def _q223_score_py(vec) -> int:
    acc = float(np.float32(vec[0]))
    for i in range(1, 8):
        acc = acc + float(np.float32(vec[i]))  # left-assoc double adds
    return _round_half_up(acc * 1_000_000.0)


def test_brier_rank_calibrated_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q260_brier_rank_calibrated,
    )

    rng = np.random.default_rng(23)
    pdf = _emb_pdf(rng, 1500)
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = q260_brier_rank_calibrated(spark, str(tmp_path)).collect()[0]

    rows = [
        (_q223_score_py(v), 1 if lab >= 5 else 0)
        for v, lab in zip(pdf["embedding"], pdf["label"])
    ]
    g: dict[int, list] = {}
    for s, p in rows:
        g.setdefault(s, [0, 0])
        g[s][0] += 1
        g[s][1] += p
    nt = len(rows)
    below, total = 0, 0
    for s in sorted(g):
        n, np_ = g[s]
        perm = below * 1000 // nt
        total += np_ * (perm - 1000) ** 2 + (n - np_) * perm * perm
        below += n
    assert got["n_total"] == nt
    assert got["brier_micro"] == total // nt
    assert 0 < got["brier_micro"] < 1_000_000


def test_decile_gains_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import q261_decile_gains

    rng = np.random.default_rng(24)
    pdf = _emb_pdf(rng, 1500)
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = {
        r["decile"]: r for r in q261_decile_gains(spark, str(tmp_path)).collect()
    }

    rows = [
        (_q223_score_py(v), 1 if lab >= 5 else 0)
        for v, lab in zip(pdf["embedding"], pdf["label"])
    ]
    g: dict[int, list] = {}
    for s, p in rows:
        g.setdefault(s, [0, 0])
        g[s][0] += 1
        g[s][1] += p
    nt = len(rows)
    pt = sum(p for _, p in rows)
    dd: dict[int, list] = {}
    above = 0
    for s in sorted(g, reverse=True):
        n, np_ = g[s]
        dec = above * 10 // nt
        dd.setdefault(dec, [0, 0])
        dd[dec][0] += n
        dd[dec][1] += np_
        above += n
    cn, cp = 0, 0
    assert set(got) == set(dd)
    for dec in sorted(dd):
        n_rows, n_pos = dd[dec]
        cn, cp = cn + n_rows, cp + n_pos
        r = got[dec]
        assert (r["n_rows"], r["n_pos"]) == (n_rows, n_pos)
        assert r["rate_permille"] == n_pos * 1000 // n_rows
        assert r["cum_lift_permille"] == cp * nt * 1000 // (cn * pt)
    # top decile must actually concentrate positives vs a ~50% base rate
    assert got[0]["cum_lift_permille"] > 1000


def test_purchase_error_ccf_matches_numpy(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q265_purchase_error_ccf,
    )

    rng = np.random.default_rng(25)
    pdf = _events_pdf(rng, 6000, 60, 4 * 86_400_000_000)
    # re-roll types to include errors
    pdf["event_type"] = rng.choice(
        ["view", "click", "purchase", "error"], len(pdf), p=[0.5, 0.2, 0.2, 0.1]
    )
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["lag"]: r
        for r in q265_purchase_error_ccf(spark, str(tmp_path)).collect()
    }

    us = pdf["ts"].astype("int64") // 1000
    h = (us // 3_600_000_000).to_numpy()
    h0, h1 = int(h.min()), int(h.max())
    p = np.zeros(h1 - h0 + 1, dtype=np.int64)
    x = np.zeros(h1 - h0 + 1, dtype=np.int64)
    for hi, k in zip(h, pdf["event_type"]):
        if k == "purchase":
            p[hi - h0] += 1
        elif k == "error":
            x[hi - h0] += 1
    for lag in (-6, -3, -1, 0, 1, 3, 6):
        if lag >= 0:
            pv, xv = p[: len(p) - lag or None], x[lag:]
        else:
            pv, xv = p[-lag:], x[: len(x) + lag]
        n = len(pv)
        num = n * int((pv * xv).sum()) - int(pv.sum()) * int(xv.sum())
        dx = n * int((pv * pv).sum()) - int(pv.sum()) ** 2
        dy = n * int((xv * xv).sum()) - int(xv.sum()) ** 2
        want = float(num) / (math.sqrt(dx) * math.sqrt(dy))
        assert got[lag]["n_pairs"] == n
        assert got[lag]["ccf"] == pytest.approx(want, rel=1e-9, abs=1e-12)


def _sessions(pdf, gap=1_800_000_000):
    us = pdf["ts"].astype("int64") // 1000
    rows = sorted(
        (int(pdf["user_id"][i]), int(us[i]), int(pdf["event_id"][i]),
         pdf["event_type"][i])
        for i in range(len(pdf))
    )
    sessions, cur = [], None
    for u, t, e, k in rows:
        if cur is None or cur[0] != u or t - cur[1] > gap:
            if cur is not None:
                sessions.append(cur[2])
            cur = (u, t, [k])
        else:
            cur = (u, t, cur[2] + [k])
    sessions.append(cur[2])
    return sessions


def test_session_entry_exit_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q266_session_entry_exit,
    )

    rng = np.random.default_rng(26)
    pdf = _events_pdf(rng, 4000, 80, 5 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["event_type"]: r
        for r in q266_session_entry_exit(spark, str(tmp_path)).collect()
    }

    entries: dict[str, int] = {}
    exits: dict[str, int] = {}
    bounces: dict[str, int] = {}
    for types in _sessions(pdf):
        entries[types[0]] = entries.get(types[0], 0) + 1
        exits[types[-1]] = exits.get(types[-1], 0) + 1
        if len(types) == 1:
            bounces[types[0]] = bounces.get(types[0], 0) + 1
    assert set(got) == set(entries) | set(exits)
    for k, r in got.items():
        ne = entries.get(k, 0)
        assert r["n_entries"] == ne
        assert r["n_exits"] == exits.get(k, 0)
        assert r["n_bounces"] == bounces.get(k, 0)
        assert r["bounce_permille"] == (
            bounces.get(k, 0) * 1000 // ne if ne else 0
        )
    assert sum(bounces.values()) > 0  # sessionization actually bounces


def test_lag_features_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q269_lag_features,
    )

    rng = np.random.default_rng(27)
    pdf = _events_pdf(rng, 3000, 70, 4 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["user_id"]: r for r in q269_lag_features(spark, str(tmp_path)).collect()
    }

    us = pdf["ts"].astype("int64") // 1000
    per_user: dict[int, list] = {}
    for i in range(len(pdf)):
        if pdf["event_type"][i] != "purchase":
            continue
        cents = _round_half_up(float(pdf["value"][i]) * 100)
        per_user.setdefault(int(pdf["user_id"][i]), []).append(
            (int(us[i]), int(pdf["event_id"][i]), cents)
        )
    want = {}
    for u, evs in per_user.items():
        seq = [c for _, _, c in sorted(evs)]
        lag1 = seq[-2] if len(seq) >= 2 else -1
        lag2 = seq[-3] if len(seq) >= 3 else -1
        tail = seq[-3:]
        want[u] = (seq[-1], lag1, lag2, sum(tail) * 100 // len(tail))
    assert set(got) == set(want)
    for u, (cents, l1, l2, m3) in want.items():
        r = got[u]
        assert (r["cents"], r["lag1_cents"], r["lag2_cents"]) == (cents, l1, l2)
        assert r["mean3_centicents"] == m3
    assert any(len(v) >= 3 for v in per_user.values())  # full windows hit


def test_quantile_treatment_effect_matches_numpy(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q273_quantile_treatment_effect,
    )

    rng = np.random.default_rng(28)
    pdf = _events_pdf(rng, 5000, 200, 3 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = q273_quantile_treatment_effect(spark, str(tmp_path)).collect()[0]

    arms: dict[str, list] = {"A": [], "B": []}
    for i in range(len(pdf)):
        if pdf["event_type"][i] != "purchase":
            continue
        arm = "A" if _md5_arm(pdf["user_id"][i]) == 0 else "B"
        arms[arm].append(_round_half_up(float(pdf["value"][i]) * 100))
    for arm in ("A", "B"):
        vals = np.array(sorted(arms[arm]), dtype=np.float64)
        for name, q in (("p25", 0.25), ("p50", 0.5), ("p75", 0.75)):
            want = float(np.quantile(vals, q, method="linear"))
            assert got[f"{arm.lower()}_{name}"] == pytest.approx(
                want, rel=1e-12, abs=1e-9
            )
    assert got["qte_p50"] == pytest.approx(
        got["b_p50"] - got["a_p50"], abs=1e-9
    )
    assert len(arms["A"]) > 50 and len(arms["B"]) > 50

def test_revenue_attribution_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q254_revenue_attribution,
    )

    rng = np.random.default_rng(29)
    pdf = _events_pdf(rng, 4000, 80, 5 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        (r["model"], r["channel"]): (r["n_sessions"], r["rev_cents"])
        for r in q254_revenue_attribution(spark, str(tmp_path)).collect()
    }

    us = pdf["ts"].astype("int64") // 1000
    rows = sorted(
        (int(pdf["user_id"][i]), int(us[i]), int(pdf["event_id"][i]),
         pdf["event_type"][i], _round_half_up(float(pdf["value"][i]) * 100))
        for i in range(len(pdf))
    )
    want: dict[tuple, list] = {}
    sess, cur_u, cur_t = [], None, None
    GAP = 1_800_000_000

    def _flush(s):
        rev = sum(c for _, k, c in s if k == "purchase")
        if rev <= 0:
            return
        fp = next(i for i, (_, k, _) in enumerate(s) if k == "purchase")
        first_type = s[0][1]
        last_touch = s[fp - 1][1] if fp > 0 else "direct"
        for key in (("first_touch", first_type), ("last_touch", last_touch)):
            e = want.setdefault(key, [0, 0])
            e[0] += 1
            e[1] += rev

    for u, t, e, k, c in rows:
        if cur_u != u or t - cur_t > GAP:
            if sess:
                _flush(sess)
            sess = []
        sess.append((t, k, c))
        cur_u, cur_t = u, t
    _flush(sess)
    assert got == {k: tuple(v) for k, v in want.items()}
    assert ("last_touch", "direct") in got  # purchase-opened sessions exist


def test_oof_target_encoding_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q255_oof_target_encoding,
    )

    rng = np.random.default_rng(30)
    pdf = _events_pdf(rng, 3000, 90, 3 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        (r["event_type"], r["fold"]): (r["n_rows"], r["encoding_micro_cents"])
        for r in q255_oof_target_encoding(spark, str(tmp_path)).collect()
    }

    pf: dict[tuple, list] = {}
    for i in range(len(pdf)):
        fold = (
            int(hashlib.md5(str(int(pdf["event_id"][i])).encode())
                .hexdigest()[:8], 16) % 5
        )
        cents = _round_half_up(float(pdf["value"][i]) * 100)
        e = pf.setdefault((pdf["event_type"][i], fold), [0, 0])
        e[0] += cents
        e[1] += 1
    tot: dict[str, list] = {}
    for (k, _), (s, c) in pf.items():
        e = tot.setdefault(k, [0, 0])
        e[0] += s
        e[1] += c
    want = {
        (k, f): (c, (tot[k][0] - s) * 1_000_000 // (tot[k][1] - c))
        for (k, f), (s, c) in pf.items()
        if tot[k][1] > c
    }
    assert got == want
    assert len({k for k, _ in want}) >= 3  # several types encoded
