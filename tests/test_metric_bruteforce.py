"""Independent brute-force twins for the r6 metric queries.

These queries are oracle-parity-checked, but Spark and DuckDB both run MY
formula — a shared formula-level misconception would pass parity on both
engines. Each test here recomputes the metric from scratch in plain
Python/numpy on a random fixture written to tmp_path, so the reference
implementation shares NO code (and no SQL) with the engine under test.

Division discipline: Spark's ``div`` and DuckDB's ``//`` truncate toward
zero; Python's ``//`` floors toward -inf. ``_tdiv`` emulates truncation
wherever an operand can be negative. Quantization uses ``math.floor``
(toward -inf) exactly as ``F.floor`` does.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _events_pdf(rng, n, n_users, span_us, base=1_700_000_000_000_000):
    return pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.to_datetime(
                base + rng.integers(0, span_us, n), unit="us"
            ),
            "user_id": rng.integers(0, n_users, n),
            "event_type": rng.choice(
                ["view", "click", "purchase"], n, p=[0.6, 0.3, 0.1]
            ),
            "value": rng.uniform(1, 50, n).round(2),
            "props": "{}",
        }
    )


def test_ndcg_user_feeds_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        _NDCG_DISC,
        q237_ndcg_user_feeds,
    )

    rng = np.random.default_rng(11)
    pdf = _events_pdf(rng, 3000, 120, 3 * 86_400_000_000)
    # force ts ties inside a user so the event_id tie-break is exercised
    pdf.loc[1, ["user_id", "ts"]] = pdf.loc[0, ["user_id", "ts"]]
    pdf.to_parquet(tmp_path / "events.parquet")
    got = q237_ndcg_user_feeds(spark, str(tmp_path)).collect()[0]

    disc = dict(_NDCG_DISC)
    rel_of = {"purchase": 3, "click": 1, "view": 0}
    rows = [
        (int(u), int(t.value) // 1000, int(e), rel_of[k])
        for u, t, e, k in zip(
            pdf["user_id"], pdf["ts"], pdf["event_id"], pdf["event_type"]
        )
    ]
    per_user: dict[int, list] = {}
    for u, us, eid, rel in rows:
        per_user.setdefault(u, []).append((us, eid, rel))
    permille = []
    for evs in per_user.values():
        feed = sorted(evs)  # (us, event_id) order
        ideal = sorted(evs, key=lambda r: (-r[2], r[0], r[1]))
        dcg = sum(r[2] * disc[i + 1] for i, r in enumerate(feed[:10]))
        idcg = sum(r[2] * disc[i + 1] for i, r in enumerate(ideal[:10]))
        if idcg > 0:
            permille.append(dcg * 1000 // idcg)
    assert got["n_users"] == len(permille)
    assert got["mean_ndcg_permille"] == sum(permille) // len(permille)
    assert got["min_ndcg_permille"] == min(permille)
    # fixture exercises non-trivial NDCG (a 0 minimum is legitimate:
    # all of a user's relevant events can fall after position 10)
    assert 0 < sum(permille) // len(permille) < 1000


def _hourly_counts(pdf):
    us = pdf["ts"].astype("int64") // 1000
    h = us // 3_600_000_000
    counts = h.value_counts().to_dict()
    h0, h1 = int(h.min()), int(h.max())
    return [int(counts.get(i, 0)) for i in range(h0, h1 + 1)], h0


def test_hourly_autocorrelation_matches_numpy(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q248_hourly_autocorrelation,
    )

    rng = np.random.default_rng(12)
    pdf = _events_pdf(rng, 5000, 50, 4 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r["lag"]: r
        for r in q248_hourly_autocorrelation(spark, str(tmp_path)).collect()
    }

    c, _ = _hourly_counts(pdf)
    for lag in (1, 2, 3, 6, 12, 24):
        x = np.array(c[: len(c) - lag], dtype=np.int64)
        y = np.array(c[lag:], dtype=np.int64)
        n = len(x)
        num = n * int((x * y).sum()) - int(x.sum()) * int(y.sum())
        dx = n * int((x * x).sum()) - int(x.sum()) ** 2
        dy = n * int((y * y).sum()) - int(y.sum()) ** 2
        want = float(num) / (math.sqrt(dx) * math.sqrt(dy))
        assert got[lag]["n_pairs"] == n
        assert got[lag]["acf"] == pytest.approx(want, rel=1e-9, abs=1e-12)


def test_cusum_changepoint_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q249_cusum_changepoint,
    )

    rng = np.random.default_rng(13)
    # regime shift: second half of the span is 4x denser
    a = _events_pdf(rng, 1500, 50, 2 * 86_400_000_000)
    b = _events_pdf(rng, 6000, 50, 2 * 86_400_000_000,
                    base=1_700_000_000_000_000 + 2 * 86_400_000_000)
    b["event_id"] += 1500
    pdf = pd.concat([a, b], ignore_index=True)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = q249_cusum_changepoint(spark, str(tmp_path)).collect()[0]

    c, h0 = _hourly_counts(pdf)
    n, total = len(c), sum(c)
    s, peak, arg = 0, -1, None
    for i, ci in enumerate(c):
        s += n * ci - total
        if abs(s) > peak:
            peak, arg = abs(s), h0 + i
    assert got["n_hours"] == n and got["n_events"] == total
    assert got["change_at_hour"] == arg
    assert got["peak_micro_events"] == peak * 1_000_000 // n
    assert peak > 0  # the shift must register


def test_transition_entropy_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q250_transition_entropy,
    )

    rng = np.random.default_rng(14)
    pdf = _events_pdf(rng, 4000, 60, 3 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = q250_transition_entropy(spark, str(tmp_path)).collect()[0]

    us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    order = sorted(
        range(len(pdf)),
        key=lambda i: (int(pdf["user_id"][i]), int(us[i]),
                       int(pdf["event_id"][i])),
    )
    nxy: dict[tuple, int] = {}
    for i, j in zip(order, order[1:]):
        if pdf["user_id"][i] == pdf["user_id"][j]:
            key = (pdf["event_type"][i], pdf["event_type"][j])
            nxy[key] = nxy.get(key, 0) + 1
    nx: dict[str, int] = {}
    for (x, _), c in nxy.items():
        nx[x] = nx.get(x, 0) + c
    n = sum(nxy.values())
    contrib = sum(
        math.floor(1_000_000.0 * c * math.log(nx[x] / c))
        for (x, _), c in nxy.items()
    )
    assert got["n_transitions"] == n
    assert got["n_cells"] == len(nxy)
    assert got["cond_entropy_micro_nats"] == _tdiv(contrib, n)
    assert got["cond_entropy_micro_nats"] > 0


def _docs_pdf(rng, n):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(words, rng.integers(5, 90)))
        for _ in range(n)
    ]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "text": texts,
            "n_chars": [len(t) for t in texts],
            "lang": rng.choice(["en", "de", "fr"], n, p=[0.6, 0.25, 0.15]),
            "source": rng.choice(["web", "wiki", "books", "code"], n),
        }
    )


def test_cohens_kappa_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q251_cohens_kappa_labelers,
    )

    rng = np.random.default_rng(15)
    pdf = _docs_pdf(rng, 2500)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = q251_cohens_kappa_labelers(spark, str(tmp_path)).collect()[0]

    r1 = [1 if c >= 250 else 0 for c in pdf["n_chars"]]
    r2 = [1 if len(t.split(" ")) >= 40 else 0 for t in pdf["text"]]
    n = len(pdf)
    agree = sum(1 for a, b in zip(r1, r2) if a == b)
    n1, n2 = sum(r1), sum(r2)
    pe_num = n1 * n2 + (n - n1) * (n - n2)
    want = _tdiv((n * agree - pe_num) * 1_000_000, n * n - pe_num)
    assert (got["n"], got["agree"]) == (n, agree)
    assert got["kappa_ppm"] == want
    assert 0 in r1 and 1 in r1  # both labels live, kappa non-degenerate


def test_mutual_info_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q238_mutual_info_lang_source,
    )

    rng = np.random.default_rng(16)
    pdf = _docs_pdf(rng, 2500)
    # induce real dependence: one source is mostly one language
    dep = rng.integers(0, 2500, 600)
    pdf.loc[dep, "source"] = "code"
    pdf.loc[dep, "lang"] = "en"
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = q238_mutual_info_lang_source(spark, str(tmp_path)).collect()[0]

    nxy: dict[tuple, int] = {}
    for lg, sr in zip(pdf["lang"], pdf["source"]):
        nxy[(lg, sr)] = nxy.get((lg, sr), 0) + 1
    nx: dict[str, int] = {}
    ny: dict[str, int] = {}
    for (lg, sr), c in nxy.items():
        nx[lg] = nx.get(lg, 0) + c
        ny[sr] = ny.get(sr, 0) + c
    n = sum(nxy.values())
    contrib = sum(
        math.floor(1_000_000.0 * c * math.log((c * n) / (nx[lg] * ny[sr])))
        for (lg, sr), c in nxy.items()
    )
    assert got["n"] == n and got["n_cells"] == len(nxy)
    assert got["mi_micro_nats"] == _tdiv(contrib, n)
    assert got["mi_micro_nats"] > 0  # the induced dependence must show


def test_conformal_interval_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q267_conformal_interval,
    )

    rng = np.random.default_rng(17)
    pdf = _docs_pdf(rng, 2000)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = q267_conformal_interval(spark, str(tmp_path)).collect()[0]

    xs = [int(c) for c in pdf["n_chars"]]
    ys = [len(t.split(" ")) for t in pdf["text"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope_u = _tdiv((n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx)
    icept_m = _tdiv(
        (sy * (n * sxx - sx * sx) - sx * (n * sxy - sx * sy)) * 1000,
        n * (n * sxx - sx * sx),
    )
    res = sorted(
        abs(y * 1_000_000 - (slope_u * x + icept_m * 1000))
        for x, y in zip(xs, ys)
    )
    kk = (n + 1) * 9 // 10 + (1 if (n + 1) * 9 % 10 > 0 else 0)
    qhat = res[min(kk, n) - 1]
    cov = sum(1 for r in res if r <= qhat) * 1000 // n
    assert got["n"] == n
    assert got["qhat_micro"] == qhat
    assert got["coverage_permille"] == cov
    assert cov >= 900  # split-conformal guarantee at alpha=0.1
