"""Brute-force twins closing the round-8 inventory (VERDICT r7 task 6).

The remaining formula-mirroring oracles without an independent recompute:
OHLC bars (q200), the A/B chi-square verdict (q204), the hour-of-week
seasonal MAE (q226), the dyadic EWMA (q230), the count-min and HLL
sketches (q109/q135 — their md5 hash layout is re-derived here through
``hashlib``, a THIRD independent md5 implementation next to Spark's JVM
and DuckDB's native one), and the per-language conformal radii (q279).
Same discipline as the rest of the family: plain Python/numpy on a random
tmp_path fixture, no shared code or SQL, Spark's truncating ``div``
emulated by ``_tdiv``.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _u60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


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


def _docs_pdf(rng, n):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    texts = [
        " ".join(rng.choice(words, rng.integers(5, 90))) for _ in range(n)
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


def test_ohlc_bars_match_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q200_ohlc_bars,
    )

    rng = np.random.default_rng(81)
    pdf = _events_pdf(rng, 4000, 60, 2 * 86_400_000_000)
    # force a timestamp tie inside one (type, hour) so the event_id
    # tie-break on open/close is exercised
    pdf.loc[1, ["ts", "event_type"]] = pdf.loc[0, ["ts", "event_type"]]
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        (r.event_type, r.hour_bucket): r
        for r in q200_ohlc_bars(spark, str(tmp_path)).collect()
    }

    bars: dict[tuple, list] = {}
    for eid, ts, et, v in zip(
        pdf["event_id"], pdf["ts"], pdf["event_type"], pdf["value"]
    ):
        us = int(ts.value) // 1000
        cents = round(float(v) * 100)
        # banker's rounding differences: emulate engine round-half-even on
        # the *100 grid exactly the way numpy wrote the fixture (2-decimal
        # values => *100 is integral up to float error; round() matches)
        bars.setdefault((et, us // 3_600_000_000), []).append(
            (us * 10_000_000 + int(eid), int(cents))
        )
    assert got.keys() == bars.keys()
    for key, rows in bars.items():
        rows.sort()
        cents = [c for _, c in rows]
        r = got[key]
        assert (
            r.open_cents,
            r.high_cents,
            r.low_cents,
            r.close_cents,
            r.n,
        ) == (rows[0][1], max(cents), min(cents), rows[-1][1], len(rows))


def test_ab_chisq_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q204_ab_test_chisq,
    )

    rng = np.random.default_rng(82)
    pdf = _events_pdf(rng, 6000, 400, 5 * 86_400_000_000)
    # _events_pdf values are uniform(1, 50) but conversion requires a
    # purchase with value >= 90 — lift a random slice of purchases over
    # the threshold so both converted and unconverted users exist in both
    # arms and the chi-square verdict path is actually exercised
    purchases = pdf.index[pdf["event_type"] == "purchase"]
    lifted = rng.choice(purchases, size=len(purchases) // 3, replace=False)
    pdf.loc[lifted, "value"] = rng.uniform(90, 120, len(lifted)).round(2)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = q204_ab_test_chisq(spark, str(tmp_path)).collect()[0]

    conv: dict[int, int] = {}
    for u, et, v in zip(pdf["user_id"], pdf["event_type"], pdf["value"]):
        hit = 1 if (et == "purchase" and float(v) >= 90) else 0
        conv[int(u)] = max(conv.get(int(u), 0), hit)
    cells = {(0, 0): 0, (0, 1): 0, (1, 0): 0, (1, 1): 0}
    for u, c in conv.items():
        cells[(_u60(str(u)) % 2, c)] += 1
    a, b = cells[(0, 1)], cells[(0, 0)]
    c, d = cells[(1, 1)], cells[(1, 0)]
    assert (
        got.control_converted,
        got.control_not,
        got.treat_converted,
        got.treat_not,
    ) == (a, b, c, d)
    assert got.control_rate_permille == _tdiv(a * 1000, a + b)
    assert got.treat_rate_permille == _tdiv(c * 1000, c + d)
    n = a + b + c + d
    want_sig = (
        n * (a * d - b * c) ** 2 * 1000
        > 3841 * (a + b) * (c + d) * (a + c) * (b + d)
    )
    assert got.significant == want_sig
    # both arms live AND conversions present — otherwise the verdict
    # (and this twin) would be vacuously "not significant"
    assert a + b > 0 and c + d > 0
    assert a > 0 and c > 0 and b > 0 and d > 0


def test_seasonal_forecast_mae_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        q226_seasonal_forecast_mae,
    )

    rng = np.random.default_rng(83)
    pdf = _events_pdf(rng, 8000, 80, 21 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r.event_type: r
        for r in q226_seasonal_forecast_mae(spark, str(tmp_path)).collect()
    }

    rows = [
        (
            et,
            int(ts.value) // 1000,
            (int(ts.value) // 1000 // 3_600_000_000) % 168,
            round(float(v) * 1_000_000),
        )
        for et, ts, v in zip(pdf["event_type"], pdf["ts"], pdf["value"])
    ]
    cutoff = max(us for _, us, _, _ in rows) - 604_800_000_000
    train = [r for r in rows if r[1] < cutoff]
    test = [r for r in rows if r[1] >= cutoff]
    prof: dict[tuple, list] = {}
    for et, _, how, v in train:
        prof.setdefault((et, how), []).append(v)
    pred = {k: _tdiv(sum(vs), len(vs)) for k, vs in prof.items()}
    for et in {r[0] for r in rows}:
        t = [r for r in test if r[0] == et]
        scored = [
            abs(v - pred[(et, how)])
            for _, _, how, v in t
            if (et, how) in pred
        ]
        unmatched = len(t) - len(scored)
        g = got[et]
        assert g.n_train == sum(1 for r in train if r[0] == et)
        assert (g.n_test_scored, g.n_test_unmatched) == (
            len(scored),
            unmatched,
        )
        if scored:
            assert g.mae_micro == _tdiv(sum(scored), len(scored))
    assert any(g.n_test_scored > 0 for g in got.values())


def test_ewma_latest_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.events import (
        _Q230_TERMS,
        q230_ewma_latest,
    )

    rng = np.random.default_rng(84)
    pdf = _events_pdf(rng, 6000, 50, 3 * 86_400_000_000)
    pdf.to_parquet(tmp_path / "events.parquet")
    got = {
        r.event_type: r for r in q230_ewma_latest(spark, str(tmp_path)).collect()
    }

    series: dict[tuple, list] = {}
    for eid, ts, u, et, v in zip(
        pdf["event_id"], pdf["ts"], pdf["user_id"], pdf["event_type"], pdf["value"]
    ):
        us = int(ts.value) // 1000
        series.setdefault((int(u), et), []).append(
            (us, int(eid), round(float(v) * 1_000_000))
        )
    totals: dict[str, list] = {}
    for (u, et), evs in series.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        # v/2^(j+1) terms are dyadic with lsb 2^-16 and the sum < 2^30,
        # so double addition is EXACT in any order — same bit pattern as
        # the engine's left-fold
        ewma = sum(
            (vals[-1 - j] if j < len(vals) else 0) / float(2 ** (j + 1))
            for j in range(_Q230_TERMS)
        )
        totals.setdefault(et, []).append(int(ewma * 65536.0))
    for et, parts in totals.items():
        g = got[et]
        assert g.n_keys == len(parts)
        assert g.total_ewma_micro == _tdiv(sum(parts), 65536)


def test_countmin_estimates_match_hashlib(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q109_countmin_heavy_hitters,
    )

    rng = np.random.default_rng(85)
    pdf = _docs_pdf(rng, 1500)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r.tok: r
        for r in q109_countmin_heavy_hitters(spark, str(tmp_path)).collect()
    }

    toks = [t for txt in pdf["text"] for t in txt.split(" ") if t]
    true: dict[str, int] = {}
    for t in toks:
        true[t] = true.get(t, 0) + 1
    top = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    cells: dict[tuple, int] = {}
    for t, c in true.items():
        for d in range(4):
            cells_key = (d, _u60(f"{d}{t}") % 256)
            cells[cells_key] = cells.get(cells_key, 0) + c
    assert set(got) == {t for t, _ in top}
    for t, n in top:
        est = min(cells[(d, _u60(f"{d}{t}") % 256)] for d in range(4))
        r = got[t]
        assert (r.true_n, r.est_n) == (n, est)
        assert r.no_underestimate and est >= n


def test_hll_shard_merge_matches_hashlib(spark, tmp_path):
    from cassandra_analytics_example_spark.operators.sketches import (
        HLL_EST_NUM,
    )
    from cassandra_analytics_example_spark.queries.llm import (
        q135_hll_shard_merge,
    )

    rng = np.random.default_rng(86)
    pdf = _docs_pdf(rng, 2000)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {r.scope: r.est for r in q135_hll_shard_merge(spark, str(tmp_path)).collect()}

    regs: dict[tuple, int] = {}
    for did, text in zip(pdf["doc_id"], pdf["text"]):
        h = _u60(text)
        bucket, rem = h >> 52, h % (1 << 52)
        rho = 53 if rem == 0 else 53 - rem.bit_length()
        key = (int(did) % 4, bucket)
        regs[key] = max(regs.get(key, 0), rho)

    def estimate(r_by_bucket: dict[int, int]) -> float:
        sp = sum(1 << (53 - r) for r in r_by_bucket.values())
        np_ = len(r_by_bucket)
        raw = HLL_EST_NUM / (float(sp) + (256 - np_) * float(1 << 53))
        if (256 - np_) > 0 and raw < 640.0:
            return 256.0 * math.log(256.0 / float(256 - np_))
        return raw

    merged: dict[int, int] = {}
    for (shard, bucket), r in regs.items():
        merged[bucket] = max(merged.get(bucket, 0), r)
    for shard in range(4):
        mine = {b: r for (s, b), r in regs.items() if s == shard}
        assert got[f"shard_{shard}"] == pytest.approx(
            estimate(mine), rel=1e-12
        )
    assert got["merged"] == pytest.approx(estimate(merged), rel=1e-12)
    exact = len(set(pdf["text"]))
    assert got["exact"] == float(exact)
    # the sketch must be in range of the truth (p=8 → ~6.5% std error)
    assert abs(got["merged"] - exact) / exact < 0.25


def test_conformal_by_lang_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q279_conformal_by_lang,
    )

    rng = np.random.default_rng(87)
    pdf = _docs_pdf(rng, 2400)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r.lang: r for r in q279_conformal_by_lang(spark, str(tmp_path)).collect()
    }

    for lang in ("en", "de", "fr"):
        sub = pdf[pdf["lang"] == lang]
        xs = [int(c) for c in sub["n_chars"]]
        ys = [len(t.split(" ")) for t in sub["text"]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        if n * sxx - sx * sx <= 0:
            assert lang not in got
            continue
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
        g = got[lang]
        assert (g.n, g.qhat_micro, g.coverage_permille) == (n, qhat, cov)
        assert cov >= 900
