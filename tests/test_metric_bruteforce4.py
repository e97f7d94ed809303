"""Fourth batch of independent brute-force twins (rationale in
test_metric_bruteforce.py): the embedding-eval and rank-normalization
queries — threshold sweep, rank-permille deciles, per-dimension moment
statistics, and the exact covariance triangle.
"""

from __future__ import annotations

import numpy as np

from tests.test_metric_bruteforce import _docs_pdf, _tdiv
from tests.test_metric_bruteforce2 import (
    _emb_pdf,
    _q223_score_py,
    _round_half_up,
)


def test_threshold_sweep_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        _Q224_THRESHOLDS,
        q224_threshold_sweep,
    )

    rng = np.random.default_rng(41)
    pdf = _emb_pdf(rng, 1500)
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = {
        r["threshold"]: r
        for r in q224_threshold_sweep(spark, str(tmp_path)).collect()
    }

    rows = [
        (_q223_score_py(v), 1 if lab >= 5 else 0)
        for v, lab in zip(pdf["embedding"], pdf["label"])
    ]
    assert set(got) == set(_Q224_THRESHOLDS)
    exercised_mid = False
    for t in _Q224_THRESHOLDS:
        tp = sum(1 for s, p in rows if s >= t and p == 1)
        fp = sum(1 for s, p in rows if s >= t and p == 0)
        fn = sum(1 for s, p in rows if s < t and p == 1)
        tn = sum(1 for s, p in rows if s < t and p == 0)
        r = got[t]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
        assert r["precision_permille"] == (
            tp * 1000 // (tp + fp) if tp + fp > 0 else None
        )
        assert r["recall_permille"] == (
            tp * 1000 // (tp + fn) if tp + fn > 0 else None
        )
        if 0 < tp + fp < len(rows):
            exercised_mid = True
    assert exercised_mid  # at least one threshold actually splits


def test_rank_normalized_quality_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q232_rank_normalized_quality,
    )

    rng = np.random.default_rng(42)
    pdf = _docs_pdf(rng, 2000)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        (r["source"], r["decile"]): r["n_docs"]
        for r in q232_rank_normalized_quality(spark, str(tmp_path)).collect()
    }

    chars = [int(c) for c in pdf["n_chars"]]
    n_total = len(chars)
    counts: dict[int, int] = {}
    for c in chars:
        counts[c] = counts.get(c, 0) + 1
    below, permille = 0, {}
    for c in sorted(counts):
        permille[c] = below * 1000 // n_total
        below += counts[c]
    want: dict[tuple, int] = {}
    for src, c in zip(pdf["source"], pdf["n_chars"]):
        key = (src, permille[int(c)] // 100)
        want[key] = want.get(key, 0) + 1
    assert got == want
    assert len({d for _, d in want}) >= 8  # deciles actually spread


def test_embedding_dim_stats_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q257_embedding_dim_stats,
    )

    rng = np.random.default_rng(43)
    pdf = _emb_pdf(rng, 1200, dims=12)
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = {
        r["dim"]: (r["mean_micro"], r["var_micro"], r["var_share_permille"])
        for r in q257_embedding_dim_stats(spark, str(tmp_path)).collect()
    }

    dims = 12
    q = [[] for _ in range(dims)]
    for vec in pdf["embedding"]:
        for d in range(dims):
            q[d].append(_round_half_up(float(np.float32(vec[d])) * 1_000_000))
    st = {}
    for d in range(dims):
        n, s = len(q[d]), sum(q[d])
        ss = sum(x * x for x in q[d])
        mean = _tdiv(s, n)
        var = _tdiv(_tdiv(ss - _tdiv(s * s, n), n), 1_000_000)
        st[d] = (mean, var)
    tv = sum(v for _, v in st.values())
    want = {d: (m, v, _tdiv(v * 1000, tv)) for d, (m, v) in st.items()}
    assert got == want
    # uniform(-1,1) coordinates: variance ~ 1/3 in micro-units
    assert all(250_000 < v < 420_000 for _, v, _ in want.values())


def test_embedding_covariance_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        _COV_DIMS,
        q268_embedding_covariance,
    )

    rng = np.random.default_rng(44)
    pdf = _emb_pdf(rng, 1200)
    # correlate dim 2 with dim 1 so off-diagonal cells are non-trivial
    emb = np.stack(pdf["embedding"].to_numpy())
    emb[:, 1] = (0.7 * emb[:, 0] + 0.3 * emb[:, 1]).astype(np.float32)
    pdf["embedding"] = [row for row in emb]
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = {
        (r["dim_i"], r["dim_j"]): r["cov_micro"]
        for r in q268_embedding_covariance(spark, str(tmp_path)).collect()
    }

    qcols = [
        [
            _round_half_up(float(np.float32(vec[i - 1])) * 1_000_000)
            for vec in pdf["embedding"]
        ]
        for i in range(1, _COV_DIMS + 1)
    ]
    n = len(pdf)
    want = {}
    for i in range(1, _COV_DIMS + 1):
        for j in range(i, _COV_DIMS + 1):
            si, sj = sum(qcols[i - 1]), sum(qcols[j - 1])
            pij = sum(a * b for a, b in zip(qcols[i - 1], qcols[j - 1]))
            want[(i, j)] = _tdiv(_tdiv(n * pij - si * sj, n * n), 1_000_000)
    assert got == want
    assert want[(1, 2)] > 100_000  # the induced correlation shows
    assert all(want[(i, i)] > 0 for i in range(1, _COV_DIMS + 1))
