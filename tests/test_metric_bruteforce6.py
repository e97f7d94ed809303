"""Sixth batch of independent brute-force twins (rationale in
test_metric_bruteforce.py): the md5-deterministic sampling/sharding
queries — rendezvous shard map, Efraimidis-Spirakis weighted sampling,
label-centroid cosines, and the group-aware k-fold assignment.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from tests.test_metric_bruteforce import _docs_pdf, _tdiv
from tests.test_metric_bruteforce2 import _emb_pdf, _round_half_up


def _md5_u60(s: str, seed: int | None = None) -> int:
    prefix = "" if seed is None else str(seed)
    return int(hashlib.md5((prefix + s).encode()).hexdigest()[:15], 16)


def test_rendezvous_shard_map_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q180_rendezvous_shard_map,
    )

    rng = np.random.default_rng(61)
    pdf = _docs_pdf(rng, 2000)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = q180_rendezvous_shard_map(spark, str(tmp_path)).collect()[0]

    loads = [0] * 8
    movers = 0
    for doc_id in pdf["doc_id"]:
        a = [_md5_u60(str(int(doc_id)), seed=j) for j in range(9)]
        w8 = a[:8]
        loads[w8.index(max(w8))] += 1
        movers += 1 if a[8] > max(w8) else 0
    n = len(pdf)
    assert got["n_keys"] == n and got["n_shards"] == 8
    assert got["max_load_permille"] == max(loads) * 1000 // n
    assert got["min_load_permille"] == min(loads) * 1000 // n
    assert got["movers"] == movers
    assert got["movers_permille"] == movers * 1000 // n
    # ~1/9 of keys should move under 8 -> 9 expansion
    assert 60 <= got["movers_permille"] <= 170


def test_weighted_sample_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        _Q185_DEN,
        _Q185_K,
        q185_weighted_sample,
    )

    rng = np.random.default_rng(62)
    pdf = _docs_pdf(rng, 2000)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = [
        (r["doc_id"], r["w"], r["rnk"])
        for r in q185_weighted_sample(spark, str(tmp_path)).collect()
    ]

    keyed = [
        (
            math.log((_md5_u60(str(int(d))) + 1) / _Q185_DEN) / int(c),
            int(d),
            int(c),
        )
        for d, c in zip(pdf["doc_id"], pdf["n_chars"])
    ]
    keyed.sort(key=lambda r: (-r[0], r[1]))
    want = [(d, c, i + 1) for i, (_, d, c) in enumerate(keyed[:_Q185_K])]
    assert sorted(got, key=lambda r: r[2]) == want
    # heavier docs must be over-represented vs uniform sampling
    mean_w_top = sum(c for _, c, _ in want) / _Q185_K
    mean_w_all = float(np.mean(pdf["n_chars"]))
    assert mean_w_top > mean_w_all


def test_label_centroid_separation_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        _Q186_Q,
        q186_label_centroid_separation,
    )

    rng = np.random.default_rng(63)
    pdf = _emb_pdf(rng, 800)
    # keep labels small so pairs are few but full-dim sums are exercised
    pdf["label"] = (pdf["label"] % 4).astype(np.int32)
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = {
        (r["label_a"], r["label_b"]): (r["centroid_cosine"], r["confusable"])
        for r in q186_label_centroid_separation(spark, str(tmp_path)).collect()
    }

    dims = len(pdf["embedding"][0])
    sums: dict[int, list] = {}
    for vec, lab in zip(pdf["embedding"], pdf["label"]):
        s = sums.setdefault(int(lab), [0] * dims)
        for d in range(dims):
            s[d] += _round_half_up(float(np.float32(vec[d])) * _Q186_Q)
    labels = sorted(sums)
    want = {}
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            dot = sum(a * b for a, b in zip(sums[la], sums[lb]))
            na = sum(a * a for a in sums[la])
            nb = sum(b * b for b in sums[lb])
            cos = float(dot) / (math.sqrt(na) * math.sqrt(nb))
            want[(la, lb)] = (cos, cos >= 0.8)
    assert set(got) == set(want)
    for k, (cos, conf) in want.items():
        assert got[k][0] == pytest.approx(cos, rel=1e-12, abs=1e-12)
        assert got[k][1] == conf


def test_grouped_kfold_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        _Q201_K,
        q201_grouped_kfold,
    )

    rng = np.random.default_rng(64)
    pdf = _docs_pdf(rng, 2000)
    # widen the source vocabulary so every fold is populated
    pdf["source"] = [f"src_{i:02d}" for i in rng.integers(0, 20, len(pdf))]
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["fold"]: (r["n_sources"], r["n_docs"], r["n_tokens"],
                    r["share_permille"])
        for r in q201_grouped_kfold(spark, str(tmp_path)).collect()
    }

    per_source: dict[str, list] = {}
    for src, text in zip(pdf["source"], pdf["text"]):
        e = per_source.setdefault(src, [0, 0])
        e[0] += 1
        e[1] += len(text.split(" "))
    tot = len(pdf)
    want: dict[int, list] = {}
    for src, (nd, tk) in per_source.items():
        fold = _md5_u60(src) % _Q201_K
        e = want.setdefault(fold, [0, 0, 0])
        e[0] += 1
        e[1] += nd
        e[2] += tk
    assert got == {
        f: (s, d, t, d * 1000 // tot) for f, (s, d, t) in want.items()
    }
    assert len(want) == _Q201_K  # all folds populated
    # a doc's fold is its source's fold: no source straddles folds — true
    # by construction here; the assignment values above pin the contract
