"""Third batch of independent brute-force twins (rationale in
test_metric_bruteforce.py): the formula-heavy documents-table queries the
r8 drain window covers — intra-doc repetition, word entropy, exact
OLS/Pearson, the Zipf fit, and the template-prefix top-k.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.test_metric_bruteforce import _docs_pdf, _tdiv


def test_intradoc_repetition_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q183_intradoc_repetition,
    )

    rng = np.random.default_rng(31)
    pdf = _docs_pdf(rng, 1200)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["dup_bigram_permille"],
                      r["top_bigram_permille"])
        for r in q183_intradoc_repetition(spark, str(tmp_path)).collect()
    }

    want = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        w = text.split(" ")
        if len(w) < 2:
            continue
        bg: dict[str, int] = {}
        for i in range(len(w) - 1):
            k = w[i] + " " + w[i + 1]
            bg[k] = bg.get(k, 0) + 1
        n = sum(bg.values())
        want[int(doc_id)] = (
            n, (n - len(bg)) * 1000 // n, max(bg.values()) * 1000 // n
        )
    assert got == want
    # the small vocabulary must actually produce duplicate bigrams
    assert any(d > 0 for _, d, _ in want.values())


def test_word_entropy_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import q184_word_entropy

    rng = np.random.default_rng(32)
    pdf = _docs_pdf(rng, 1200)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["doc_id"]: (r["n_tokens"], r["vocab"], r["entropy_milli"])
        for r in q184_word_entropy(spark, str(tmp_path)).collect()
    }

    want = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        c: dict[str, int] = {}
        for w in text.split(" "):
            c[w] = c.get(w, 0) + 1
        n = sum(c.values())
        rep = sum(math.floor(1000.0 * k * math.log(k)) for k in c.values())
        want[int(doc_id)] = (
            n, len(c), math.floor(1000.0 * math.log(n)) - rep // n
        )
    assert got == want
    ents = [e for _, _, e in want.values()]
    assert min(ents) >= 0 and max(ents) > 1000  # non-trivial spread


def test_ols_corr_exact_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q214_ols_corr_exact,
    )

    rng = np.random.default_rng(33)
    pdf = _docs_pdf(rng, 1800)
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = q214_ols_corr_exact(spark, str(tmp_path)).collect()[0]

    xs = [int(c) for c in pdf["n_chars"]]
    ys = [len(t.split(" ")) for t in pdf["text"]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    assert got["n"] == n
    assert got["slope_micro"] == _tdiv(
        (n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx
    )
    assert got["intercept_milli"] == _tdiv(
        (sy * (n * sxx - sx * sx) - sx * (n * sxy - sx * sy)) * 1000,
        n * (n * sxx - sx * sx),
    )
    want_r = float(n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    )
    assert got["pearson_r"] == pytest.approx(want_r, rel=1e-12)
    assert want_r > 0.99  # chars ~ tokens is near-linear by construction


def test_zipf_fit_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import q245_zipf_fit

    rng = np.random.default_rng(34)
    # skewed vocabulary so frequencies spread over decades
    words = [f"w{i:03d}" for i in range(400)]
    probs = np.array([1.0 / (i + 1) for i in range(400)])
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(words, rng.integers(10, 60), p=probs))
        for _ in range(800)
    ]
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts)),
            "text": texts,
            "n_chars": [len(t) for t in texts],
            "lang": "en",
            "source": "web",
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = q245_zipf_fit(spark, str(tmp_path)).collect()[0]

    freq: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            freq[w] = freq.get(w, 0) + 1
    f2 = [(w, c) for w, c in freq.items() if c >= 2]
    f2.sort(key=lambda wc: (-wc[1], wc[0]))
    pts = [
        (
            math.floor(1_000_000.0 * math.log(float(rnk))),
            math.floor(1_000_000.0 * math.log(float(c))),
        )
        for rnk, (_, c) in enumerate(f2, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    assert got["n_terms"] == n
    want_slope = _tdiv((n * sxy - sx * sy) * 1_000_000, n * sxx - sx * sx)
    assert got["slope_micro"] == want_slope
    # a 1/rank vocabulary must fit a Zipf exponent near 1 (slope ~ -1)
    assert -1_400_000 < want_slope < -600_000


def test_template_prefixes_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q252_template_prefixes,
    )

    rng = np.random.default_rng(35)
    pdf = _docs_pdf(rng, 1500)
    # inject a boilerplate template so the top prefix is meaningful
    tpl = rng.integers(0, 1500, 200)
    pdf.loc[tpl, "text"] = "TEMPLATE HEADER X " + pdf.loc[tpl, "text"]
    pdf["n_chars"] = [len(t) for t in pdf["text"]]
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = [
        (r["prefix"], r["n_docs"], r["share_permille"])
        for r in q252_template_prefixes(spark, str(tmp_path)).collect()
    ]

    eligible = [t for t in pdf["text"] if len(t) >= 16]
    total = len(eligible)
    counts: dict[str, int] = {}
    for t in eligible:
        p = t[:16]
        counts[p] = counts.get(p, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    want = [(p, c, c * 1000 // total) for p, c in top]
    assert got == want
    assert want[0][0] == "TEMPLATE HEADER "  # the injected template wins
