"""Seventh batch of independent brute-force twins (rationale in
test_metric_bruteforce.py): corpus-governance formula queries — n-gram
novelty vs the reference half, the per-source dataset card, and the
temperature-scaled mixture allocation.
"""

from __future__ import annotations

import math

import numpy as np

from tests.test_metric_bruteforce import _docs_pdf


def test_ngram_novelty_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q189_ngram_novelty,
    )

    rng = np.random.default_rng(71)
    pdf = _docs_pdf(rng, 1500)
    # the 7-word base vocabulary saturates the reference half; give some
    # held-out (odd) docs genuinely novel trailing grams
    for i in range(1, 90, 2):
        pdf.loc[i, "text"] = pdf.loc[i, "text"] + f" nov{i}a nov{i}b nov{i}c"
    pdf["n_chars"] = [len(t) for t in pdf["text"]]
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_permille"])
        for r in q189_ngram_novelty(spark, str(tmp_path)).collect()
    }

    def grams(text):
        w = text.split(" ")
        return {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        } if len(w) >= 3 else set()

    ref = set()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if doc_id % 2 == 0:
            ref |= grams(text)
    want = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        if doc_id % 2 == 0:
            continue
        g = grams(text)
        if not g:
            continue
        novel = sum(1 for x in g if x not in ref)
        want[int(doc_id)] = (len(g), novel, novel * 1000 // len(g))
    assert got == want
    novelties = [p for _, _, p in want.values()]
    assert min(novelties) < 1000  # small vocab: plenty of seen grams
    assert any(n > 0 for _, n, _ in want.values())  # and some novelty


def test_dataset_card_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q193_dataset_card,
    )

    rng = np.random.default_rng(72)
    pdf = _docs_pdf(rng, 1500)
    # inject exact duplicates so the dup-rate column is non-trivial
    dup = rng.integers(0, 1500, 120)
    pdf.loc[dup, "text"] = "the exact duplicate body"
    pdf["n_chars"] = [len(t) for t in pdf["text"]]
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["en_permille"],
                      r["exact_dup_permille"], r["mean_chars"])
        for r in q193_dataset_card(spark, str(tmp_path)).collect()
    }

    by_src: dict[str, list] = {}
    for src, text, lang, nch in zip(
        pdf["source"], pdf["text"], pdf["lang"], pdf["n_chars"]
    ):
        by_src.setdefault(src, []).append((text, lang, int(nch)))
    want = {}
    for src, rows in by_src.items():
        n = len(rows)
        toks = sum(len(t.split(" ")) for t, _, _ in rows)
        en = sum(1 for _, lg, _ in rows if lg == "en")
        h: dict[str, int] = {}
        for t, _, _ in rows:
            h[t] = h.get(t, 0) + 1
        n_dup = sum(c - 1 for c in h.values())
        chars = sum(c for _, _, c in rows)
        want[src] = (n, toks, en * 1000 // n, n_dup * 1000 // n, chars // n)
    assert got == want
    assert any(d > 0 for _, _, _, d, _ in want.values())  # dups registered


def test_temperature_mixture_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q194_temperature_mixture,
    )

    rng = np.random.default_rng(73)
    pdf = _docs_pdf(rng, 2000)
    # skew the source sizes so up/down-sampling both occur
    pdf["source"] = [
        "head" if x < 0.7 else ("mid" if x < 0.9 else "tail")
        for x in rng.uniform(0, 1, len(pdf))
    ]
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        r["source"]: (r["n_docs"], r["alloc_permille"],
                      r["natural_permille"], r["upsampled"])
        for r in q194_temperature_mixture(spark, str(tmp_path)).collect()
    }

    counts: dict[str, int] = {}
    for src in pdf["source"]:
        counts[src] = counts.get(src, 0) + 1
    sq = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in counts.items()}
    tot_sq, tot_n = sum(sq.values()), sum(counts.values())
    want = {
        s: (
            n,
            sq[s] * 1000 // tot_sq,
            n * 1000 // tot_n,
            sq[s] * 1000 // tot_sq > n * 1000 // tot_n,
        )
        for s, n in counts.items()
    }
    assert got == want
    assert want["tail"][3] and not want["head"][3]  # boost small, damp head
