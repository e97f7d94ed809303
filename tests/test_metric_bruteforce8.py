"""Eighth batch of independent brute-force twins (rationale in
test_metric_bruteforce.py): corpus-composition and retrieval-eval
queries — contingency lift, label balance weights, and the labeled
top-10 retrieval eval (cosine recomputed with left-associated double
folds to match the engine's expression order exactly).
"""

from __future__ import annotations

import math

import numpy as np

from tests.test_metric_bruteforce import _docs_pdf
from tests.test_metric_bruteforce2 import _emb_pdf


def test_contingency_lift_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q166_contingency_lift,
    )

    rng = np.random.default_rng(81)
    pdf = _docs_pdf(rng, 2000)
    dep = rng.integers(0, 2000, 400)
    pdf.loc[dep, "source"] = "books"
    pdf.loc[dep, "lang"] = "fr"
    pdf.to_parquet(tmp_path / "documents.parquet")
    got = {
        (r["lang"], r["source"]): (
            r["n_obs"], r["n_lang"], r["n_source"], r["lift_permille"],
            r["over_represented"],
        )
        for r in q166_contingency_lift(spark, str(tmp_path)).collect()
    }

    cells: dict[tuple, int] = {}
    for lg, sr in zip(pdf["lang"], pdf["source"]):
        cells[(lg, sr)] = cells.get((lg, sr), 0) + 1
    nl: dict[str, int] = {}
    ns: dict[str, int] = {}
    for (lg, sr), n in cells.items():
        nl[lg] = nl.get(lg, 0) + n
        ns[sr] = ns.get(sr, 0) + n
    total = sum(cells.values())
    want = {}
    for (lg, sr), n in cells.items():
        lift = n * total * 1000 // (nl[lg] * ns[sr])
        want[(lg, sr)] = (n, nl[lg], ns[sr], lift, lift > 1500)
    assert got == want
    assert any(o for *_, o in want.values())  # the induced cell is flagged


def test_label_balance_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q172_label_balance,
    )

    rng = np.random.default_rng(82)
    pdf = _emb_pdf(rng, 1500)
    # skew one label so the imbalance verdict fires both ways
    pdf.loc[pdf["label"] >= 7, "label"] = 0
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = {
        r["label"]: (r["n"], r["share_permille"], r["weight_permille"],
                     r["imbalanced"])
        for r in q172_label_balance(spark, str(tmp_path)).collect()
    }

    counts: dict[int, int] = {}
    for lab in pdf["label"]:
        counts[int(lab)] = counts.get(int(lab), 0) + 1
    n_total, n_labels = sum(counts.values()), len(counts)
    want = {
        lab: (
            n,
            n * 1000 // n_total,
            n_total * 1000 // (n_labels * n),
            2 * n * n_labels > 4 * n_total or 2 * n * n_labels < n_total,
        )
        for lab, n in counts.items()
    }
    assert got == want
    assert want[0][3]  # the fattened label is flagged


def test_retrieval_label_eval_matches_python(spark, tmp_path):
    from cassandra_analytics_example_spark.queries.llm import (
        q174_retrieval_label_eval,
    )

    rng = np.random.default_rng(83)
    pdf = _emb_pdf(rng, 400)
    pdf.to_parquet(tmp_path / "embeddings.parquet")
    got = {
        r["label"]: (r["n_probes"], r["hits_at_10"], r["prec_permille"],
                     r["n_with_hit"], r["rr_milli_sum"])
        for r in q174_retrieval_label_eval(spark, str(tmp_path)).collect()
    }

    vecs = [[float(np.float32(x)) for x in v] for v in pdf["embedding"]]
    labels = [int(x) for x in pdf["label"]]

    def cos(a, b):
        # left-associated double folds, matching the SQL expression order
        dot = 0.0
        na = 0.0
        nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    per_label: dict[int, list] = {}
    for q in range(20):
        scored = sorted(
            (
                (-cos(vecs[q], vecs[c]), c)
                for c in range(len(vecs))
                if c != q
            ),
        )[:10]
        hits = sum(1 for _, c in scored if labels[c] == labels[q])
        first = next(
            (i + 1 for i, (_, c) in enumerate(scored)
             if labels[c] == labels[q]),
            None,
        )
        e = per_label.setdefault(labels[q], [0, 0, 0, 0])
        e[0] += 1
        e[1] += hits
        e[2] += 1 if first is not None else 0
        e[3] += 1000 // first if first is not None else 0
    want = {
        lab: (p, h, h * 1000 // (p * 10), wh, rr)
        for lab, (p, h, wh, rr) in per_label.items()
    }
    assert got == want
    assert sum(h for _, h, *_ in want.values()) > 0  # some relevant hits
