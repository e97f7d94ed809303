"""Brute-force twins for TF-IDF top-terms (q59) and hybrid RRF retrieval
(q136) — end-to-end recomputation of two composite retrieval pipelines
in plain Python on the sf0.001 fixture, sharing no code and no SQL with
the engine.

Float discipline mirrored exactly: tf-idf is ``(tf/len) * (n/df)`` in
that operation order; cosine is the SEQUENTIAL left-to-right fold the
engine's ``F.aggregate`` performs (``acc += x*y`` in element order, not
numpy pairwise summation); RRF is ``1.0/(60+rd) + 1.0/(60+rs)``.  All
inputs are small integers or float32-exact doubles, so equality is
exact — any mismatch is a formula or tie-order defect, not noise.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def test_q59_tfidf_matches_python_twin(spark):
    from cassandra_analytics_example_spark.queries import load_all

    got = sorted(
        (r.doc_id, r.rank, r.term, r.tfidf)
        for r in load_all()["q59_tfidf_top_terms"].fn(spark, SF_DIR).collect()
    )

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = list(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    n = len(docs)
    tf = {i: Counter(t.split(" ")) for i, t in docs}
    dfreq: Counter = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    want = []
    for i, c in tf.items():
        ln = sum(c.values())
        scored = sorted(
            ((c[t] / ln) * (n / dfreq[t]), t) for t in c
        )
        # rank: tfidf desc, term asc
        scored.sort(key=lambda st: (-st[0], st[1]))
        for rank, (s, t) in enumerate(scored[:3], start=1):
            want.append((i, rank, t, s))
    assert got == sorted(want)


def test_ivf_topk_matches_python_twin(spark):
    """IVF(1-probe) ANN recomputed in plain Python: Voronoi assignment
    by cosine argmax with smallest-centroid-id ties, search restricted
    to the query's own cell, per-query top-5 with neighbor-id ties —
    exact equality including the nano-exact cosines."""
    from cassandra_analytics_example_spark.operators.similarity import (
        ivf_topk,
    )

    emb_df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = sorted(
        (r.query_id, r.rnk, r.neighbor_id, r.cosine)
        for r in ivf_topk(
            emb_df, emb_df.filter("vec_id < 10"), k=5, n_cells=8
        ).collect()
    )

    et = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb = {
        i: [float(x) for x in v]
        for i, v in zip(et["vec_id"].to_pylist(), et["embedding"].to_pylist())
    }

    def cos(a, b):
        return _seq_dot(a, b) / (_seq_norm(a) * _seq_norm(b))

    cents = {c: emb[c] for c in emb if c < 8}
    cell = {
        i: -max((cos(v, cents[c]), -c) for c in cents)[1]
        for i, v in emb.items()
    }
    want = []
    for q in range(10):
        if q not in emb:
            continue
        cand = sorted(
            (-cos(emb[q], emb[n]), n)
            for n in emb
            if n != q and cell[n] == cell[q]
        )[:5]
        for rnk, (neg, n) in enumerate(cand, start=1):
            want.append((q, rnk, n, -neg))
    assert got == sorted(want)


def test_semdedup_matches_python_twin(spark):
    """SemDeDup (q116's operator) recomputed in plain Python: corpus-
    sized k, m-bit sign-bucket-filtered centroid argmax with the
    (cosine, lowest-centroid-id) max-struct tie, full-centroid fallback
    for empty buckets, and the within-cell lower-id prune at the 0.35
    threshold — exact equality on (id, cell, kept)."""
    from cassandra_analytics_example_spark.operators.similarity import (
        semdedup_prune,
    )

    emb_df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = sorted(
        (r.vec_id, r.cell, r.kept) for r in semdedup_prune(emb_df).collect()
    )

    et = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb = {
        i: [float(x) for x in v]
        for i, v in zip(et["vec_id"].to_pylist(), et["embedding"].to_pylist())
    }
    n = len(emb)
    k = max(8, -(-n // 64))
    m = max(0, k.bit_length() - 1 - 3)

    def bucket(v):
        return sum(2 ** i for i in range(m) if v[i] >= 0)

    def cos(a, b):
        return _seq_dot(a, b) / (_seq_norm(a) * _seq_norm(b))

    cents = {c: emb[c] for c in emb if c < k}
    by_bucket: dict[int, list[int]] = defaultdict(list)
    for c in cents:
        by_bucket[bucket(cents[c])].append(c)

    cell = {}
    for i, v in emb.items():
        pool = by_bucket.get(bucket(v)) or list(cents)
        best = max((cos(v, cents[c]), -c) for c in pool)
        cell[i] = -best[1]
    dropped = set()
    by_cell: dict[int, list[int]] = defaultdict(list)
    for i, c in cell.items():
        by_cell[c].append(i)
    for members in by_cell.values():
        members.sort()
        for ai, a in enumerate(members):
            for b in members[:ai]:
                if cos(emb[a], emb[b]) >= 0.35:
                    dropped.add(a)
                    break
    want = sorted((i, cell[i], i not in dropped) for i in emb)
    assert got == want
    # the prune must actually fire on the fixture (clustered payloads)
    assert any(not kept for _, _, kept in want)


def test_pq_assign_matches_python_twin(spark):
    """Product-quantization assignment (q146's operator): slice, squared
    L2 via the sequential fold, argmin with (distance, code-id) ties,
    floor nano-quantization — recomputed in plain Python loops."""
    from cassandra_analytics_example_spark.operators.similarity import (
        pq_assign,
    )

    emb_df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = sorted(
        (r.vec_id, r.sub, r.code, r.d2_q)
        for r in pq_assign(emb_df, n_sub=4, sub_dim=16, n_codes=16).collect()
    )

    et = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb = {
        i: [float(x) for x in v]
        for i, v in zip(et["vec_id"].to_pylist(), et["embedding"].to_pylist())
    }
    books = {
        s: {c: emb[c][s * 16 : (s + 1) * 16] for c in range(16) if c in emb}
        for s in range(4)
    }
    want = []
    for i, v in emb.items():
        for s in range(4):
            sv = v[s * 16 : (s + 1) * 16]
            best = None
            for c, cv in books[s].items():
                acc = 0.0
                for x, y in zip(sv, cv):
                    acc = acc + (x - y) * (x - y)
                if best is None or (acc, c) < best:
                    best = (acc, c)
            want.append((i, s, best[1], math.floor(best[0] * 1_000_000_000)))
    assert got == sorted(want)


def _seq_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _seq_norm(a):
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def test_q153_matryoshka_matches_python_twin(spark):
    """Dimension-truncation audit recomputed in plain Python: exact
    top-5 full-dim neighbors, truncated cosines at dims 16/32/64 via the
    sequential fold, nano-quantized, re-ranked with mirrored ties."""
    from cassandra_analytics_example_spark.queries import load_all

    got = sorted(
        (r.query_id, r.dim, r.rnk_trunc, r.neighbor_id, r.rnk_full, r.cos_q)
        for r in load_all()["q153_matryoshka_truncation"]
        .fn(spark, SF_DIR)
        .collect()
    )

    et = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb = {
        i: [float(x) for x in v]
        for i, v in zip(et["vec_id"].to_pylist(), et["embedding"].to_pylist())
    }

    def cos(a, b):
        return _seq_dot(a, b) / (_seq_norm(a) * _seq_norm(b))

    want = []
    for q in range(10):
        if q not in emb:
            continue
        cand = sorted(
            ((-cos(emb[q], emb[n]), n) for n in emb if n != q)
        )[:5]
        top = [(n, rnk) for rnk, (_, n) in enumerate(cand, start=1)]
        for d in (16, 32, 64):
            tr = sorted(
                (
                    (-cos(emb[q][:d], emb[n][:d]), n, rnk_full)
                    for n, rnk_full in top
                )
            )
            for rnk_t, (neg_tc, n, rnk_full) in enumerate(tr, start=1):
                want.append(
                    (q, d, rnk_t, n, rnk_full,
                     math.floor(-neg_tc * 1_000_000_000))
                )
    assert got == sorted(want)


def test_q136_rrf_matches_python_twin(spark):
    from cassandra_analytics_example_spark.queries import load_all

    got = sorted(
        (r.query_id, r.fused_rank, r.doc_id, r.rrf)
        for r in load_all()["q136_hybrid_rrf_retrieval"]
        .fn(spark, SF_DIR)
        .collect()
    )

    et = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb = {
        i: [float(x) for x in v]
        for i, v in zip(et["vec_id"].to_pylist(), et["embedding"].to_pylist())
    }
    dt = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    toks = {
        i: set(t.split(" "))
        for i, t in zip(dt["doc_id"].to_pylist(), dt["text"].to_pylist())
    }

    dense: dict[tuple[int, int], int] = {}
    for q in (0, 1, 2):
        if q not in emb:
            continue
        qv, qn = emb[q], _seq_norm(emb[q])
        cand = sorted(
            (
                (-_seq_dot(qv, cv) / (qn * _seq_norm(cv)), nid)
                for nid, cv in emb.items()
                if nid != q
            )
        )
        for rnk, (_, nid) in enumerate(cand[:10], start=1):
            dense[(q, nid)] = rnk

    sparse: dict[tuple[int, int], int] = {}
    for q in (0, 1, 2):
        if q not in toks:
            continue
        cand = sorted(
            ((-len(toks[q] & toks[d]), d) for d in toks if d != q)
        )
        for rnk, (_, d) in enumerate(cand[:10], start=1):
            sparse[(q, d)] = rnk

    fused = defaultdict(list)
    for key in set(dense) | set(sparse):
        rd, rs = dense.get(key), sparse.get(key)
        rrf = (1.0 / (60 + rd) if rd else 0.0) + (
            1.0 / (60 + rs) if rs else 0.0
        )
        fused[key[0]].append((rrf, key[1]))
    want = []
    for q, rows in fused.items():
        rows.sort(key=lambda rv: (-rv[0], rv[1]))
        for rank, (rrf, d) in enumerate(rows[:5], start=1):
            want.append((q, rank, d, rrf))
    assert got == sorted(want)
