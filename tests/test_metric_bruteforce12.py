"""hashlib twins for the md5-as-spec sampling/sharding family.

These queries' oracles were classed as justified exceptions in the
round-8 twin inventory: the md5 hash IS the declared semantics, and
Spark's JVM md5 vs DuckDB's native md5 already cross two independent
implementations.  These tests add the THIRD (`hashlib`) anyway and
recompute the surrounding selection algebra from scratch in plain
Python — so even the "trivial" routing algebra (mod compare, integer
cross-product keep rule, shard/offset arithmetic) has an
engine-independent recomputation, and the exception class is covered
rather than argued.
"""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq

from cassandra_analytics_example_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


def _u60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hash_sample_matches_hashlib(spark):
    got = {
        r.o_orderkey
        for r in load_all()["q36_hash_sample"].fn(spark, SF_DIR).collect()
    }
    keys = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey"]
    ).column(0).to_pylist()
    want = {k for k in keys if _u60(str(k)) % 100 < 5}
    assert got == want
    assert 0 < len(want) < len(keys)  # a real, non-degenerate sample


def test_hash_split_matches_hashlib(spark):
    got = {
        r.doc_id: r.split
        for r in load_all()["q42_hash_split"].fn(spark, SF_DIR).collect()
    }
    ids = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id"]
    ).column(0).to_pylist()

    def split(i):
        b = _u60(str(i)) % 10000
        return "train" if b < 9000 else ("val" if b < 9500 else "test")

    assert got == {i: split(i) for i in ids}
    assert set(got.values()) >= {"train"}  # 90% bucket must be occupied


def test_stratified_sample_matches_hashlib(spark):
    got = {
        r.doc_id
        for r in load_all()["q58_stratified_sample"].fn(spark, SF_DIR).collect()
    }
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang"]
    )
    rows = list(zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()))
    cnt: dict[str, int] = {}
    for _, lang in rows:
        cnt[lang] = cnt.get(lang, 0) + 1
    mn = min(cnt.values())
    want = {
        i for i, lang in rows if (_u60(str(i)) % 10000) * cnt[lang] < mn * 10000
    }
    assert got == want
    # the smallest stratum is kept ~whole; larger strata are downsampled
    kept_by_lang: dict[str, int] = {}
    for i, lang in rows:
        if i in want:
            kept_by_lang[lang] = kept_by_lang.get(lang, 0) + 1
    assert max(cnt.values()) > mn  # fixture has unequal strata
    assert all(v <= mn + 1 or v < cnt[k] for k, v in kept_by_lang.items())


def test_deterministic_shuffle_matches_hashlib(spark):
    got = {
        r.doc_id: (r.shard, r.pos_in_shard, r.global_pos)
        for r in load_all()["q126_deterministic_shuffle"]
        .fn(spark, SF_DIR)
        .collect()
    }
    ids = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id"]
    ).column(0).to_pylist()
    keyed = [(i, _u60(f"epoch0:{i}")) for i in ids]
    by_shard: dict[int, list] = {}
    for i, k in keyed:
        by_shard.setdefault(k % 64, []).append((k, i))
    want = {}
    off = 0
    for shard in sorted(by_shard):
        members = sorted(by_shard[shard])
        for pos, (_, i) in enumerate(members):
            want[i] = (shard, pos, off + pos)
        off += len(members)
    assert got == want
    # the permutation is a bijection onto 0..N-1
    assert sorted(g for _, _, g in got.values()) == list(range(len(ids)))


def test_sequence_packing_matches_hashlib(spark):
    got = {
        r.doc_id: (r.bucket, r.n_tokens, r.start_tok, r.first_seq, r.last_seq)
        for r in load_all()["q60_sequence_packing"].fn(spark, SF_DIR).collect()
    }
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()))
    by_bucket: dict[int, list] = {}
    for i, text in rows:
        h = _u60(str(i))
        by_bucket.setdefault(h % 64, []).append((h, i, len(text.split(" "))))
    want = {}
    for bucket, members in by_bucket.items():
        members.sort(key=lambda m: (m[0], m[1]))
        start = 0
        for _, i, n in members:
            want[i] = (bucket, n, start, start // 256, (start + n - 1) // 256)
            start += n
    assert got == want
    # packing is gap-free per bucket: offsets tile exactly
    assert all(v[2] >= 0 for v in want.values())


def test_token_budget_selection_matches_python(spark):
    """q121 quality-greedy budget selection: the ranking key includes a
    FLOAT quality score, recomputed here with IEEE-double arithmetic in
    the same operation order (Python float == C double), plus the md5
    subkey and the per-language cumulative budget cut."""
    import re

    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens, r.selected)
        for r in load_all()["q121_token_budget_selection"]
        .fn(spark, SF_DIR)
        .collect()
    }
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    rows = list(
        zip(
            tbl.column(0).to_pylist(),
            tbl.column(1).to_pylist(),
            tbl.column(2).to_pylist(),
        )
    )
    stop = {"the", "and", "of", "to", "a"}
    per_lang: dict[str, list] = {}
    for i, text, lang in rows:
        toks = text.split(" ")
        n = len(toks)
        non_alnum = len(text) - len(re.sub(r"[^a-zA-Z0-9 ]", "", text))
        qs = (
            min(n / 100.0, 1.0) * 0.4
            + (1.0 - non_alnum / len(text)) * 0.3
            + sum(1 for t in toks if t in stop) / n * 0.3
        )
        band = int(qs * 64 // 1)
        sub = _u60(str(i)) % 4
        per_lang.setdefault(lang, []).append((-band, sub, -qs, i, n))
    want = {}
    for lang, members in per_lang.items():
        members.sort()
        cum = 0
        for _, _, _, i, n in members:
            cum += n
            want[i] = (n, cum, cum <= 2000)
    assert got == want


def test_rolling_fingerprint_matches_python(spark):
    """Rabin-Karp base-31 prefix hash recomputed with plain Python ints
    over the same leading 64 chars — pins the polynomial, the modulus,
    and the duplicate-group reduction."""
    got = {
        r.rhash: (r.n_docs, r.first_doc)
        for r in load_all()["q34_rolling_fingerprint"].fn(spark, SF_DIR).collect()
    }
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    groups: dict[int, list] = {}
    for i, text in zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()):
        h = 0
        for ch in text[:64]:
            h = (h * 31 + ord(ch)) % 2147483647
        groups.setdefault(h, []).append(i)
    want = {
        h: (len(ids), min(ids)) for h, ids in groups.items() if len(ids) > 1
    }
    assert got == want
    assert want, "fixture must contain at least one shared-prefix group"


def test_weighted_sample_matches_hashlib(spark):
    """Probability-proportional-to-size keep rule recomputed with exact
    Python integers (the engine uses DECIMAL(38,0) cross-multiplication;
    Python ints are exact at any width, so agreement pins the no-overflow
    claim too)."""
    got = {
        r.doc_id
        for r in load_all()["q105_weighted_sample"].fn(spark, SF_DIR).collect()
    }
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    rows = list(zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()))
    tw = sum(int(n) for _, n in rows)
    want = {
        i
        for i, n in rows
        if (_u60(str(i)) % 1073741824) * tw < int(n) * 100 * 1073741824
    }
    assert got == want
    # expected-100 sampling on a 50-doc fixture keeps most-but-not-all or
    # all docs depending on weights; the rule itself must be non-vacuous
    assert 0 < len(want) <= len(rows)


def test_poisson_bootstrap_ci_matches_python(spark):
    """q217: deterministic Poisson(1) resample weights via exact integer
    inverse-CDF on the md5-uniform, per-resample truncated-integer means,
    and the order-statistic CI — all recomputed with hashlib + plain
    ints on the real events fixture."""
    from cassandra_analytics_example_spark.queries.events import (
        _Q217_B,
        _Q217_T,
        q217_poisson_bootstrap_ci,
    )

    got = q217_poisson_bootstrap_ci(spark, SF_DIR).collect()[0]

    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    cols = {c: tbl.column(c).to_pylist() for c in ("event_id", "event_type", "value", "ts")}
    d = [
        (eid, round(float(v) * 100))
        for eid, et, v in zip(cols["event_id"], cols["event_type"], cols["value"])
        if et == "purchase"
    ]

    def weight(u):
        for k, t in enumerate(_Q217_T):
            if u < t:
                return k
        return 5

    means = []
    for b in range(_Q217_B):
        sw = swc = 0
        for eid, cents in d:
            w = weight(_u60(f"{eid}#{b}"))
            sw += w
            swc += w * cents
        if sw > 0:
            means.append(swc * 10000 // sw)
    means.sort()
    point = sum(c for _, c in d) * 10000 // len(d)
    assert got.mean_microcents == point
    assert got.n_resamples == len(means)
    assert got.ci_lo == means[1]        # 2nd smallest (OFFSET 1)
    assert got.ci_hi == means[-2]       # 2nd largest
    assert means[0] <= point <= means[-1]  # CI brackets the point estimate


def test_noisy_release_matches_hashlib(spark):
    """q227 DP-style release: seeded bounded noise from md5('q227c'/'q227s'
    || group) recomputed with hashlib — pins the noise derivation, width,
    and that the released values are exactly true + noise."""
    from cassandra_analytics_example_spark.queries.events import (
        _Q227_NOISE_HALF_WIDTH as HW,
        q227_noisy_release,
    )

    got = {
        r.event_type: (r.n_released, r.sum_micro_released, r.noise_half_width)
        for r in q227_noisy_release(spark, SF_DIR).collect()
    }
    tbl = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_type", "value"])
    agg: dict[str, list] = {}
    for et, v in zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()):
        a = agg.setdefault(et, [0, 0])
        a[0] += 1
        a[1] += round(float(v) * 1_000_000)
    want = {}
    for et, (n, s) in agg.items():
        noise_n = _u60("q227c" + et) % (2 * HW + 1) - HW
        noise_s = _u60("q227s" + et) % (2 * HW + 1) - HW
        want[et] = (n + noise_n, s + noise_s, HW)
    assert got == want
    # noise must actually perturb at least one group (seeded, not zeroed)
    assert any(want[et][0] != agg[et][0] for et in agg)


def test_domain_caps_matches_hashlib(spark):
    """q65 per-domain caps: synthetic URL derivation, host extraction, and
    the hash-ordered top-20 per domain recomputed in Python."""
    got = {
        r.doc_id: (r.domain, r.rnk)
        for r in load_all()["q65_domain_caps"].fn(spark, SF_DIR).collect()
    }
    ids = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["doc_id"]
    ).column(0).to_pylist()
    by_domain: dict[str, list] = {}
    for i in ids:
        if i % 2 != 0:
            continue
        domain = f"site{i % 7}.example.com"
        by_domain.setdefault(domain, []).append((_u60(str(i)), i))
    want = {}
    for domain, members in by_domain.items():
        members.sort()
        for rnk, (_, i) in enumerate(members[:20], start=1):
            want[i] = (domain, rnk)
    assert got == want


def test_fingerprint_groups_match_hashlib(spark):
    """q29 canonical-form fingerprint: lower → strip non-alnum → collapse
    spaces → trim → md5, recomputed with Python re + hashlib (third md5
    implementation and an independent regex engine)."""
    import re

    got = {
        r.fingerprint: (r.n_docs, r.min_doc_id)
        for r in load_all()["q29_fingerprint_groups"].fn(spark, SF_DIR).collect()
    }
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    groups: dict[str, list] = {}
    for i, text in zip(tbl.column(0).to_pylist(), tbl.column(1).to_pylist()):
        canon = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()
        fp = hashlib.md5(canon.encode()).hexdigest()
        groups.setdefault(fp, []).append(i)
    want = {fp: (len(ids), min(ids)) for fp, ids in groups.items()}
    assert got == want


def test_normalization_gain_matches_hashlib(spark):
    """q170 dedup-gain audit: raw vs normalized distinct-hash counts —
    note the q170 canonicalization REPLACES non-alnum with a space
    (unlike q29's deletion), so the twin pins that the two forms stay
    deliberately distinct."""
    import re

    got = load_all()["q170_normalization_gain"].fn(spark, SF_DIR).collect()[0]
    texts = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text"]
    ).column(0).to_pylist()
    raw = {hashlib.md5(t.encode()).hexdigest() for t in texts}
    norms = [
        re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        for t in texts
    ]
    norm = {hashlib.md5(c.encode()).hexdigest() for c in norms}
    changed = sum(1 for t, c in zip(texts, norms) if c != t)
    assert got.n_docs == len(texts)
    assert got.n_changed == changed
    assert (got.groups_raw, got.groups_norm) == (len(raw), len(norm))
    assert got.dups_raw == len(texts) - len(raw)
    assert got.dups_norm == len(texts) - len(norm)
