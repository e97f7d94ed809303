"""Independent brute-force twins for the rank-propagation graph family.

q143/q280/q147's DuckDB oracles are UNROLLED-CTE mirrors of the engine's
own iteration shape — if the formulation itself were wrong, both sides
would agree and the bug would hide.  These twins recompute the same
results with pure-Python dict/set arithmetic written straight from the
documented contracts (and, for PageRank, additionally against the
TEXTBOOK float power iteration), so an agreement here is genuinely
independent evidence:

- ``pagerank_integer``: exact match vs a dict-based integer walk, and
  <=1e-6 relative error vs float PageRank (the quantum is 1e12, so 5
  iterations of flooring lose < 1e-9 relative mass).
- ``personalized_pagerank_integer``: exact match on a directed graph
  with dst-only sinks, out-edge-less seeds, and an isolated seed —
  the documented dangling-mass-discarded variant.
- ``triangle_participation``: exact per-node counts vs all-C(n,3)
  triple enumeration on a hub-heavy graph (exercises the degree-ordered
  orientation path the fixture graphs barely stress).
"""

from __future__ import annotations

import random
from collections import Counter, defaultdict

Q = 1_000_000_000_000


def _random_edges(seed: int, n: int, m: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    out = set()
    while len(out) < m:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            out.add((u, v))
    return sorted(out)


def _pagerank_int_py(
    edges: list[tuple[int, int]], iterations: int = 5
) -> dict[int, int]:
    """Integer PageRank from the docstring contract: nodes are the edge
    SOURCES; per-node quota ``(r*85) div (100*outdeg)`` is sent along
    each out-edge; mass landing on a non-source node is dropped;
    ``r_next = teleport + received``."""
    out: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    nodes = set(out)
    teleport = Q * 15 // 100
    r = {u: Q for u in nodes}
    for _ in range(iterations):
        recv = {u: 0 for u in nodes}
        for u, outs in out.items():
            w = (r[u] * 85) // (100 * len(outs))
            for v in outs:
                if v in nodes:
                    recv[v] += w
        r = {u: teleport + recv[u] for u in nodes}
    return r


def _pagerank_float_py(
    edges: list[tuple[int, int]], iterations: int = 5
) -> dict[int, float]:
    """Textbook damped power iteration, unit teleport basis:
    r_{t+1}(v) = 0.15 + 0.85 * sum_{u->v} r_t(u)/outdeg(u)."""
    out: dict[int, list[int]] = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    nodes = set(out)
    r = {u: 1.0 for u in nodes}
    for _ in range(iterations):
        recv = {u: 0.0 for u in nodes}
        for u, outs in out.items():
            w = 0.85 * r[u] / len(outs)
            for v in outs:
                if v in nodes:
                    recv[v] += w
        r = {u: 0.15 + recv[u] for u in nodes}
    return r


def test_pagerank_integer_matches_python_and_textbook_float(spark):
    from cassandra_analytics_example_spark.operators.graph import (
        pagerank_integer,
    )

    und = _random_edges(20260815, n=60, m=150)
    # symmetrize (the documented no-dangling regime) + a few one-way
    # extras so outdegrees differ between directions
    edges = sorted(set(und) | {(v, u) for u, v in und} | {(0, 1), (2, 3)})
    got = {
        r.node: r.r
        for r in pagerank_integer(
            spark.createDataFrame(edges, "src long, dst long"),
            iterations=5,
        ).collect()
    }
    assert got == _pagerank_int_py(edges, iterations=5)
    want_f = _pagerank_float_py(edges, iterations=5)
    assert set(got) == set(want_f)
    for node, rf in want_f.items():
        assert abs(got[node] / Q - rf) <= 1e-6 * rf, node


def test_pagerank_integer_drops_mass_to_nonsource_sinks(spark):
    """Directed chain into a sink: node universe is sources-only, the
    sink neither appears in the output nor recycles mass."""
    from cassandra_analytics_example_spark.operators.graph import (
        pagerank_integer,
    )

    edges = [(0, 1), (1, 2), (2, 99), (0, 2)]  # 99 has no out-edges
    got = {
        r.node: r.r
        for r in pagerank_integer(
            spark.createDataFrame(edges, "src long, dst long"),
            iterations=4,
        ).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got == _pagerank_int_py(edges, iterations=4)


def _ppr_int_py(
    edges: list[tuple[int, int]],
    seeds: set[int],
    iterations: int = 5,
) -> dict[int, int]:
    """Documented PPR contract: node universe src ∪ dst ∪ seeds, initial
    mass Q on each seed, teleport only to seeds, dangling mass dropped."""
    out: dict[int, list[int]] = defaultdict(list)
    nodes = set(seeds)
    for u, v in edges:
        out[u].append(v)
        nodes.add(u)
        nodes.add(v)
    teleport = Q * 15 // 100
    r = {n: (Q if n in seeds else 0) for n in nodes}
    for _ in range(iterations):
        recv = {n: 0 for n in nodes}
        for u, outs in out.items():
            w = (r[u] * 85) // (100 * len(outs))
            for v in outs:
                recv[v] += w
        r = {
            n: (teleport if n in seeds else 0) + recv[n] for n in nodes
        }
    return r


def test_personalized_pagerank_matches_python_twin(spark):
    from cassandra_analytics_example_spark.operators.graph import (
        personalized_pagerank_integer,
    )

    edges = _random_edges(77, n=40, m=120)  # directed, has sinks
    # seeds: two in-graph (one guaranteed out-edge-less via node 200),
    # one fully isolated (300)
    edges = sorted(set(edges) | {(5, 200)})  # 200 is a dst-only sink
    seeds = {3, 200, 300}
    got = {
        r.node: r.r
        for r in personalized_pagerank_integer(
            spark.createDataFrame(edges, "src long, dst long"),
            spark.createDataFrame([(s,) for s in seeds], "node long"),
            iterations=5,
        ).collect()
    }
    want = _ppr_int_py(edges, seeds, iterations=5)
    assert got == want
    # isolated seed holds exactly its teleport quantum after round 1
    assert got[300] == Q * 15 // 100
    # non-seed nodes never receive teleport: every non-seed's rank is
    # pure received mass (>= 0), and mass concentrates near seeds
    assert all(v >= 0 for v in got.values())


def _triangles_py(edges: list[tuple[int, int]]) -> Counter:
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    nodes = sorted(adj)
    cnt: Counter = Counter()
    for i, u in enumerate(nodes):
        for j in range(i + 1, len(nodes)):
            v = nodes[j]
            if v not in adj[u]:
                continue
            for k in range(j + 1, len(nodes)):
                w = nodes[k]
                if w in adj[u] and w in adj[v]:
                    cnt[u] += 1
                    cnt[v] += 1
                    cnt[w] += 1
    return cnt


def test_triangle_participation_matches_triple_enumeration(spark):
    from cassandra_analytics_example_spark.operators.graph import (
        triangle_participation,
    )

    rng = random.Random(20260815)
    n = 36
    edges = set()
    # hub 0 connects to everything (stresses the orientation: the hub
    # must end up with tiny OUT-adjacency despite its huge degree)
    for v in range(1, n):
        edges.add((0, v))
    while len(edges) < 170:
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v:
            edges.add((u, v))
    # feed a noisy directed/duplicated form: both orders + self-loops
    noisy = (
        sorted(edges)
        + [(v, u) for u, v in sorted(edges)[:50]]
        + [(7, 7), (3, 3)]
    )
    got = {
        r.node: r.tri_count
        for r in triangle_participation(
            spark.createDataFrame(noisy, "src long, dst long")
        ).collect()
    }
    want = _triangles_py(sorted(edges))
    assert got == {k: v for k, v in want.items() if v > 0}
    # sanity: the hub participates in the most triangles
    assert want and got[0] == max(got.values())
