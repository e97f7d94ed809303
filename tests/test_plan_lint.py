"""Registry-wide physical-plan lint — the anti-pattern gate that runs on
EVERY registered query, so a banned plan shape can never land silently.

History: the buffered-exact-quantile anti-pattern (an exact
``percentile``/``median``/``mode`` aggregate holds every value of a group
in ONE aggregation buffer — correct at sf0.1, OOM at 100x with
low-cardinality group keys) was fixed for q113 in round 5, but the same
pattern survived in three OLDER queries (q40/q99/q127) for four rounds
because only per-query gates existed. This lint renders every registered
query's plan and asserts, for all of them at once:

* no exact ``percentile``/``percentile_cont``/``percentile_disc``/
  ``median``/``mode`` aggregate anywhere in the optimized plan —
  ``approx_percentile``/``percentile_approx`` (mergeable sketch) and the
  rank-selection operator (operators/quantiles.py) are the sanctioned
  paths;
* no ``CartesianProduct`` in the executed plan — a range/interval/
  similarity predicate that loses its equi-key degenerates into an
  all-pairs join (``BroadcastNestedLoopJoin`` stays allowed: broadcast
  against a scalar/summary frame is bounded by the broadcast threshold).

Driver materialization is covered separately (q101's LocalTableScan gate
and the no-collect review discipline): a blanket LocalTableScan ban would
false-positive the audit queries that legitimately return a bounded
scalar-aggregate frame (e.g. q99's 4-row contract table).

Runs at sf0.001 to keep the sweep cheap; plan SHAPE is scale-invariant
(AQE may re-plan exchanges at runtime but never introduces a banned
aggregate or a cartesian join that the static plan lacks).
"""

from __future__ import annotations

import re

import pytest

from cassandra_analytics_example_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"

REGISTRY = load_all()
ALL_QUERIES = sorted(REGISTRY)

# Exact-quantile aggregates (buffer-per-group). approx_percentile /
# percentile_approx deliberately do NOT match: the optional suffix must be
# immediately followed by "(" so "percentile_approx(" falls through.
_BANNED_QUANTILE = re.compile(
    r"\bpercentile(_cont|_disc)?\s*\(|\bmedian\s*\(|\bmode\s*\("
)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_banned_plan_shapes(spark, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, SF_DIR)
    qe = df._jdf.queryExecution()
    optimized = qe.optimizedPlan().toString()
    executed = qe.executedPlan().toString()

    m = _BANNED_QUANTILE.search(optimized.lower())
    assert m is None, (
        f"{name}: exact quantile aggregate `{m.group(0).strip()}` in the "
        "optimized plan — buffers a whole group on one executor; use "
        "operators/quantiles.py group_quantiles_exact (exact, "
        "rank-selection) or approx_percentile (sketch) instead"
    )
    assert "CartesianProduct" not in executed, (
        f"{name}: CartesianProduct in the executed plan — an all-pairs "
        "join; restore the equi/blocking key or broadcast the small side"
    )
    # spark_partition_id columns feed (pid, ...)-keyed joins between plan
    # branches in the two-layer prefix/offset operators. The pid mapping
    # is only consistent across branches if the partitioned frame is
    # PINNED (one cached RDD = one sampled range partitioner = one AQE
    # coalesce decision) — an unpinned frame silently loses rows at
    # scale (the q275 sf0.1 row-loss bug, round 7). Pinning surfaces as
    # an InMemoryRelation in the optimized plan.
    if "spark_partition_id" in optimized and "InMemoryRelation" not in optimized:
        pytest.fail(
            f"{name}: spark_partition_id without a pinning persist — "
            "wrap the repartitionByRange frame in "
            "operators/checkpoints.py:pin_partition_ids"
        )


# --------------------------------------------------------------------------
# Driver-materialization axis (VERDICT r6 task 7): every row-materializing
# driver read in the package must be on the pinned allowlist below, each
# with a documented bound. ``.first()`` is auto-allowed — it reads at most
# ONE row by definition (the scalar-class read the bar permits).
# ``.count()`` / ``.isEmpty()`` are scalar actions, not row reads. A new
# ``.collect()`` / ``.toPandas()`` / ``.take()`` / ``.head()`` /
# ``.toLocalIterator()`` anywhere else fails this lint until it is either
# redesigned distributed or added HERE with its bound written down.

_DRIVER_READ = re.compile(
    r"\.(collect|toPandas|take|head|toLocalIterator)\s*\("
)

#: (file relative to the package, exact stripped source line) → bound note.
_DRIVER_READ_ALLOWLIST = {
    (
        "queries/events/cohorts.py",
        'ordered = means.orderBy("mean_microcents").collect()',
    ): "bootstrap means table ≤ B=32 rows (one row per resample index)",
    (
        "operators/membership.py",
        'keep = sorted(r["file"] for r in survivors.collect())',
    ): "keep-list capped by max_pruned_files with full-scan fallback (r6)",
}


def test_driver_materializations_are_enumerated():
    import pathlib

    pkg = pathlib.Path("cassandra_analytics_example_spark")
    found: dict[tuple[str, str], int] = {}
    for path in sorted(pkg.rglob("*.py")):
        rel = str(path.relative_to(pkg))
        for lineno, line in enumerate(
            path.read_text().splitlines(), start=1
        ):
            m = _DRIVER_READ.search(line)
            if m is None:
                continue
            hash_pos = line.find("#")
            if 0 <= hash_pos < m.start():  # comment, not code
                continue
            found[(rel, line.strip())] = lineno
    extra = {k: v for k, v in found.items() if k not in _DRIVER_READ_ALLOWLIST}
    assert not extra, (
        "unreviewed driver materialization(s) — redesign distributed or "
        f"add to the allowlist with a documented bound: {extra}"
    )
    stale = set(_DRIVER_READ_ALLOWLIST) - set(found)
    assert not stale, f"allowlist entries no longer in the source: {stale}"
