"""q16 sessionization fuse (r11 verdict task 1, the q143 playbook).

The pre-change q16 plan carried TWO WindowExec passes (lag -> cumulative
sum) plus the 4-phase countDistinct rewrite, on code untouched since r8;
the isolated fresh-JVM probe read it at 1.54x its anchor while the q01
control read 0.99x in the same sessions — real per-stage cost, not host
drift. ``session_counts`` keeps only the lag window and a plain 2-phase
aggregate. These tests pin (a) bit-identity with the sessionize-based
formulation on adversarial inputs, and (b) the plan shape the fuse bought.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.relational import (
    session_counts,
    sessionize,
)


def _random_events(seed: int, n_users: int, n_rows: int):
    """Adversarial session data: duplicate timestamps (tie-break matters),
    gaps exactly AT the threshold (strict-> semantics), single-event
    users, and bursts."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for _ in range(n_rows):
        u = rng.randrange(n_users)
        base = rng.randrange(0, 10_000)
        # cluster timestamps so exact-threshold and duplicate ts occur
        ts = base * 100 + rng.choice([0, 0, 1, 99, 100, 101])
        rows.append((u, ts, eid))
        eid += 1
    return rows


def test_session_counts_matches_sessionize_aggregate(spark):
    GAP = 100  # same units as ts; exact-threshold rows exist by design
    rows = _random_events(seed=7, n_users=37, n_rows=4000)
    df = spark.createDataFrame(rows, "user_id bigint, ts bigint, event_id bigint")

    got = {
        (r.user_id, r.n_sessions, r.n_events, r.active_span)
        for r in session_counts(
            df, "user_id", "ts", gap=GAP, order_tiebreak="event_id"
        ).collect()
    }
    sess = sessionize(
        df, user_col="user_id", ts_col="ts", gap_seconds=GAP,
        order_tiebreak="event_id",
    )
    want = {
        (r.user_id, r.n_sessions, r.n_events, r.active_span)
        for r in sess.groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
            (F.max("ts") - F.min("ts")).alias("active_span"),
        )
        .collect()
    }
    assert got == want
    assert len(want) > 0
    # and max(session_id) is the same count — the algebra the fuse rests on
    alt = {
        (r.user_id, r.n_sessions)
        for r in sess.groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
        .collect()
    }
    assert alt == {(u, s) for (u, s, _, _) in want}


def test_session_counts_single_window_no_distinct_rewrite(spark):
    """The plan the fuse bought: ONE WindowExec, no countDistinct 4-phase
    aggregate, and exactly one exchange (window and aggregate share the
    hash(user) partitioning)."""
    df = spark.createDataFrame(
        [(i % 5, i * 50, i) for i in range(200)],
        "user_id bigint, ts bigint, event_id bigint",
    )
    out = session_counts(df, "user_id", "ts", gap=100, order_tiebreak="event_id")
    out.collect()
    # AQE prints Final + Initial sections; assert on the final one, and
    # count WindowExec NODES ("Window [") — "windowspecdefinition" inside
    # the node's argument list would inflate a bare substring count
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Window [") == 1, final
    assert "distinct" not in final.lower(), final
    # local-relation input: the only exchange is the hash(user) one the
    # window needs; the aggregate must NOT add a second
    assert final.count("Exchange hashpartitioning") == 1, final


def test_sessionize_exact_past_2_53_ticks(spark):
    """r13: sessionize's gap compare is exact INTEGER arithmetic (the r12
    verdict's remaining nit — the old double cast collapsed adjacent
    ticks above 2^53, where doubles step by 2). Ticks straddling 2^53
    with gaps of exactly GAP (same session, strict >) and GAP+1 (new
    session) must split identically in both session formulations."""
    GAP = 100
    BIG = 1 << 53
    rows = []
    eid = 0
    for u in range(4):
        t = BIG - 3  # odd start: every double cast above BIG rounds
        for step in [GAP, GAP + 1, 1, GAP, GAP + 1, 3, GAP + 1]:
            rows.append((u, t, eid))
            eid += 1
            t += step
        rows.append((u, t, eid))
        eid += 1
    df = spark.createDataFrame(
        rows, "user_id bigint, ts bigint, event_id bigint"
    )
    # ground truth in exact Python ints
    import collections

    by_user = collections.defaultdict(list)
    for u, t, e in rows:
        by_user[u].append((t, e))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        n = 0
        prev = None
        for t, _ in evs:
            if prev is None or t - prev > GAP:
                n += 1
            prev = t
        want[u] = n
    got_fuse = {
        r.user_id: r.n_sessions
        for r in session_counts(
            df, "user_id", "ts", gap=GAP, order_tiebreak="event_id"
        ).collect()
    }
    sess = sessionize(
        df, user_col="user_id", ts_col="ts", gap_seconds=GAP,
        order_tiebreak="event_id",
    )
    got_ids = {
        r.user_id: r.n_sessions
        for r in sess.groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"))
        .collect()
    }
    assert got_fuse == want
    assert got_ids == want


def test_sessionize_timestamp_column_micros_compare(spark):
    """r13: a TIMESTAMP ts_col compares in whole µs with gap_seconds
    scaled — the cohorts-caller contract (gap in seconds) preserved by
    the integer rewrite. One event exactly gap apart stays in-session;
    1µs beyond splits."""
    rows = [
        (1, "2024-01-01 00:00:00", 0),
        (1, "2024-01-01 00:30:00", 1),        # exactly 1800s -> same session
        (1, "2024-01-01 01:00:00.000001", 2),  # 1800.000001s -> new session
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts_str string, event_id bigint"
    ).select("user_id", F.to_timestamp("ts_str").alias("ts"), "event_id")
    sess = sessionize(df, "user_id", "ts", 1800, "event_id")
    ids = [r.session_id for r in sess.orderBy("event_id").collect()]
    assert ids == [1, 1, 2]
