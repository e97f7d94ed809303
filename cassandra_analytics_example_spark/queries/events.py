"""Event-time analytics over the ``events`` table — the batch twins of the
streaming operators (SURVEY.md §7 M3), each oracle-checked; the streaming
variants (streaming/windows.py) reuse the same logic with watermarks.

Timestamps surface as integer epoch-µs (``ts_us``) or truncated ISO strings,
never raw timestamps — see queries/_tables.py for the ns handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.functions.numeric import money_sum
from cassandra_analytics_example_spark.operators.quantiles import (
    group_quantiles_exact,
)
from cassandra_analytics_example_spark.operators.relational import (
    asof_join,
    lww_latest,
    sessionize,
)
from cassandra_analytics_example_spark.queries import register
from cassandra_analytics_example_spark.queries._tables import table

# --------------------------------------------------------------------------
# q15 — tumbling window aggregate (batch twin of the streaming hourly roll).
# --------------------------------------------------------------------------


@register(
    "q15_hourly_event_windows",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="tumbling 1h window aggregate (F.window batch form)",
    tags=("events", "window"),
)
def q15_hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), money_sum("value", "sum_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q16 — gap-based sessionization (lag + cumulative session ids).
# --------------------------------------------------------------------------

GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


@register(
    "q16_user_sessions",
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT user_id, ts_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM marked
)
SELECT user_id,
       count(DISTINCT session_id) AS n_sessions,
       count(*) AS n_events,
       max(ts_us) - min(ts_us) AS active_span_us
FROM sessions
GROUP BY user_id
""",
    doc="sessionize operator: 30-min-gap sessions per user",
    tags=("events", "session"),
)
def q16_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts_us", "event_id")
    sess = sessionize(
        ev, user_col="user_id", ts_col="ts_us",
        gap_seconds=GAP_US, order_tiebreak="event_id",
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("active_span_us"),
    )


# --------------------------------------------------------------------------
# q17 — last-write-wins reconciliation (the Cassandra read semantics).
# --------------------------------------------------------------------------


@register(
    "q17_lww_latest_events",
    oracle="""
SELECT user_id, event_type, epoch_us(ts) AS ts_us, value FROM (
  SELECT user_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
""",
    doc="lww_latest operator: newest version per (user, event_type) — the "
    "last-write-wins reconcile of the reference's bulk read (SURVEY §7)",
    tags=("events", "dedup"),
)
def q17_lww_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    latest = lww_latest(
        ev,
        keys=["user_id", "event_type"],
        version_order=[F.col("ts_ns").desc(), F.col("event_id").desc()],
    )
    return latest.select("user_id", "event_type", "ts_us", "value")


# --------------------------------------------------------------------------
# q18 — as-of join: attach the most recent prior signup per purchase.
# --------------------------------------------------------------------------


@register(
    "q18_asof_purchase_signup",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, 1 AS is_left
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value, 0 AS is_left
  FROM events WHERE event_type = 'signup'
),
carried AS (
  SELECT user_id, event_id, ts_us, value, is_left,
         last_value(CASE WHEN is_left = 0 THEN ts_us END IGNORE NULLS) OVER w AS signup_ts_us,
         last_value(CASE WHEN is_left = 0 THEN value END IGNORE NULLS) OVER w AS signup_value
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, is_left
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts_us, value, signup_ts_us, signup_value
FROM carried WHERE is_left = 1
""",
    doc="asof_join operator: purchases ← most recent prior signup per user "
    "(single shuffle, no range-join explosion)",
    tags=("events", "asof"),
)
def q18_asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts_us").alias("signup_ts"), F.col("value").alias("sv")
    )
    joined = asof_join(
        purchases,
        signups,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="signup_ts",
        right_values=["signup_ts", "sv"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.col("signup_ts").alias("signup_ts_us"),
        F.col("sv").alias("signup_value"),
    )


# --------------------------------------------------------------------------
# q38 — sliding windows: each event lands in width/slide overlapping
# windows (F.window with a slide). The DuckDB twin materializes the same
# window set arithmetically: starts = floor(t/slide)*slide - j*slide for
# j in [0, width/slide).
# --------------------------------------------------------------------------

_SLIDE_US = 1_800_000_000  # 30 min


@register(
    "q38_sliding_windows",
    oracle=f"""
WITH e AS (SELECT epoch_us(ts) AS tus, event_type, value FROM events),
wins AS (
  SELECT CAST(make_timestamp((tus // {_SLIDE_US}) * {_SLIDE_US} - j * {_SLIDE_US})
              AS VARCHAR) AS window_start,
         event_type, value
  FROM e, UNNEST([0, 1]) AS t(j)
)
SELECT window_start, event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM wins
GROUP BY 1, 2
""",
    doc="sliding 1h/30min overlapping windows (each event in 2 windows)",
    tags=("events", "window"),
)
def q38_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), money_sum("value", "sum_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# --------------------------------------------------------------------------
# q45 — interval (range) join: purchases attributed to the same user's view
# within 1 hour. Equi-join on user_id + time-range residual — scale-safe
# (the shuffle key is user_id; no cross product). Batch twin of streaming
# s06 (stream-stream join with watermark-bounded state).
# --------------------------------------------------------------------------

ATTRIBUTION_WINDOW_US = 3_600_000_000  # 1 hour


@register(
    "q45_view_purchase_attribution",
    oracle=f"""
WITH v AS (
  SELECT user_id, event_id AS view_id, epoch_us(ts) AS view_ts_us
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT user_id, event_id AS purchase_id,
         CAST(value AS DOUBLE) AS purchase_value,
         epoch_us(ts) AS purchase_ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, view_id, purchase_id, purchase_value,
       view_ts_us, purchase_ts_us
FROM v JOIN p ON v.user_id = p.user_id
 AND purchase_ts_us >= view_ts_us
 AND purchase_ts_us <= view_ts_us + {ATTRIBUTION_WINDOW_US}
""",
    doc="interval join: purchases within 1h after a view by the same user "
    "(equi-join on user_id + time-range residual; batch twin of s06)",
    tags=("events", "join"),
)
def q45_view_purchase_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("view_ts_us"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").cast("double").alias("purchase_value"),
        F.unix_micros("ts").alias("purchase_ts_us"),
    )
    return (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts_us") >= F.col("view_ts_us"))
            & (
                F.col("purchase_ts_us")
                <= F.col("view_ts_us") + F.lit(ATTRIBUTION_WINDOW_US)
            ),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            "purchase_value",
            "view_ts_us",
            "purchase_ts_us",
        )
    )


# --------------------------------------------------------------------------
# q49 — LWW reconcile WITH tombstones (delete semantics). The fixture has no
# real deletion markers, so 'error' events stand in as tombstones: a user's
# newest event being an error suppresses the user from the reconciled view;
# any later non-error event resurrects them. Same single-shuffle plan as q17
# plus a post-window filter.
# --------------------------------------------------------------------------


@register(
    "q49_lww_with_tombstones",
    oracle="""
SELECT user_id, event_type, epoch_us(ts) AS ts_us, value FROM (
  SELECT user_id, event_type, ts, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1 AND event_type <> 'error'
""",
    doc="lww_latest with tombstone semantics: newest event per user wins; "
    "a tombstone (stand-in: event_type='error') as the newest version "
    "suppresses the key, a newer write resurrects it",
    tags=("events", "dedup"),
)
def q49_lww_with_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    latest = lww_latest(
        ev,
        keys=["user_id"],
        version_order=[F.col("ts_ns").desc(), F.col("event_id").desc()],
        tombstone=F.col("event_type") == "error",
    )
    return latest.select("user_id", "event_type", "ts_us", "value")


# --------------------------------------------------------------------------
# q68 — key-skew diagnosis: the profiling pass you run BEFORE keying a
# 100 TB shuffle on a column. Pairs with q62 (salted_join): diagnose
# here, mitigate there. Both output shapes are one aggregate row /
# top-k rows — never the data.
# --------------------------------------------------------------------------


@register(
    "q68_key_skew_report",
    oracle="""
WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(max(cnt) AS BIGINT) AS max_cnt,
       CAST(min(cnt) AS BIGINT) AS min_cnt,
       CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS hot_share,
       CAST(max(cnt) * count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
         AS skew_ratio
FROM c
""",
    doc="key-skew diagnosis of events.user_id: cardinality, hottest-key "
    "share, max/mean skew ratio — keyed count + scalar reduce, ratios as "
    "single divisions of exact integers",
    tags=("profiling", "scale"),
)
def q68_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.profiling import (
        key_skew_report,
    )

    return key_skew_report(table(spark, sf_dir, "events"), "user_id")


@register(
    "q69_hot_keys",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
FROM events GROUP BY user_id
ORDER BY cnt DESC, user_id ASC
LIMIT 10
""",
    doc="the 10 hottest event keys with exact counts and a total order — "
    "the keys a salting/AQE mitigation would split",
    tags=("profiling", "scale"),
)
def q69_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.profiling import hot_keys

    return hot_keys(table(spark, sf_dir, "events"), "user_id", 10).select(
        "user_id", F.col("cnt").cast("bigint").alias("cnt")
    )


# --------------------------------------------------------------------------
# q74 — ordered funnel: view → click → purchase. Stage k's timestamp is
# the earliest event of that type AFTER the user completed stage k-1;
# all stages are full-frame window mins over ONE user partitioning, so
# the whole funnel is a single shuffle of the event stream.
# --------------------------------------------------------------------------


@register(
    "q74_funnel_view_click_purchase",
    oracle="""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
s AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts_us END)
           OVER (PARTITION BY user_id) AS t_view
  FROM e),
s2 AS (
  SELECT e.user_id, e.event_type, e.ts_us, s.t_view,
         min(CASE WHEN e.event_type = 'click' AND e.ts_us > s.t_view
                   AND e.ts_us <= s.t_view + 21600000000
                  THEN e.ts_us END)
           OVER (PARTITION BY e.user_id) AS t_click
  FROM e JOIN (SELECT DISTINCT user_id, t_view FROM s) s USING (user_id)),
s3 AS (
  SELECT DISTINCT user_id, t_view, t_click,
         min(CASE WHEN event_type = 'purchase' AND ts_us > t_click
                   AND ts_us <= t_click + 21600000000
                  THEN ts_us END)
           OVER (PARTITION BY user_id) AS t_purchase
  FROM s2)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view,
       CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_click,
       CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_purchase,
       CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS conversion_rate
FROM s3
""",
    doc="ordered view→click→purchase funnel with a 6h conversion window "
    "per stage: earliest-after-previous-stage times via chained "
    "full-frame windows on ONE user partitioning (single shuffle for "
    "any stage count), then a scalar conversion summary",
    tags=("events", "window"),
)
def q74_funnel_view_click_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cassandra_analytics_example_spark.operators.relational import (
        funnel_stages,
    )

    ev = table(spark, sf_dir, "events")
    per_user = funnel_stages(
        ev,
        "user_id",
        "ts_us",
        [
            ("view", F.col("event_type") == "view"),
            ("click", F.col("event_type") == "click"),
            ("purchase", F.col("event_type") == "purchase"),
        ],
        max_gap=21_600_000_000,  # 6h in µs
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.col("t_view").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_view"),
        F.sum(F.col("t_click").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_click"),
        F.sum(F.col("t_purchase").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_purchase"),
        (
            F.sum(F.col("t_purchase").isNotNull().cast("bigint")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("conversion_rate"),
    )


# --------------------------------------------------------------------------
# q75 — retention cohorts: users grouped by their first-activity week
# bucket; each later week bucket counts how many are still active.
# Week buckets are integer epoch-microsecond divisions (calendar-free,
# engine-exact); the cohort assignment is a full-frame window min on
# the same user partitioning discipline as the funnel.
# --------------------------------------------------------------------------


@register(
    "q75_retention_cohorts",
    oracle="""
WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week_idx
           FROM events),
c AS (SELECT user_id, week_idx,
             min(week_idx) OVER (PARTITION BY user_id) AS cohort_week
      FROM e),
d AS (SELECT DISTINCT user_id, cohort_week,
             week_idx - cohort_week AS week_offset
      FROM c)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM d GROUP BY cohort_week, week_offset
""",
    doc="weekly retention cohorts: first-activity week via window min on "
    "the user partition, distinct (user, cohort, offset), grouped active "
    "counts — integer week buckets, no calendar/timezone dependence",
    tags=("events", "window"),
)
def q75_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts_us") / 604_800_000_000).cast("bigint").alias("week_idx")
    )
    w = Window.partitionBy("user_id")
    d = (
        ev.withColumn("cohort_week", F.min("week_idx").over(w))
        .select(
            "user_id",
            "cohort_week",
            (F.col("week_idx") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    return d.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )


# --------------------------------------------------------------------------
# q78 — rolling-frame anomaly detection: an event is anomalous when its
# value exceeds 2x the mean of the user's previous 10 events. The frame
# is ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING over the user's time
# order; values are quantized to integer micro-units FIRST so the
# rolling sums are exact integers and the 2x-mean comparison is the
# integer cross-product value*n > 2*sum — no float accumulation
# anywhere, so the flag is engine- and order-exact.
# --------------------------------------------------------------------------


@register(
    "q78_rolling_anomaly",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 1000000) AS BIGINT) AS v_micro
  FROM events),
r AS (
  SELECT event_id, user_id, ts_us, v_micro,
         sum(v_micro) OVER w AS prev_sum,
         count(*) OVER w AS prev_n
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id, ts_us, v_micro,
       CAST(prev_n AS BIGINT) AS prev_n
FROM r
WHERE prev_n >= 5 AND v_micro * prev_n > 2 * prev_sum
""",
    doc="rolling-frame anomaly flag: value > 2x the mean of the user's "
    "previous 10 events (ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING), "
    "values quantized to integer micro-units so the test is the exact "
    "integer cross-product v*n > 2*sum — requires >= 5 prior events",
    tags=("events", "window"),
)
def q78_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts_us",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"), F.col("event_id"))
        .rowsBetween(-10, -1)
    )
    r = ev.select(
        "event_id",
        "user_id",
        "ts_us",
        "v_micro",
        F.sum("v_micro").over(w).alias("prev_sum"),
        F.count(F.lit(1)).over(w).alias("prev_n"),
    )
    return r.filter(
        (F.col("prev_n") >= 5)
        & (F.col("v_micro") * F.col("prev_n") > 2 * F.col("prev_sum"))
    ).select(
        "event_id",
        "user_id",
        "ts_us",
        "v_micro",
        F.col("prev_n").cast("bigint").alias("prev_n"),
    )


# --------------------------------------------------------------------------
# q80 — event-type transition matrix: counts of consecutive (from → to)
# event pairs per user order — the Markov-chain view of user paths.
# lag() over the user's time order needs the SAME single shuffle as
# every other per-user window here; ties in the fixture are broken by
# event_id so the sequence is a total order.
# --------------------------------------------------------------------------


@register(
    "q80_event_transitions",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events)
SELECT prev_type AS from_type, event_type AS to_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
""",
    doc="event-type transition matrix (Markov path view): lag() over each "
    "user's total-ordered event sequence, grouped transition counts — "
    "one user-partition shuffle plus one small aggregate",
    tags=("events", "window"),
)
def q80_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us"), F.col("event_id"))
    s = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("from_type"),
    )
    return (
        s.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --------------------------------------------------------------------------
# q83 — TTL expiry: Cassandra's per-cell TTL semantics as an explicit
# batch operator — rows older than the TTL relative to the dataset's
# own observation horizon (max ts) are expired. The cutoff is a scalar
# aggregate broadcast back as a literal; expiry itself is a pure
# filter, pushable once the cutoff is resolved.
# --------------------------------------------------------------------------


@register(
    "q83_ttl_expiry",
    oracle="""
WITH h AS (SELECT max(epoch_us(ts)) AS horizon FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_live,
       CAST(min(epoch_us(ts)) AS BIGINT) AS oldest_live_us
FROM events, h
WHERE epoch_us(ts) > horizon - 604800000000
GROUP BY event_type
""",
    doc="TTL expiry (Cassandra cell-TTL semantics, batch form): drop rows "
    "older than 7 days before the dataset's max timestamp — scalar "
    "horizon broadcast, then a pure filter + grouped liveness counts",
    tags=("events", "reference-parity"),
)
def q83_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    horizon = ev.agg(F.max("ts_us").alias("__h"))
    return (
        ev.crossJoin(F.broadcast(horizon))
        .filter(F.col("ts_us") > F.col("__h") - 604_800_000_000)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_live"),
            F.min("ts_us").cast("bigint").alias("oldest_live_us"),
        )
    )


# --------------------------------------------------------------------------
# q84 — per-user event-type value map: grouped aggregation INTO a map
# column (the Cassandra collection-column shape), surfaced as a
# sorted "type:micro_total" packed string so the representation is
# engine-exact (map iteration order is unspecified in every engine).
# --------------------------------------------------------------------------


@register(
    "q84_user_type_value_map",
    oracle="""
WITH agg AS (
  SELECT user_id, event_type,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
           AS v_micro
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       string_agg(event_type || ':' || CAST(v_micro AS VARCHAR),
                  '|' ORDER BY event_type) AS type_totals
FROM agg GROUP BY user_id
""",
    doc="per-user map<event_type, total>: two-level aggregation into a "
    "collection column (Cassandra map-column shape), packed as a "
    "key-sorted string because map iteration order is unspecified in "
    "every engine; totals in integer micro-units",
    tags=("events", "agg"),
)
def q84_user_type_value_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("v_micro"),
    )
    agg = ev.groupBy("user_id", "event_type").agg(
        F.sum("v_micro").cast("bigint").alias("v_micro")
    )
    packed = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("event_type").alias("t"), F.col("v_micro").alias("v"))
                )
            ),
            lambda s: F.concat_ws(":", s["t"], s["v"].cast("string")),
        ),
        "|",
    )
    return agg.groupBy("user_id").agg(packed.alias("type_totals"))


# --------------------------------------------------------------------------
# q86 — RANGE frame (value-range window): per event, how many of the
# same user's events fall in the PRECEDING HOUR by timestamp value —
# a rows-frame can't express this (event counts per hour vary); the
# range frame is resolved against the ordered ts_us VALUES. Completes
# the frame-spec surface: ROWS (q78), RANGE (here), unbounded (q74),
# growing (q18's as-of form).
# --------------------------------------------------------------------------


@register(
    "q86_range_frame_hourly_load",
    oracle="""
SELECT event_id, user_id,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                           RANGE BETWEEN 3600000000 PRECEDING
                                     AND CURRENT ROW) AS BIGINT)
         AS n_events_last_hour
FROM events
""",
    doc="RANGE frame: same-user event count within the trailing hour BY "
    "TIMESTAMP VALUE (not row count) — the frame type rows-frames can't "
    "express; one user-partition shuffle",
    tags=("events", "window"),
)
def q86_range_frame_hourly_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_events_last_hour"),
    )


# --------------------------------------------------------------------------
# q93 — band join without an equi key: purchase events of DIFFERENT users
# within 5 minutes of each other. Cell-bucketed candidate generation
# (operators/relational.py:banded_self_join) keeps it an equi-join on the
# cell id — the naive |Δts| predicate would plan as a nested-loop cross
# join.
# --------------------------------------------------------------------------

_BAND_US = 300_000_000  # 5 minutes


@register(
    "q93_purchase_band_join",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS tus
  FROM events WHERE event_type = 'purchase'
)
SELECT a.event_id AS id_a, b.event_id AS id_b,
       abs(a.tus - b.tus) AS delta
FROM p a JOIN p b
  ON a.event_id < b.event_id
 AND a.user_id <> b.user_id
 AND abs(a.tus - b.tus) <= {_BAND_US}
""",
    doc="band self-join (no equi key): cross-user purchase pairs within "
    "5 min via div-band cell bucketing — equi-join on the cell id, "
    "never a nested-loop cross join",
    tags=("events", "join", "scale"),
)
def q93_purchase_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.relational import (
        banded_self_join,
    )

    ev = table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    return banded_self_join(
        p,
        "event_id",
        "ts_us",
        _BAND_US,
        extra_cond=lambda j: F.col("l_user_id") != F.col("r_user_id"),
    )


# --------------------------------------------------------------------------
# q94 — windowed first-event dedup: first event per (user, type) per
# 30-min tumbling window — the SQL-expressible batch twin of streaming
# suppression dedup (s03's semantics restricted to window-aligned
# suppression; total order on (ts, event_id) makes it deterministic).
# --------------------------------------------------------------------------

_W30_US = 1_800_000_000


@register(
    "q94_windowed_first_event",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS tus,
         (epoch_us(ts) // {_W30_US}) AS w
  FROM events
),
r AS (
  SELECT *, row_number() OVER (
           PARTITION BY user_id, event_type, w
           ORDER BY tus, event_id) AS rn
  FROM e
)
SELECT user_id, event_type,
       CAST(w * {_W30_US} AS BIGINT) AS window_start_us,
       event_id, tus AS ts_us
FROM r WHERE rn = 1
""",
    doc="windowed first-event dedup: one survivor per (user, type, "
    "30-min tumbling window), deterministic (ts, event_id) order — "
    "batch twin of streaming suppression dedup, one shuffle on the "
    "composite key",
    tags=("events", "dedup", "window"),
)
def q94_windowed_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = F.expr(f"ts_us div {_W30_US}")
    win = Window.partitionBy("user_id", "event_type", "__w").orderBy(
        "ts_us", "event_id"
    )
    return (
        ev.select("user_id", "event_type", "event_id", "ts_us", w.alias("__w"))
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            "event_type",
            (F.col("__w") * _W30_US).cast("bigint").alias("window_start_us"),
            "event_id",
            "ts_us",
        )
    )


# --------------------------------------------------------------------------
# q101 — dynamic partition pruning: a fact table PARTITIONED by
# event_type joined to a small filtered dimension must prune fact
# partitions AT RUNTIME from the dim's build side (DPP) — directories
# for non-qualifying types are never listed, let alone read. The scan
# gate lives in tests/test_plans.py (dynamicpruning in the scan's
# PartitionFilters).
# --------------------------------------------------------------------------


# Partitioned fact/dim layout for the DPP demonstration, written ONCE per
# (session, sf_dir) — the query itself must not pay a parquet write per
# invocation (r4 advice: bench paid a tempdir write every run).
_DPP_ROOTS: dict[tuple[str, str], str] = {}


def _dpp_tables(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    from cassandra_analytics_example_spark.operators.layout import (
        write_partitioned,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    root = _DPP_ROOTS.get(key)
    if root is not None and os.path.isdir(root):
        return root
    ev = table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="dpp-")
    write_partitioned(
        ev.select("event_id", "value", "event_type"), root, ["event_type"]
    )
    spark.createDataFrame(
        [("view", "browse"), ("click", "browse"), ("purchase", "conversion"),
         ("signup", "conversion"), ("error", "noise")],
        "event_type string, kind string",
    ).write.mode("overwrite").parquet(f"{root}_dim")
    _DPP_ROOTS[key] = root
    return root


def dpp_join_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LAZY DPP join. Caller owns the
    ``spark.sql.optimizer.dynamicPartitionPruning.useStats`` scope — the
    pruning decision is made when an action optimizes this plan, not when
    it is built (tests/test_plans.py gates the dynamicpruning expression
    through this builder inside its own conf scope)."""
    # Two conditions the PartitionPruning rule needs that a naive setup
    # misses: (1) the benefit heuristic consults table stats and a
    # fixture-sized fact is below threshold — the ratio-based path must be
    # pinned by the caller via useStats=false (at real scale the stats path
    # inserts the filter on its own);
    # (2) the dim filter must be "likely selective" — a comparison/IN
    # predicate, NOT a bare boolean column (which isLikelySelective
    # rejects), and it must survive as a Filter node, so the dim is
    # parquet-backed rather than a constant-folded literal relation.
    root = _dpp_tables(spark, sf_dir)
    fact = spark.read.parquet(root)
    dim = spark.read.parquet(f"{root}_dim")
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("kind") == "conversion")),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q101_dynamic_partition_pruning",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events
WHERE event_type IN ('purchase', 'signup')
GROUP BY event_type
""",
    doc="dynamic partition pruning: event_type-partitioned fact x small "
    "conversion-dimension join — the dim's runtime filter prunes fact "
    "DIRECTORIES before the scan (plan-gated); at 100 TB this is the "
    "difference between reading 2/5 and 5/5 of the table; the useStats "
    "override is scoped to this execution and the result materializes "
    "via eager localCheckpoint (no driver collect)",
    tags=("events", "join", "scale"),
)
def q101_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scope the optimizer override to THIS query's execution and restore it
    # (r3 advice: the conf previously leaked into every later query on the
    # shared session). The pruning happens at action time, so the plan is
    # optimized + materialized inside the scope by an EAGER localCheckpoint
    # — the result stays a distributed DataFrame over executor blocks, not
    # a driver-side collect()+re-parallelize (r4 advice).
    key = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    try:
        return dpp_join_plan(spark, sf_dir).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


# --------------------------------------------------------------------------
# q102 — VariantType semi-structured path: parse_json once into a binary
# variant column, then typed variant_get extractions — the modern
# (shredded, vectorizable) alternative to per-field get_json_object
# re-parsing (q14). The variant value itself is engine-internal; the
# query surfaces only extracted SQL types, so the oracle checks values.
# --------------------------------------------------------------------------


@register(
    "q102_variant_json",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k
FROM events
GROUP BY event_type
""",
    doc="VariantType semi-structured ingestion: props parsed ONCE via "
    "parse_json into a variant column, typed variant_get extraction, "
    "grouped aggregate — one parse per row regardless of extracted "
    "field count, vs get_json_object's re-parse per field (q14)",
    tags=("events", "json"),
)
def q102_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("v")
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )


# --------------------------------------------------------------------------
# q106 — cogrouped applyInPandas: the two-sided grouped-map surface
# (events ⋈ orders per customer/user key, aligned inside one Arrow batch
# pair per key). The pandas logic is deliberately SQL-mirrorable so the
# oracle can value-check the Python boundary.
# --------------------------------------------------------------------------


@register(
    "q106_cogroup_user_activity",
    oracle="""
WITH e AS (
  SELECT user_id, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS event_value
  FROM events GROUP BY user_id
),
o AS (
  SELECT o_custkey AS user_id, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS order_value
  FROM orders WHERE o_custkey <= 150 GROUP BY o_custkey
)
SELECT coalesce(e.user_id, o.user_id) AS user_id,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       coalesce(event_value, 0.0) AS event_value,
       CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
       coalesce(order_value, 0.0) AS order_value
FROM e FULL OUTER JOIN o ON e.user_id = o.user_id
""",
    doc="cogrouped grouped-map (applyInPandas over a cogroup): events and "
    "orders aligned per user key inside one Arrow batch pair — the "
    "two-sided escape hatch for per-key logic joins can't express; "
    "decimal-exact sums keep the Python boundary oracle-checkable",
    tags=("events", "python", "cogroup"),
)
def q106_cogroup_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 150)
        .select(F.col("o_custkey").alias("user_id"), "o_totalprice")
    )

    def align(key, events_pdf: pd.DataFrame, orders_pdf: pd.DataFrame):
        from decimal import Decimal

        ev_val = sum(
            (Decimal(str(v)).quantize(Decimal("0.0001")) for v in events_pdf["value"]),
            Decimal(0),
        )
        ord_val = sum(
            (Decimal(str(v)).quantize(Decimal("0.01")) for v in orders_pdf["o_totalprice"]),
            Decimal(0),
        )
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(events_pdf)],
                "event_value": [float(ev_val)],
                "n_orders": [len(orders_pdf)],
                "order_value": [float(ord_val)],
            }
        )

    return (
        ev.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(
            align,
            schema="user_id bigint, n_events bigint, event_value double, "
            "n_orders bigint, order_value double",
        )
    )


# --------------------------------------------------------------------------
# q107 — built-in session_window in BATCH mode: the same gap-merge the
# streaming layer uses (s02), run as a batch aggregate and checked
# against the SQL gap-and-islands formulation — proving the built-in,
# the manual sessionize operator (q16) and the oracle all agree on
# session semantics.
# --------------------------------------------------------------------------


@register(
    "q107_batch_session_window",
    oracle=f"""
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS tus,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
  SELECT user_id, tus,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY tus
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(tus) AS session_start_us,
       max(tus) + {GAP_US} AS session_end_us,
       CAST(count(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    doc="F.session_window in BATCH mode (30-min gap): the built-in "
    "gap-merge aggregate the streaming layer uses (s02), value-checked "
    "against the SQL gap-and-islands formulation — session end = last "
    "event + gap, per Spark's session_window semantics",
    tags=("events", "session", "window"),
)
def q107_batch_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# q112 — SCD2 validity intervals: the warehouse "slowly changing
# dimension type 2" history build — collapse each user's event sequence
# into state intervals [valid_from, valid_to) with change-detection
# (consecutive repeats of the same state merge into one interval; the
# open current interval carries a NULL valid_to).
# --------------------------------------------------------------------------


@register(
    "q112_scd2_intervals",
    oracle="""
WITH s AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events
),
c AS (SELECT * FROM s WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type AS state,
       CAST(ts_us AS BIGINT) AS valid_from_us,
       CAST(lead(ts_us) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS BIGINT)
         AS valid_to_us
FROM c
""",
    doc="SCD2 history build: change-detection (lag) then interval "
    "construction (lead) over each user's total-ordered sequence — "
    "consecutive same-state events merge, the live state has NULL "
    "valid_to. Both windows share one user_id partitioning, and the "
    "filter between them preserves it, so the whole history build is a "
    "SINGLE shuffle (plan-gated)",
    tags=("events", "window"),
)
def q112_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us"), F.col("event_id"))
    s = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.lag("event_type").over(w).alias("__prev"),
    )
    changes = s.filter(
        F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("ts_us"), F.col("event_id")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts_us").cast("bigint").alias("valid_from_us"),
        F.lead("ts_us").over(w2).cast("bigint").alias("valid_to_us"),
    )


# --------------------------------------------------------------------------
# q113 — winsorized statistics: robust per-group clipping at exact p05/p95
# (the training-data outlier treatment that caps rather than drops). Two
# passes: a group-level percentile table (broadcast back), then clip +
# aggregate. The percentile table comes from the DISTRIBUTED rank-selection
# operator (operators/quantiles.py), not F.percentile — an exact percentile
# aggregate buffers a whole group in one task, and event_type has ~5
# distinct values, so at 100x one executor would hold billions of doubles.
# The clipped mean goes through the fixed-point convention (floor to 1e-6,
# exact integer sum) so it is bit-identical at any parallelism — raw double
# summation is partition-order-dependent.
# --------------------------------------------------------------------------


@register(
    "q113_winsorized_stats",
    oracle="""
WITH p AS (
  SELECT event_type,
         quantile_cont(CAST(value AS DOUBLE), 0.05) AS p05,
         quantile_cont(CAST(value AS DOUBLE), 0.95) AS p95
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       min(p.p05) AS p05,
       min(p.p95) AS p95,
       CAST(count(e.value) AS BIGINT) AS n,
       CAST(sum(CAST(floor(least(greatest(CAST(e.value AS DOUBLE), p.p05),
                                 p.p95) * 1000000) AS BIGINT)) AS DOUBLE)
         / count(e.value) / 1000000 AS clipped_mean,
       CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) < p.p05 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_low,
       CAST(sum(CASE WHEN CAST(e.value AS DOUBLE) > p.p95 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_high
FROM events e JOIN p USING (event_type)
GROUP BY e.event_type
""",
    doc="winsorization: per-event-type clipping at exact interpolated "
    "p05/p95 computed by distributed rank selection (group_quantiles_exact "
    "== DuckDB quantile_cont arithmetic, the q40 equivalence) — no "
    "full-group percentile buffer anywhere (plan-gated); clip counts "
    "surfaced, clipped mean via fixed-point integer summation (floor 1e-6) "
    "for parallelism-independent bit-equality; percentile table broadcasts "
    "— the corpus shuffles only for bounded range cells and its own group "
    "aggregate",
    tags=("events", "aggregate", "quality"),
)
def q113_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    pct = group_quantiles_exact(
        ev, "event_type", "value", {"p05": 0.05, "p95": 0.95}
    )
    joined = ev.join(F.broadcast(pct), "event_type")
    clipped = F.least(F.greatest(v, F.col("p05")), F.col("p95"))
    q = F.floor(clipped * F.lit(1_000_000)).cast("bigint")
    return joined.groupBy("event_type").agg(
        F.min("p05").alias("p05"),
        F.min("p95").alias("p95"),
        F.count(v).cast("bigint").alias("n"),
        (
            F.sum(q).cast("double") / F.count(v) / F.lit(1_000_000)
        ).alias("clipped_mean"),
        F.sum((v < F.col("p05")).cast("bigint")).alias("n_clipped_low"),
        F.sum((v > F.col("p95")).cast("bigint")).alias("n_clipped_high"),
    )


# --------------------------------------------------------------------------
# q114 — the distributed exact-quantile operator surfaced directly: per-
# group interpolated quartiles + p99 by global-rank selection. The scale
# contract is the point: no task ever buffers a group (the window cells
# are range-partition slices), yet the values are quantile_cont-exact.
# --------------------------------------------------------------------------


@register(
    "q114_group_quantiles",
    oracle="""
SELECT event_type,
       quantile_cont(CAST(value AS DOUBLE), 0.25) AS p25,
       quantile_cont(CAST(value AS DOUBLE), 0.50) AS p50,
       quantile_cont(CAST(value AS DOUBLE), 0.75) AS p75,
       quantile_cont(CAST(value AS DOUBLE), 0.99) AS p99
FROM events GROUP BY event_type
""",
    doc="exact interpolated per-group quantiles via distributed rank "
    "selection (operators/quantiles.py): range cells + local row_number + "
    "broadcast offset layer; identical lo*(1-frac) + hi*frac arithmetic "
    "to DuckDB quantile_cont so the hash compare is exact — and no "
    "percentile aggregation buffer anywhere in the plan (plan-gated)",
    tags=("events", "aggregate"),
)
def q114_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return group_quantiles_exact(
        ev,
        "event_type",
        "value",
        {"p25": 0.25, "p50": 0.50, "p75": 0.75, "p99": 0.99},
    )


# --------------------------------------------------------------------------
# q129 — point-in-time SCD2 feature join: each purchase gets the click-band
# attribute version valid AT purchase time (valid_from <= ts < valid_to,
# valid_to capped by a 24h TTL so stale versions EXPIRE into coverage gaps)
# — the leakage-preventing join for training-feature generation. Single
# key shuffle via the union-and-carry as-of composition + expiry postfilter
# (operators/relational.py:scd2_pit_join); no range join.
# --------------------------------------------------------------------------

_TTL_US = 24 * 3600 * 1_000_000
_FAR_US = 1 << 62


@register(
    "q129_scd2_pit_join",
    oracle=f"""
WITH clicks AS (
  SELECT user_id, epoch_us(ts) AS vf,
         CAST(floor(value) AS BIGINT) % 4 AS band,
         row_number() OVER (PARTITION BY user_id, epoch_us(ts)
                            ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
),
versions AS (
  SELECT user_id, vf, band,
         least(coalesce(lead(vf) OVER (PARTITION BY user_id ORDER BY vf),
                        {_FAR_US}),
               vf + {_TTL_US}) AS vt
  FROM clicks WHERE rn = 1
),
purchases AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts_us,
       v.vf IS NOT NULL AS has_version,
       v.band AS band_pit
FROM purchases p
LEFT JOIN versions v
  ON p.user_id = v.user_id AND v.vf <= p.ts_us AND p.ts_us < v.vt
""",
    doc="point-in-time SCD2 feature join with 24h-TTL expiry: purchases "
    "attach the click-band version valid at purchase time or NULL in "
    "coverage gaps; union-and-carry as-of + expiry postfilter, one key "
    "shuffle, no range join (operators/relational.py:scd2_pit_join)",
    tags=("events", "join", "governance"),
)
def q129_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.relational import (
        scd2_pit_join,
    )

    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts_us").alias("vf"),
        (F.floor("value").cast("bigint") % 4).alias("band"),
        "event_id",
    )
    wl = Window.partitionBy("user_id", "vf").orderBy(F.desc("event_id"))
    lww = clicks.withColumn("rn", F.row_number().over(wl)).where(
        F.col("rn") == 1
    )
    wv = Window.partitionBy("user_id").orderBy("vf")
    versions = lww.select(
        "user_id",
        "vf",
        "band",
        F.least(
            F.coalesce(F.lead("vf").over(wv), F.lit(_FAR_US)),
            F.col("vf") + F.lit(_TTL_US),
        ).alias("vt"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    out = scd2_pit_join(
        purchases,
        versions,
        on=["user_id"],
        fact_ts="ts_us",
        valid_from="vf",
        valid_to="vt",
        attrs=["band"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "has_version",
        F.col("band_pit").alias("band_pit"),
    )


# --------------------------------------------------------------------------
# q139 — session path mining: per-user 30-min-gap sessions (q16 semantics),
# ordered event-type sequences, global top-10 3-step paths. One user-keyed
# shuffle carries sessionization AND both lead windows; the path count
# layer is vocabulary-sized (|event_type|^3 max).
# --------------------------------------------------------------------------


@register(
    "q139_session_paths",
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, ts_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
paths AS (
  SELECT event_type || '>' || lead(event_type, 1) OVER ws
           || '>' || lead(event_type, 2) OVER ws AS path,
         lead(session_id, 2) OVER ws = session_id AS complete
  FROM sess
  WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts_us, event_id)
),
counted AS (
  SELECT path, count(*) AS n FROM paths
  WHERE complete GROUP BY path
)
SELECT path, CAST(n AS BIGINT) AS n,
       CAST(row_number() OVER (ORDER BY n DESC, path ASC) AS BIGINT) AS rnk
FROM counted
QUALIFY rnk <= 10
""",
    doc="session path mining: 3-step event-type paths within 30-min-gap "
    "sessions (q16 sessionization), global top-10 by frequency — the "
    "funnel-path discovery pass; sessionize + both lead windows share ONE "
    "user-keyed shuffle, the count layer is |event_type|^3-bounded, and "
    "the final top-10 rank runs on that tiny layer",
    tags=("events", "window", "paths"),
)
def q139_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.relational import (
        sessionize,
    )

    ev = table(spark, sf_dir, "events")
    sess = sessionize(
        ev.select("user_id", "event_id", "event_type", "ts_us"),
        user_col="user_id",
        ts_col="ts_us",
        gap_seconds=GAP_US,
        order_tiebreak="event_id",
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    paths = sess.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(ws),
            F.lead("event_type", 2).over(ws),
        ).alias("path"),
        (F.lead("session_id", 2).over(ws) == F.col("session_id")).alias(
            "complete"
        ),
    )
    counted = (
        paths.where(F.col("complete"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wr = Window.orderBy(F.desc("n"), F.asc("path"))
    return (
        counted.withColumn(
            "rnk", F.row_number().over(wr).cast("bigint")
        ).where(F.col("rnk") <= 10)
    )


# --------------------------------------------------------------------------
# q140 — recency-decayed activity score in EXACT integer arithmetic:
# weight = 2^(30 - age_days) (half-life one day, floor at age >= 30 days
# contributing weight 1), so the per-user sum is an exact bigint under any
# aggregation order — transcendental exp() would differ by ulps between
# engines and break the floor-quantize convention.
# --------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "q140_recency_decay_scores",
    oracle=f"""
WITH mx AS (SELECT max(epoch_us(ts)) AS t_max FROM events),
aged AS (
  SELECT e.user_id,
         least((m.t_max - epoch_us(e.ts)) // {_DAY_US}, 30) AS age_d
  FROM events e CROSS JOIN mx m
)
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(1 AS BIGINT) << (30 - CAST(age_d AS INTEGER)))
            AS BIGINT) AS decay_score
FROM aged GROUP BY user_id
""",
    doc="recency-weighted user activity: weight 2^(30 - age_days) with a "
    "one-day half-life, ages >= 30 days clamp to weight 1 — dyadic "
    "weights are EXACT bigints, so the per-user score is "
    "order-independent and engine-identical without quantization; the "
    "global max-ts is a broadcast scalar, events never reshuffle except "
    "the one user-keyed aggregate",
    tags=("events", "feature"),
)
def q140_recency_decay_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts_us").alias("t_max"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            F.least(
                F.expr(f"(t_max - ts_us) div {_DAY_US}"), F.lit(30)
            ).cast("int").alias("age_d"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.expr("shiftleft(cast(1 as bigint), 30 - age_d)"))
            .cast("bigint")
            .alias("decay_score"),
        )
    )


# --------------------------------------------------------------------------
# q144 — hourly volume anomalies per event type, in EXACT integer algebra:
# an hour is anomalous when |n - mean| > 2*stddev over that type's hourly
# counts.  Rearranged to integers: with H hours, S = sum(n), Q = sum(n^2),
# the population condition (n - S/H)^2 > 4*(Q/H - (S/H)^2) multiplies
# through by H^2 to (n*H - S)^2 > 4*(Q*H - S^2) — no doubles, no sqrt, so
# the flag set is bit-identical across engines and aggregation orders.
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


@register(
    "q144_hourly_anomalies",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr, count(*) AS n
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS h,
         CAST(sum(n) AS BIGINT) AS s,
         CAST(sum(n * n) AS BIGINT) AS q
  FROM hourly GROUP BY 1
)
SELECT hourly.event_type,
       CAST(hr AS BIGINT) AS hr,
       CAST(n AS BIGINT) AS n,
       CASE WHEN n * h > s THEN 'hi' ELSE 'lo' END AS side
FROM hourly JOIN st USING (event_type)
WHERE (n * h - s) * (n * h - s) > 4 * (q * h - s * s)
""",
    doc="hourly volume anomaly flags (|n - mean| > 2 sigma per event "
    "type) computed entirely in integer algebra — (nH - S)^2 > 4(QH - "
    "S^2) — so detection is exact and engine-identical; the hourly "
    "layer is one groupBy, the per-type stats layer is "
    "vocabulary-sized and broadcast back, events never reshuffle twice",
    tags=("events", "anomaly", "monitoring"),
)
def q144_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.profiling import (
        hourly_anomaly_flags,
    )

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"ts_us div {_HOUR_US}").alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return hourly_anomaly_flags(hourly)


# --------------------------------------------------------------------------
# q145 — column-profile drift monitor: split the stream at the midpoint of
# its time range and compare per-type profiles (volume, distinct users,
# exact decimal value sum) between halves — the data-quality drift report
# that gates a new ingest vintage onto a 100 TB pipeline.  One pass,
# conditional aggregation (FILTER-clause style), no self-join; the drift
# ratio is exact integer permille with a -1 sentinel instead of a division
# that ANSI mode would raise on.
# --------------------------------------------------------------------------


@register(
    "q145_profile_drift",
    oracle="""
WITH b AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
),
h AS (
  SELECT event_type, user_id, value,
         CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END AS half
  FROM events, b
)
SELECT event_type,
       CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS n_first,
       CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS n_second,
       CAST(count(DISTINCT user_id) FILTER (WHERE half = 0) AS BIGINT)
         AS users_first,
       CAST(count(DISTINCT user_id) FILTER (WHERE half = 1) AS BIGINT)
         AS users_second,
       CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                       FILTER (WHERE half = 0), 0) AS DOUBLE) AS sum_first,
       CAST(coalesce(sum(CAST(value AS DECIMAL(18,2)))
                       FILTER (WHERE half = 1), 0) AS DOUBLE) AS sum_second,
       CASE WHEN count(*) FILTER (WHERE half = 0) > 0
            THEN CAST(count(*) FILTER (WHERE half = 1) * 1000
                      // (count(*) FILTER (WHERE half = 0)) AS BIGINT)
            ELSE CAST(-1 AS BIGINT) END AS vol_drift_permille
FROM h GROUP BY event_type
""",
    doc="per-type profile drift between the first and second halves of "
    "the time range: volume, distinct users, exact decimal value sums, "
    "integer-permille volume ratio (-1 sentinel for empty baselines); "
    "the midpoint is one broadcast scalar and the report is ONE "
    "conditional-aggregation pass over events — no self-join, no second "
    "shuffle",
    tags=("events", "monitoring", "drift"),
)
def q145_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.numeric import dec

    ev = table(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr("(min(ts_us) + max(ts_us)) div 2").cast("bigint").alias("mid")
    )
    h = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        "user_id",
        "value",
        F.when(F.col("ts_us") < F.col("mid"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("half"),
    )
    first = F.col("half") == 0
    second = F.col("half") == 1
    out = h.groupBy("event_type").agg(
        F.count(F.when(first, F.lit(1))).cast("bigint").alias("n_first"),
        F.count(F.when(second, F.lit(1))).cast("bigint").alias("n_second"),
        F.countDistinct(F.when(first, F.col("user_id")))
        .cast("bigint")
        .alias("users_first"),
        F.countDistinct(F.when(second, F.col("user_id")))
        .cast("bigint")
        .alias("users_second"),
        F.coalesce(F.sum(F.when(first, dec("value", 18, 2))), F.lit(0))
        .cast("double")
        .alias("sum_first"),
        F.coalesce(F.sum(F.when(second, dec("value", 18, 2))), F.lit(0))
        .cast("double")
        .alias("sum_second"),
    )
    return out.withColumn(
        "vol_drift_permille",
        F.when(
            F.col("n_first") > 0,
            F.expr("n_second * 1000 div n_first"),
        )
        .otherwise(F.lit(-1))
        .cast("bigint"),
    )


# --------------------------------------------------------------------------
# q151 — multi-touch LINEAR attribution in exact integer millis: each
# purchase distributes 1000 credit millis equally over the view/click
# touches earlier in its session (1000 div n each, remainder to the
# EARLIEST touch so every purchase's credit sums to exactly 1000);
# touchless purchases credit a 'direct' bucket.  The upgrade over q45's
# last-touch interval join: per-session pair generation is an equi-join
# on (user, session) — quadratic only within a session, like q125 within
# a basket — and all credit arithmetic is integer, so the report is
# engine-exact with conservation auditable (sum = 1000 * n_purchases).
# --------------------------------------------------------------------------


@register(
    "q151_linear_attribution",
    oracle=f"""
WITH marked AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, event_type, ts_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
),
p AS (
  SELECT user_id, session_id, event_id AS p_id, ts_us AS p_ts
  FROM sess WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, session_id, event_id AS t_id, ts_us AS t_ts, event_type
  FROM sess WHERE event_type IN ('view', 'click')
),
pairs AS (
  SELECT p.p_id, t.event_type, t.t_ts, t.t_id,
         count(*) OVER (PARTITION BY p.p_id) AS n,
         row_number() OVER (PARTITION BY p.p_id
                            ORDER BY t.t_ts ASC, t.t_id ASC) AS rn
  FROM p JOIN t ON p.user_id = t.user_id
               AND p.session_id = t.session_id
               AND (t.t_ts < p.p_ts OR (t.t_ts = p.p_ts AND t.t_id < p.p_id))
),
credited AS (
  SELECT event_type, p_id,
         1000 // n + CASE WHEN rn = 1 THEN 1000 % n ELSE 0 END AS credit
  FROM pairs
),
touched AS (
  SELECT event_type AS touch_type,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases,
         CAST(sum(credit) AS BIGINT) AS credit_millis
  FROM credited GROUP BY event_type
),
direct AS (
  SELECT 'direct' AS touch_type,
         CAST(0 AS BIGINT) AS n_pairs,
         CAST(count(*) AS BIGINT) AS n_purchases,
         CAST(count(*) * 1000 AS BIGINT) AS credit_millis
  FROM p LEFT JOIN (SELECT DISTINCT p_id FROM pairs) x ON x.p_id = p.p_id
  WHERE x.p_id IS NULL
)
SELECT * FROM touched UNION ALL SELECT * FROM direct
""",
    doc="multi-touch linear attribution: each purchase splits 1000 credit "
    "millis equally over its session's earlier view/click touches "
    "(integer div, remainder to the earliest touch — conservation holds "
    "exactly: total credit = 1000 * n_purchases), touchless purchases "
    "fall into a 'direct' bucket; pair generation is an equi-join on "
    "(user, session), quadratic only within a session",
    tags=("events", "attribution", "window"),
)
def q151_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.relational import (
        sessionize,
    )

    ev = table(spark, sf_dir, "events")
    sess = sessionize(
        ev.select("user_id", "event_id", "event_type", "ts_us"),
        user_col="user_id",
        ts_col="ts_us",
        gap_seconds=GAP_US,
        order_tiebreak="event_id",
    )
    p = sess.where(F.col("event_type") == "purchase").select(
        "user_id",
        "session_id",
        F.col("event_id").alias("p_id"),
        F.col("ts_us").alias("p_ts"),
    )
    t = sess.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "session_id",
        F.col("event_id").alias("t_id"),
        F.col("ts_us").alias("t_ts"),
        "event_type",
    )
    pairs = p.join(t, ["user_id", "session_id"]).where(
        (F.col("t_ts") < F.col("p_ts"))
        | ((F.col("t_ts") == F.col("p_ts")) & (F.col("t_id") < F.col("p_id")))
    )
    wp = Window.partitionBy("p_id")
    wr = Window.partitionBy("p_id").orderBy(
        F.asc("t_ts"), F.asc("t_id")
    )
    credited = pairs.select(
        "event_type",
        "p_id",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wr).alias("rn"),
    ).select(
        "event_type",
        "p_id",
        (
            F.expr("1000 div n")
            + F.when(F.col("rn") == 1, F.expr("1000 % n")).otherwise(F.lit(0))
        ).alias("credit"),
    )
    touched = credited.groupBy(F.col("event_type").alias("touch_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("p_id").cast("bigint").alias("n_purchases"),
        F.sum("credit").cast("bigint").alias("credit_millis"),
    )
    direct = (
        p.join(pairs.select("p_id").distinct(), "p_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
        .select(
            F.lit("direct").alias("touch_type"),
            F.lit(0).cast("bigint").alias("n_pairs"),
            "n_purchases",
            (F.col("n_purchases") * F.lit(1000))
            .cast("bigint")
            .alias("credit_millis"),
        )
    )
    return touched.unionByName(direct)


# --------------------------------------------------------------------------
# q154 — inter-arrival time quantiles per event type: the lag-delta stream
# (seconds between consecutive same-type events of the same user) pushed
# through the distributed exact-quantile selector — P50/P95/P99
# inter-arrival is the time-series capacity/burstiness staple, here
# quantile_cont-exact without any per-group value buffering (q114's
# two-pass rank-selection machinery on a derived column).
# --------------------------------------------------------------------------


@register(
    "q154_interarrival_quantiles",
    oracle="""
WITH d AS (
  SELECT event_type,
         CAST(epoch_us(ts) - lag(epoch_us(ts))
                OVER (PARTITION BY user_id, event_type
                      ORDER BY epoch_us(ts), event_id)
              AS DOUBLE) / 1000000.0 AS gap_s
  FROM events
)
SELECT event_type,
       quantile_cont(gap_s, 0.50) AS p50_s,
       quantile_cont(gap_s, 0.95) AS p95_s,
       quantile_cont(gap_s, 0.99) AS p99_s
FROM d WHERE gap_s IS NOT NULL
GROUP BY event_type
""",
    doc="per-type inter-arrival quantiles (seconds between consecutive "
    "same-user same-type events): one user-keyed lag window derives the "
    "gaps, then the distributed exact-quantile selector (q114 machinery) "
    "returns quantile_cont-identical P50/P95/P99 without buffering any "
    "group — burstiness/capacity profiling at event-stream scale",
    tags=("events", "window", "quantiles"),
)
def q154_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    gaps = ev.select(
        "event_type",
        (
            (F.col("ts_us") - F.lag("ts_us").over(w)).cast("double")
            / F.lit(1_000_000.0)
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return group_quantiles_exact(
        gaps,
        "event_type",
        "gap_s",
        {"p50_s": 0.50, "p95_s": 0.95, "p99_s": 0.99},
    )


# --------------------------------------------------------------------------
# q156 — calendar-spine gap fill: the dense hourly spine per event type
# (every hour between the type's first and last event), left-joined with
# observed hourly counts so missing hours surface as explicit zeros, plus
# a per-type continuity summary.  The resampling primitive every
# time-series rollup needs before windowed math is trustworthy: a naive
# groupBy silently skips empty buckets, which corrupts moving averages
# and anomaly baselines downstream.
# --------------------------------------------------------------------------


@register(
    "q156_hourly_gap_fill",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr, count(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1
),
spine AS (
  SELECT event_type, CAST(h AS BIGINT) AS hr
  FROM bounds, LATERAL unnest(generate_series(h0, h1)) t(h)
),
filled AS (
  SELECT s.event_type, s.hr, coalesce(hourly.n, 0) AS n
  FROM spine s LEFT JOIN hourly
    ON hourly.event_type = s.event_type AND hourly.hr = s.hr
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       CAST(count(*) FILTER (WHERE n = 0) AS BIGINT) AS n_gap_hours,
       CAST(max(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS has_gaps,
       CAST(sum(n) AS BIGINT) AS n_events
FROM filled GROUP BY event_type
""",
    doc="calendar-spine gap fill per event type: the dense hourly spine "
    "between each type's first and last hour (sequence+explode, bounded "
    "by the time range, never a cross join) left-joins observed counts so "
    "empty buckets surface as zeros; the continuity summary (hours, gap "
    "hours, totals) is the audit that keeps moving averages and anomaly "
    "baselines honest",
    tags=("events", "window", "resample"),
)
def q156_hourly_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type", F.expr(f"ts_us div {_HOUR_US}").alias("hr")
        )
        .groupBy("event_type", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"),
    ).select("event_type", F.col("hr").cast("bigint").alias("hr"))
    filled = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce("n", F.lit(0)).alias("n")
    )
    return filled.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.count(F.when(F.col("n") == 0, F.lit(1)))
        .cast("bigint")
        .alias("n_gap_hours"),
        F.max(F.when(F.col("n") == 0, F.lit(1)).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("has_gaps"),
        F.sum("n").cast("bigint").alias("n_events"),
    )


# --------------------------------------------------------------------------
# q157 — LOCF imputation over the dense spine: the q156 gap-filled hourly
# value series with empty hours imputed by last-observation-carried-
# forward (exact decimal sums, so the imputed series is engine-identical);
# leading gaps (before the first observation) stay NULL and are counted.
# The resample-then-fill primitive feature pipelines need before lag/
# rolling features are well-defined.
# --------------------------------------------------------------------------


@register(
    "q157_locf_imputation",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1
),
spine AS (
  SELECT event_type, CAST(h AS BIGINT) AS hr
  FROM bounds, LATERAL unnest(generate_series(h0, h1)) t(h)
),
filled AS (
  SELECT s.event_type, s.hr, hourly.v,
         hourly.v IS NULL AS was_gap
  FROM spine s LEFT JOIN hourly
    ON hourly.event_type = s.event_type AND hourly.hr = s.hr
)
SELECT event_type, hr,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hr
         ROWS UNBOUNDED PRECEDING) AS v_locf,
       was_gap
FROM filled
""",
    doc="LOCF imputation on the dense hourly spine: per-type hourly value "
    "sums (exact decimal) on the q156 calendar spine, empty hours take "
    "the last observed value via an ignore-nulls running window — one "
    "type-keyed shuffle covers spine join and fill; was_gap keeps "
    "imputed rows auditable",
    tags=("events", "window", "resample"),
)
def q157_locf_imputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.numeric import money_sum

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"ts_us div {_HOUR_US}").alias("hr"),
            "value",
        )
        .groupBy("event_type", "hr")
        .agg(money_sum("value", "v"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"),
    ).select("event_type", F.col("hr").cast("bigint").alias("hr"))
    filled = spine.join(hourly, ["event_type", "hr"], "left").select(
        "event_type", "hr", "v", F.col("v").isNull().alias("was_gap")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        "event_type",
        "hr",
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        "was_gap",
    )


# --------------------------------------------------------------------------
# q158 — value-concentration (Lorenz/Pareto) deciles WITHOUT a global
# sort: per-user exact cent totals shard by fixed VALUE RANGES (all of
# shard k's values >= all of shard k+1's), each shard ranks and
# cumulates locally, and a ~20-row shard-summary layer provides count
# and value offsets (the q126 offset trick, here value-ordered).  The
# row whose global rank hits each decile boundary reports the cumulative
# value share in exact integer permille — "the top 10% of users carry
# X% of value" at any scale, one user-keyed aggregate + one shard-local
# window + one broadcast offset join.
# --------------------------------------------------------------------------

_LORENZ_W = 500  # value-range shard width in cents


@register(
    "q158_value_concentration",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS vc
  FROM events GROUP BY user_id
),
sharded AS (SELECT user_id, vc, -(vc // {_LORENZ_W}) AS shard FROM u),
local AS (
  SELECT user_id, vc, shard,
         row_number() OVER (PARTITION BY shard
                            ORDER BY vc DESC, user_id ASC) AS rn_local,
         sum(vc) OVER (PARTITION BY shard
                       ORDER BY vc DESC, user_id ASC
                       ROWS UNBOUNDED PRECEDING) AS cum_local
  FROM sharded
),
sizes AS (SELECT shard, count(*) AS n, sum(vc) AS s FROM sharded GROUP BY 1),
offsets AS (
  SELECT shard,
         sum(n) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) - n AS off_n,
         sum(s) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING) - s AS off_s
  FROM sizes
),
tot AS (SELECT sum(n) AS n_total, CAST(sum(s) AS BIGINT) AS total_cents
        FROM sizes),
ranked AS (
  SELECT l.user_id, o.off_n + l.rn_local AS rn,
         CAST(o.off_s + l.cum_local AS BIGINT) AS cum_cents
  FROM local l JOIN offsets o USING (shard)
),
bounds AS (
  SELECT CAST(k AS BIGINT) AS decile,
         (n_total * k + 9) // 10 AS brank, n_total, total_cents
  FROM tot, LATERAL unnest(generate_series(1, 10)) t(k)
)
SELECT b.decile,
       CAST(b.brank AS BIGINT) AS n_users_cum,
       r.cum_cents,
       CAST(r.cum_cents * 1000 // b.total_cents AS BIGINT)
         AS share_permille
FROM bounds b JOIN ranked r ON r.rn = b.brank
""",
    doc="Lorenz/Pareto value-concentration deciles without a global sort: "
    "fixed value-range shards keep global descending order as (shard, "
    "local rank); a ~20-row shard-summary layer broadcasts count+value "
    "offsets; decile boundary rows report cumulative share in exact "
    "integer permille — concentration analytics at 100 TB with one "
    "user aggregate, one shard-local window, no single-partition pass "
    "over users",
    tags=("events", "analytics", "scale"),
)
def q158_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.numeric import dec

    ev = table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id")
        .agg(
            (F.sum(dec("value", 18, 2)) * F.lit(100))
            .cast("bigint")
            .alias("vc")
        )
        .withColumn("shard", -F.expr(f"vc div {_LORENZ_W}"))
    )
    wl = Window.partitionBy("shard").orderBy(
        F.desc("vc"), F.asc("user_id")
    )
    local = u.select(
        "user_id",
        "vc",
        "shard",
        F.row_number().over(wl).alias("rn_local"),
        F.sum("vc")
        .over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_local"),
    )
    sizes = u.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.sum("vc").alias("s")
    )
    wo = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = sizes.select(
        "shard",
        (F.sum("n").over(wo) - F.col("n")).alias("off_n"),
        (F.sum("s").over(wo) - F.col("s")).alias("off_s"),
    )
    tot = sizes.agg(
        F.sum("n").alias("n_total"),
        F.sum("s").cast("bigint").alias("total_cents"),
    )
    ranked = local.join(F.broadcast(offsets), "shard").select(
        "user_id",
        (F.col("off_n") + F.col("rn_local")).alias("rn"),
        (F.col("off_s") + F.col("cum_local")).cast("bigint").alias(
            "cum_cents"
        ),
    )
    bounds = (
        tot.select(
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("k"),
            "n_total",
            "total_cents",
        )
        .select(
            F.col("k").cast("bigint").alias("decile"),
            F.expr("(n_total * k + 9) div 10").alias("brank"),
            "total_cents",
        )
    )
    return ranked.join(F.broadcast(bounds), ranked.rn == bounds.brank).select(
        "decile",
        F.col("brank").cast("bigint").alias("n_users_cum"),
        "cum_cents",
        F.expr("cum_cents * 1000 div total_cents")
        .cast("bigint")
        .alias("share_permille"),
    )


# --------------------------------------------------------------------------
# q159 — time-to-convert quantiles: per user, the delay from FIRST view to
# the first purchase AT OR AFTER it; the global P50/P90/P99 comes from the
# distributed exact-quantile selector running on ONE group — which is
# precisely what the q114 machinery is for: rank selection over range
# cells, no single aggregation buffer ever holds the population.
# --------------------------------------------------------------------------


@register(
    "q159_time_to_convert",
    oracle="""
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT v.user_id,
         min(epoch_us(e.ts)) AS first_purchase
  FROM v JOIN events e
    ON e.user_id = v.user_id
   AND e.event_type = 'purchase'
   AND epoch_us(e.ts) >= v.first_view
  GROUP BY v.user_id
),
d AS (
  SELECT 'all' AS grp,
         CAST(p.first_purchase - v.first_view AS DOUBLE) / 1000000.0
           AS delay_s
  FROM v JOIN p USING (user_id)
)
SELECT grp,
       CAST(count(*) AS BIGINT) AS n_converted,
       quantile_cont(delay_s, 0.50) AS p50_s,
       quantile_cont(delay_s, 0.90) AS p90_s,
       quantile_cont(delay_s, 0.99) AS p99_s
FROM d GROUP BY grp
""",
    doc="time-to-convert distribution: per-user delay from first view to "
    "the first purchase at-or-after it, reduced to exact "
    "quantile_cont-identical P50/P90/P99 by the distributed rank "
    "selector over a SINGLE group — the q114 machinery's reason to "
    "exist: population-scale quantiles with no per-group buffering; "
    "conversion joins stay user-keyed equi-joins",
    tags=("events", "funnel", "quantiles"),
)
def q159_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_view"))
    )
    p = (
        v.join(
            ev.where(F.col("event_type") == "purchase").select(
                "user_id", "ts_us"
            ),
            "user_id",
        )
        .where(F.col("ts_us") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("first_purchase"))
    )
    d = v.join(p, "user_id").select(
        F.lit("all").alias("grp"),
        (
            (F.col("first_purchase") - F.col("first_view")).cast("double")
            / F.lit(1_000_000.0)
        ).alias("delay_s"),
    )
    n = d.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted")
    )
    q = group_quantiles_exact(
        d, "grp", "delay_s", {"p50_s": 0.50, "p90_s": 0.90, "p99_s": 0.99}
    )
    return n.join(q, "grp").select(
        "grp", "n_converted", "p50_s", "p90_s", "p99_s"
    )


# --------------------------------------------------------------------------
# q160 — EXACT linear interpolation on the dense spine: gap hours take
# ``vp + (vn - vp) * (h - hp) div (hn - hp)`` in integer CENTS between
# the previous (hp, vp) and next (hn, vn) observations — flooring
# division makes the imputed series bit-identical across engines, unlike
# float lerp.  Leading/trailing gaps (no neighbor on one side) stay NULL
# with method 'none'; observed hours pass through as 'obs'.
# --------------------------------------------------------------------------


@register(
    "q160_linear_interpolation",
    oracle=f"""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS hr,
         CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS vc
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, min(hr) AS h0, max(hr) AS h1 FROM hourly GROUP BY 1
),
spine AS (
  SELECT event_type, CAST(h AS BIGINT) AS hr
  FROM bounds, LATERAL unnest(generate_series(h0, h1)) t(h)
),
filled AS (
  SELECT s.event_type, s.hr, hourly.vc
  FROM spine s LEFT JOIN hourly
    ON hourly.event_type = s.event_type AND hourly.hr = s.hr
),
ctx AS (
  SELECT event_type, hr, vc,
         last_value(vc IGNORE NULLS) OVER wb AS vp,
         last_value(CASE WHEN vc IS NOT NULL THEN hr END IGNORE NULLS)
           OVER wb AS hp,
         first_value(vc IGNORE NULLS) OVER wf AS vn,
         first_value(CASE WHEN vc IS NOT NULL THEN hr END IGNORE NULLS)
           OVER wf AS hn
  FROM filled
  WINDOW wb AS (PARTITION BY event_type ORDER BY hr
                ROWS UNBOUNDED PRECEDING),
         wf AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, hr,
       CASE WHEN vc IS NOT NULL THEN vc
            WHEN vp IS NOT NULL AND vn IS NOT NULL
            THEN vp + (vn - vp) * (hr - hp) // (hn - hp)
            ELSE NULL END AS vc_filled,
       CASE WHEN vc IS NOT NULL THEN 'obs'
            WHEN vp IS NOT NULL AND vn IS NOT NULL THEN 'interp'
            ELSE 'none' END AS method
FROM ctx
""",
    doc="exact integer linear interpolation on the dense hourly spine: "
    "gap hours take vp + (vn-vp)*(h-hp) div (hn-hp) in cents between "
    "the LOCF and NOCB neighbors — flooring integer lerp is "
    "engine-identical where float lerp differs by ulps; both neighbor "
    "windows share the one type-keyed shuffle, edges stay NULL and "
    "labeled",
    tags=("events", "window", "resample"),
)
def q160_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.numeric import dec

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type",
            F.expr(f"ts_us div {_HOUR_US}").alias("hr"),
            "value",
        )
        .groupBy("event_type", "hr")
        .agg(
            (F.sum(dec("value", 18, 2)) * F.lit(100))
            .cast("bigint")
            .alias("vc")
        )
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hr").alias("h0"), F.max("hr").alias("h1")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"),
    ).select("event_type", F.col("hr").cast("bigint").alias("hr"))
    filled = spine.join(hourly, ["event_type", "hr"], "left")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("vc").isNotNull(), F.col("hr"))
    ctx = filled.select(
        "event_type",
        "hr",
        "vc",
        F.last("vc", ignorenulls=True).over(wb).alias("vp"),
        F.last(obs_hr, ignorenulls=True).over(wb).alias("hp"),
        F.first("vc", ignorenulls=True).over(wf).alias("vn"),
        F.first(obs_hr, ignorenulls=True).over(wf).alias("hn"),
    )
    return ctx.select(
        "event_type",
        "hr",
        F.when(F.col("vc").isNotNull(), F.col("vc"))
        .when(
            F.col("vp").isNotNull() & F.col("vn").isNotNull(),
            # Both engines TRUNCATE toward zero on integer division
            # (Spark `div`, DuckDB `//` — verified -7//2 = -3), so the
            # lerp is bit-identical on declining segments too.
            F.expr("vp + (vn - vp) * (hr - hp) div (hn - hp)"),
        )
        .otherwise(F.lit(None))
        .cast("bigint")
        .alias("vc_filled"),
        F.when(F.col("vc").isNotNull(), F.lit("obs"))
        .when(
            F.col("vp").isNotNull() & F.col("vn").isNotNull(),
            F.lit("interp"),
        )
        .otherwise(F.lit("none"))
        .alias("method"),
    )


# --------------------------------------------------------------------------
# q161 — equi-depth feature binning: per-type exact quartile thresholds
# (q114 machinery) broadcast back onto the stream; every event lands in a
# bucket 0-3 by strict-greater comparison against p25/p50/p75, and the
# per-bucket occupancy audit shows the near-n/4 balance equi-depth
# promises.  The categorical-feature transform a training pipeline runs
# before crossing/hashing — thresholds computed distributively, applied
# as a vocabulary-sized broadcast, the corpus never reshuffles for it.
# --------------------------------------------------------------------------


@register(
    "q161_equidepth_binning",
    oracle="""
WITH th AS (
  SELECT event_type,
         quantile_cont(CAST(value AS DOUBLE), 0.25) AS p25,
         quantile_cont(CAST(value AS DOUBLE), 0.50) AS p50,
         quantile_cont(CAST(value AS DOUBLE), 0.75) AS p75
  FROM events GROUP BY event_type
),
b AS (
  SELECT e.event_type,
         (CASE WHEN CAST(e.value AS DOUBLE) > th.p25 THEN 1 ELSE 0 END
        + CASE WHEN CAST(e.value AS DOUBLE) > th.p50 THEN 1 ELSE 0 END
        + CASE WHEN CAST(e.value AS DOUBLE) > th.p75 THEN 1 ELSE 0 END)
           AS bucket,
         CAST(e.value AS DOUBLE) AS v
  FROM events e JOIN th USING (event_type)
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       min(v) AS v_min, max(v) AS v_max
FROM b GROUP BY event_type, bucket
""",
    doc="equi-depth quartile binning per event type: exact distributed "
    "thresholds (q114 rank selection, no group buffering) broadcast back "
    "as a vocabulary-sized table; bucket = strict-greater count against "
    "p25/p50/p75, per-bucket occupancy + value ranges audit the ~n/4 "
    "balance — the pre-hash feature transform at stream scale",
    tags=("events", "feature", "quantiles"),
)
def q161_equidepth_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    th = group_quantiles_exact(
        ev, "event_type", "v", {"p25": 0.25, "p50": 0.50, "p75": 0.75}
    )
    b = ev.join(F.broadcast(th), "event_type").select(
        "event_type",
        (
            (F.col("v") > F.col("p25")).cast("int")
            + (F.col("v") > F.col("p50")).cast("int")
            + (F.col("v") > F.col("p75")).cast("int")
        )
        .cast("bigint")
        .alias("bucket"),
        "v",
    )
    return b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )


# --------------------------------------------------------------------------
# q162 — ingest freshness / staleness SLA audit: per event type, the lag
# between its newest event and the stream's global high-water mark, with
# integer-minute lag buckets and an SLA verdict (stale if > 24h behind).
# The monitoring row every scheduled 100 TB ingest publishes: one
# vocabulary-sized aggregate, one broadcast scalar, exact integers.
# --------------------------------------------------------------------------


@register(
    "q162_freshness_sla",
    oracle=f"""
WITH hw AS (SELECT max(epoch_us(ts)) AS hwm FROM events),
t AS (
  SELECT event_type,
         max(epoch_us(ts)) AS newest,
         count(*) AS n
  FROM events GROUP BY event_type
)
SELECT t.event_type,
       CAST(t.n AS BIGINT) AS n_events,
       CAST((hw.hwm - t.newest) // 60000000 AS BIGINT) AS lag_minutes,
       (hw.hwm - t.newest) > 86400000000 AS stale
FROM t, hw
""",
    doc="ingest freshness SLA: per-type lag behind the global high-water "
    "mark in exact integer minutes plus a 24h staleness verdict — one "
    "type-keyed aggregate and one broadcast scalar; the scheduled-ingest "
    "monitoring row",
    tags=("events", "monitoring"),
)
def q162_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hw = ev.agg(F.max("ts_us").alias("hwm"))
    t = ev.groupBy("event_type").agg(
        F.max("ts_us").alias("newest"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return t.crossJoin(F.broadcast(hw)).select(
        "event_type",
        "n_events",
        F.expr("(hwm - newest) div 60000000").cast("bigint").alias(
            "lag_minutes"
        ),
        (F.col("hwm") - F.col("newest") > F.lit(86_400_000_000)).alias(
            "stale"
        ),
    )


# --------------------------------------------------------------------------
# q163 — robust outlier detection via median/MAD, both through the
# distributed exact-quantile selector (operators/quantiles.py): median in
# pass one, median absolute deviation in pass two, then a broadcast-back
# 3-MAD fence.  The robust twin of q78's mean-based anomaly flag — immune
# to the very outliers it hunts, and no executor ever buffers a group
# (event_type has ~5 distinct values; F.percentile would OOM at 100x).
# --------------------------------------------------------------------------


@register(
    "q163_mad_outliers",
    oracle="""
WITH med AS (
  SELECT event_type,
         quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type,
         CAST(e.value AS DOUBLE) AS v,
         med.med,
         abs(CAST(e.value AS DOUBLE) - med.med) AS d
  FROM events e JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(d, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       any_value(dev.med) AS med,
       any_value(mad.mad) AS mad,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad THEN 1 ELSE 0 END)
            * 1000 // count(*) AS BIGINT) AS outlier_permille
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
""",
    doc="robust per-type outliers: exact median and exact MAD through the "
    "rank-selection quantile machinery (two bounded passes, zero group "
    "buffering), 3-MAD fence applied via a vocabulary-sized broadcast — "
    "the outlier filter that is not skewed by its own targets",
    tags=("events", "quality", "quantiles"),
)
def q163_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("v")
    )
    med = group_quantiles_exact(ev, "event_type", "v", {"med": 0.5})
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("v") - F.col("med"))
    )
    mad = group_quantiles_exact(dev, "event_type", "d", {"mad": 0.5})
    flagged = dev.join(F.broadcast(mad), "event_type")
    return flagged.groupBy("event_type").agg(
        F.min("med").alias("med"),
        F.min("mad").alias("mad"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            (F.col("d") > F.lit(3.0) * F.col("mad")).cast("bigint")
        )
        .cast("bigint")
        .alias("n_outliers"),
        F.expr(
            "sum(cast(d > 3.0 * mad as bigint)) * 1000 div count(*)"
        )
        .cast("bigint")
        .alias("outlier_permille"),
    )


# --------------------------------------------------------------------------
# q167 — incident impact via a bucketed interval-overlap join: error-storm
# incidents (consecutive hours whose error count exceeds 1.5x the mean
# hourly rate, merged into intervals) overlap-joined against user session
# intervals to report, per incident, how many sessions it touched and the
# total overlapped session time.  The range-predicate join is decomposed
# into hour buckets (operators/intervals.py) — equi-join on the bucket id,
# never a nested loop — so BOTH sides can be corpus-sized; here the
# incident side is additionally tiny and broadcast.
# --------------------------------------------------------------------------


@register(
    "q167_incident_session_overlap",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
),
hourly AS (
  SELECT ts_us // 3600000000 AS hr,
         count(*) FILTER (WHERE event_type = 'error') AS ne
  FROM ev GROUP BY 1
),
tot AS (SELECT count(*) AS nh, sum(ne) AS se FROM hourly),
hot AS (
  SELECT hr FROM hourly CROSS JOIN tot WHERE 2 * ne * nh > 3 * se
),
isl AS (
  SELECT hr, hr - row_number() OVER (ORDER BY hr) AS grp FROM hot
),
inc AS (
  SELECT min(hr) * 3600000000 AS i_start,
         (max(hr) + 1) * 3600000000 - 1 AS i_end,
         count(*) AS n_hours
  FROM isl GROUP BY grp
),
marked AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
                OR ts_us - lag(ts_us) OVER w > {GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
  SELECT user_id, ts_us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS session_id
  FROM marked
),
sess AS (
  SELECT user_id, session_id,
         min(ts_us) AS s_start, max(ts_us) AS s_end
  FROM sessions GROUP BY 1, 2
),
hits AS (
  SELECT i.i_start, i.i_end, i.n_hours,
         least(s.s_end, i.i_end) - greatest(s.s_start, i.i_start)
           AS overlap_us
  FROM inc i JOIN sess s
    ON s.s_start <= i.i_end AND i.i_start <= s.s_end
)
SELECT i.i_start AS incident_start_us,
       i.i_end AS incident_end_us,
       CAST(i.n_hours AS BIGINT) AS incident_hours,
       CAST(count(h.overlap_us) AS BIGINT) AS n_sessions,
       CAST(coalesce(sum(h.overlap_us), 0) AS BIGINT)
         AS total_overlap_us
FROM inc i
LEFT JOIN hits h
  ON h.i_start = i.i_start AND h.i_end = i.i_end
GROUP BY 1, 2, 3
""",
    doc="error-storm incident impact: hot hours (exact integer 1.5x-mean "
    "test, no division) merge into incident intervals; a bucketed "
    "interval-overlap join (hour-bucket explode + equi-join, "
    "operators/intervals.py) attaches overlapping 30-min-gap sessions — "
    "per incident, sessions touched and exact overlapped microseconds; "
    "the range x range join that stays linear when both sides are huge",
    tags=("events", "intervals", "join"),
)
def q167_incident_session_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    hour_us = 3_600_000_000
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us", "event_type"
    )
    hourly = ev.groupBy(
        F.expr(f"ts_us div {hour_us}").alias("hr")
    ).agg(
        F.sum((F.col("event_type") == "error").cast("bigint")).alias("ne")
    )
    tot = hourly.agg(
        F.count(F.lit(1)).alias("nh"), F.sum("ne").alias("se")
    )
    hot = (
        hourly.crossJoin(F.broadcast(tot))
        .where(F.lit(2) * F.col("ne") * F.col("nh") > F.lit(3) * F.col("se"))
        .select("hr")
    )
    # Hot-hour islands: the hot table is vocabulary-sized (one row per hot
    # HOUR of wall-clock time), so the single-partition window is bounded.
    isl = hot.withColumn(
        "grp", F.col("hr") - F.row_number().over(Window.orderBy("hr"))
    )
    inc = isl.groupBy("grp").agg(
        (F.min("hr") * hour_us).alias("i_start"),
        ((F.max("hr") + 1) * hour_us - 1).alias("i_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    ).drop("grp")

    sess = (
        sessionize(
            ev.select("user_id", "ts_us", "event_id"),
            user_col="user_id",
            ts_col="ts_us",
            gap_seconds=GAP_US,
            order_tiebreak="event_id",
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts_us").alias("s_start"), F.max("ts_us").alias("s_end")
        )
    )

    from cassandra_analytics_example_spark.operators.intervals import (
        bucketed_interval_join,
    )

    hits = bucketed_interval_join(
        sess,
        inc,
        l_start="s_start",
        l_end="s_end",
        r_start="i_start",
        r_end="i_end",
        bucket_us=hour_us,
        broadcast_right=True,
    )
    agg = hits.groupBy("i_start", "i_end", "n_hours").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum("overlap_us").cast("bigint").alias("total_overlap_us"),
    )
    return (
        inc.join(agg, ["i_start", "i_end", "n_hours"], "left")
        .select(
            F.col("i_start").alias("incident_start_us"),
            F.col("i_end").alias("incident_end_us"),
            F.col("n_hours").alias("incident_hours"),
            F.coalesce(F.col("n_sessions"), F.lit(0))
            .cast("bigint")
            .alias("n_sessions"),
            F.coalesce(F.col("total_overlap_us"), F.lit(0))
            .cast("bigint")
            .alias("total_overlap_us"),
        )
    )


# --------------------------------------------------------------------------
# q168 — mergeable equi-width histogram sketch with an exact bracketing
# audit: shard-local 256-bin histograms (counts only — mergeable by bin
# addition, the way a 1000-executor cluster summarises a column without
# moving it) merge into one table, and each target quantile is bracketed
# by the bins holding its boundary order statistics.  The audit joins the
# distributed EXACT quantile (rank selector, q114 machinery) and gates
# est_lo <= exact <= est_hi — a hard invariant of a correct histogram,
# checked end-to-end.  Sketch state: 256 rows regardless of corpus size.
# --------------------------------------------------------------------------


@register(
    "q168_histogram_quantile_sketch",
    oracle="""
WITH d AS (
  SELECT CAST(value AS DOUBLE) AS v FROM events
  WHERE value IS NOT NULL
),
mm AS (SELECT min(v) AS mn, max(v) AS mx, count(*) AS n FROM d),
binned AS (
  SELECT CASE WHEN mm.mx = mm.mn THEN 0
              ELSE least(CAST(floor((d.v - mm.mn) * 256.0
                                    / (mm.mx - mm.mn)) AS BIGINT), 255)
         END AS bin
  FROM d CROSS JOIN mm
),
bins AS (SELECT bin, count(*) AS c FROM binned GROUP BY bin),
cum AS (
  SELECT bin, sum(c) OVER (ORDER BY bin
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS cum
  FROM bins
),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.5), (0.9), (0.99)) t(q)),
k AS (
  SELECT qs.q,
         CAST(floor(qs.q * (mm.n - 1)) + 1 AS BIGINT) AS k_lo,
         CAST(floor(qs.q * (mm.n - 1)) + 1
              + CASE WHEN qs.q * (mm.n - 1)
                          > floor(qs.q * (mm.n - 1))
                     THEN 1 ELSE 0 END AS BIGINT) AS k_hi,
         mm.mn, mm.mx, mm.n
  FROM qs CROSS JOIN mm
),
sel AS (
  SELECT k.q, k.mn, k.mx, k.n,
         min(CASE WHEN cum.cum >= k.k_lo THEN cum.bin END) AS b_lo,
         min(CASE WHEN cum.cum >= k.k_hi THEN cum.bin END) AS b_hi
  FROM k CROSS JOIN cum
  GROUP BY k.q, k.mn, k.mx, k.n
),
ex AS (
  SELECT quantile_cont(v, 0.5) AS p50,
         quantile_cont(v, 0.9) AS p90,
         quantile_cont(v, 0.99) AS p99
  FROM d
)
SELECT sel.q,
       CAST(sel.n AS BIGINT) AS n,
       CAST(sel.b_lo AS BIGINT) AS bin_lo,
       CAST(sel.b_hi AS BIGINT) AS bin_hi,
       sel.mn + sel.b_lo * (sel.mx - sel.mn) / 256.0 AS est_lo,
       sel.mn + (sel.b_hi + 1) * (sel.mx - sel.mn) / 256.0 AS est_hi,
       CASE sel.q WHEN 0.5 THEN ex.p50
                  WHEN 0.9 THEN ex.p90
                  ELSE ex.p99 END AS exact,
       (sel.mn + sel.b_lo * (sel.mx - sel.mn) / 256.0
          <= CASE sel.q WHEN 0.5 THEN ex.p50
                        WHEN 0.9 THEN ex.p90
                        ELSE ex.p99 END)
       AND (CASE sel.q WHEN 0.5 THEN ex.p50
                       WHEN 0.9 THEN ex.p90
                       ELSE ex.p99 END
          <= sel.mn + (sel.b_hi + 1) * (sel.mx - sel.mn) / 256.0)
         AS ok
FROM sel CROSS JOIN ex
""",
    doc="mergeable 256-bin histogram sketch: shard-local counts merged by "
    "bin addition, target quantiles bracketed by boundary-rank bins, and "
    "a hard invariant gate est_lo <= exact <= est_hi against the "
    "distributed exact rank selector — the constant-state column summary "
    "a fleet of executors ships to the driver",
    tags=("events", "sketch", "quantiles"),
)
def q168_histogram_quantile_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nb = 256
    d = (
        table(spark, sf_dir, "events")
        .select(
            "event_id", F.col("value").cast("double").alias("v")
        )
        .where(F.col("v").isNotNull())
    )
    mm = d.agg(
        F.min("v").alias("mn"), F.max("v").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = d.crossJoin(F.broadcast(mm)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("v") - F.col("mn"))
                    * F.lit(256.0)
                    / (F.col("mx") - F.col("mn"))
                ).cast("bigint"),
                F.lit(nb - 1).cast("bigint"),
            )
        )
        .alias("bin"),
        # shard-local sketches: the per-shard layer is what a real fleet
        # merges; summing it by bin reproduces the global histogram.
        F.expr("event_id % 8").alias("shard"),
    )
    shard_hists = binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    bins = shard_hists.groupBy("bin").agg(F.sum("c").alias("c"))
    cum = bins.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    qs = spark.createDataFrame([(0.5,), (0.9,), (0.99,)], "q double")
    k = qs.crossJoin(F.broadcast(mm)).select(
        "q", "mn", "mx", "n",
        (F.floor(F.col("q") * (F.col("n") - 1)) + 1)
        .cast("bigint")
        .alias("k_lo"),
        (
            F.floor(F.col("q") * (F.col("n") - 1))
            + 1
            + F.when(
                F.col("q") * (F.col("n") - 1)
                > F.floor(F.col("q") * (F.col("n") - 1)),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("k_hi"),
    )
    sel = (
        k.crossJoin(F.broadcast(cum))
        .groupBy("q", "mn", "mx", "n")
        .agg(
            F.min(
                F.when(F.col("cum") >= F.col("k_lo"), F.col("bin"))
            ).alias("b_lo"),
            F.min(
                F.when(F.col("cum") >= F.col("k_hi"), F.col("bin"))
            ).alias("b_hi"),
        )
    )
    ex = group_quantiles_exact(
        d.withColumn("g", F.lit(1)), "g", "v",
        {"p50": 0.5, "p90": 0.9, "p99": 0.99},
    ).drop("g")
    est_lo = F.col("mn") + F.col("b_lo") * (F.col("mx") - F.col("mn")) / F.lit(256.0)
    est_hi = F.col("mn") + (F.col("b_hi") + 1) * (F.col("mx") - F.col("mn")) / F.lit(256.0)
    exact = (
        F.when(F.col("q") == 0.5, F.col("p50"))
        .when(F.col("q") == 0.9, F.col("p90"))
        .otherwise(F.col("p99"))
    )
    return sel.crossJoin(F.broadcast(ex)).select(
        "q",
        F.col("n").cast("bigint").alias("n"),
        F.col("b_lo").cast("bigint").alias("bin_lo"),
        F.col("b_hi").cast("bigint").alias("bin_hi"),
        est_lo.alias("est_lo"),
        est_hi.alias("est_hi"),
        exact.alias("exact"),
        ((est_lo <= exact) & (exact <= est_hi)).alias("ok"),
    )


# --------------------------------------------------------------------------
# q173 — time-weighted average of the held value per event type: each
# (user, type) signal is a LOCF step function; the integral is
# sum(value x holding-duration) over consecutive-event segments, and the
# TWA is the exact integer division of the cent-microsecond integral by
# the observed span.  The irregular-sampling average a metrics store
# (TimescaleDB's time_weight) computes — here with EXACT decimal/bigint
# algebra, so a 1000-way partial aggregation is bit-stable.  The lead
# window partitions by (user, type): millions of small groups, never a
# whole-type ordering.
# --------------------------------------------------------------------------


@register(
    "q173_time_weighted_avg",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
),
seg AS (
  SELECT event_type, cents,
         lead(ts_us) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts_us, event_id) - ts_us AS dur
  FROM ev
),
g AS (
  SELECT event_type,
         count(*) AS n_segments,
         sum(CAST(cents AS HUGEINT) * dur) AS num,
         sum(dur) AS span_us
  FROM seg WHERE dur IS NOT NULL
  GROUP BY event_type
  HAVING sum(dur) > 0
)
SELECT event_type,
       CAST(n_segments AS BIGINT) AS n_segments,
       CAST(span_us AS BIGINT) AS span_us,
       CAST(num // span_us AS BIGINT) AS twa_cents
FROM g
""",
    doc="time-weighted average held value per type: LOCF step integral "
    "over consecutive-event segments in exact cent-microsecond decimals "
    "(order-independent partials), TWA = integral div span in integer "
    "cents; lead windows ride (user, type) groups — bounded everywhere, "
    "never a whole-type sort",
    tags=("events", "timeseries", "quantiles"),
)
def q173_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts_us",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    seg = ev.select(
        "event_type",
        "cents",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dur"),
    ).where(F.col("dur").isNotNull())
    g = (
        seg.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("dur")
            ).alias("num"),
            F.sum("dur").cast("bigint").alias("span_us"),
        )
        .where(F.col("span_us") > 0)
    )
    return g.select(
        "event_type",
        "n_segments",
        "span_us",
        F.expr("CAST(num div span_us AS BIGINT)").alias("twa_cents"),
    )


# --------------------------------------------------------------------------
# q175 — zone-map pruning effectiveness audit: per-day partition stats
# (row count, min/max value-cents, day bounds) priced against candidate
# scan predicates — how many partitions could file-skipping eliminate,
# and how many rows would never be read.  The data-layout feedback loop
# behind partitioned parquet at 100 TB: stats are ONE corpus aggregate
# on the partition key; every predicate evaluation afterwards touches
# only the vocabulary-sized stats table.  Exact integers throughout.
# --------------------------------------------------------------------------


@register(
    "q175_zonemap_pruning",
    oracle="""
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         epoch_us(ts) AS ts_us
  FROM events
),
stats AS (
  SELECT day, count(*) AS n, max(cents) AS max_c,
         max(ts_us) AS day_max_ts
  FROM ev GROUP BY day
),
hw AS (SELECT max(day_max_ts) AS hwm FROM stats),
per AS (
  SELECT 'cents>=20000' AS predicate, day, n,
         max_c < 20000 AS prunable FROM stats
  UNION ALL
  SELECT 'cents>=10000', day, n, max_c < 10000 FROM stats
  UNION ALL
  SELECT 'last7days', s.day, s.n,
         s.day_max_ts < hw.hwm - 604800000000
  FROM stats s CROSS JOIN hw
)
SELECT predicate,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(CASE WHEN prunable THEN 1 ELSE 0 END) AS BIGINT)
         AS n_prunable,
       CAST(sum(n) AS BIGINT) AS rows_total,
       CAST(sum(CASE WHEN prunable THEN n ELSE 0 END) AS BIGINT)
         AS rows_skipped,
       CAST(sum(CASE WHEN prunable THEN n ELSE 0 END) * 1000
            // sum(n) AS BIGINT) AS skip_permille
FROM per GROUP BY predicate
""",
    doc="zone-map pruning audit: per-day (count, max-cents, max-ts) stats "
    "from ONE partition-key aggregate, then candidate predicates priced "
    "on the stats table alone — prunable partitions, rows skipped, exact "
    "permille; the layout feedback a 100 TB partitioned table runs to "
    "validate its file-skipping story",
    tags=("events", "layout", "audit"),
)
def q175_zonemap_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    day_us = 86_400_000_000
    ev = table(spark, sf_dir, "events").select(
        F.expr(f"ts_us div {day_us}").alias("day"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "ts_us",
    )
    stats = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("cents").alias("max_c"),
        F.max("ts_us").alias("day_max_ts"),
    )
    stats = stats.localCheckpoint(eager=True)
    hw = stats.agg(F.max("day_max_ts").alias("hwm"))
    p1 = stats.select(
        F.lit("cents>=20000").alias("predicate"), "day", "n",
        (F.col("max_c") < 20000).alias("prunable"),
    )
    p2 = stats.select(
        F.lit("cents>=10000").alias("predicate"), "day", "n",
        (F.col("max_c") < 10000).alias("prunable"),
    )
    p3 = stats.crossJoin(F.broadcast(hw)).select(
        F.lit("last7days").alias("predicate"), "day", "n",
        (F.col("day_max_ts") < F.col("hwm") - F.lit(604_800_000_000)).alias(
            "prunable"
        ),
    )
    per = p1.unionByName(p2).unionByName(p3)
    return per.groupBy("predicate").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
        F.sum(F.col("prunable").cast("bigint"))
        .cast("bigint")
        .alias("n_prunable"),
        F.sum("n").cast("bigint").alias("rows_total"),
        F.sum(F.when(F.col("prunable"), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("rows_skipped"),
        F.expr(
            "sum(CASE WHEN prunable THEN n ELSE 0 END) * 1000 div sum(n)"
        )
        .cast("bigint")
        .alias("skip_permille"),
    )


# --------------------------------------------------------------------------
# q178 — robust quantile drift between time halves: P50/P95 of the value
# signal per (event_type, half), both through the distributed exact rank
# selector on composite groups, compared in exact integer permille.  The
# robust companion to q145's mean/ratio drift — medians move only when
# the distribution actually shifts, not when a tail burst lands.  Two
# bounded corpus passes, a vocabulary-sized compare layer.
# --------------------------------------------------------------------------


@register(
    "q178_quantile_drift",
    oracle="""
WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
           FROM events),
h AS (
  SELECT e.event_type,
         CASE WHEN epoch_us(e.ts) * 2 < b.mn + b.mx THEN 1 ELSE 2 END
           AS half,
         CAST(e.value AS DOUBLE) AS v
  FROM events e CROSS JOIN b
),
q AS (
  SELECT event_type, half,
         quantile_cont(v, 0.5) AS p50,
         quantile_cont(v, 0.95) AS p95,
         count(*) AS n
  FROM h GROUP BY event_type, half
)
SELECT a.event_type,
       CAST(a.n AS BIGINT) AS n_h1,
       CAST(c.n AS BIGINT) AS n_h2,
       a.p50 AS p50_h1, c.p50 AS p50_h2,
       a.p95 AS p95_h1, c.p95 AS p95_h2,
       CASE WHEN a.p50 = 0 THEN NULL
            ELSE CAST(floor(c.p50 * 1000 / a.p50) - 1000 AS BIGINT)
       END AS p50_drift_permille,
       CASE WHEN a.p95 = 0 THEN NULL
            ELSE CAST(floor(c.p95 * 1000 / a.p95) - 1000 AS BIGINT)
       END AS p95_drift_permille
FROM q a JOIN q c ON a.event_type = c.event_type
WHERE a.half = 1 AND c.half = 2
""",
    doc="robust drift monitor: exact P50/P95 per (type, time-half) via "
    "the rank selector on composite groups (no group buffering), halves "
    "compared in floor-permille — medians ignore the tail bursts that "
    "whipsaw mean-based drift (q145); two bounded passes",
    tags=("events", "monitoring", "quantiles"),
)
def q178_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", "ts_us", F.col("value").cast("double").alias("v")
    )
    b = ev.agg(F.min("ts_us").alias("mn"), F.max("ts_us").alias("mx"))
    h = ev.crossJoin(F.broadcast(b)).select(
        F.concat(
            "event_type",
            F.lit("#"),
            F.when(
                F.col("ts_us") * 2 < F.col("mn") + F.col("mx"), F.lit("1")
            ).otherwise(F.lit("2")),
        ).alias("g"),
        "event_type",
        F.when(
            F.col("ts_us") * 2 < F.col("mn") + F.col("mx"), F.lit(1)
        )
        .otherwise(F.lit(2))
        .alias("half"),
        "v",
    )
    qs = group_quantiles_exact(
        h.select(F.col("g"), "v"), "g", "v", {"p50": 0.5, "p95": 0.95}
    )
    n = h.groupBy("g", "event_type", "half").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    q = n.join(F.broadcast(qs), "g")
    a = q.where(F.col("half") == 1).select(
        "event_type",
        F.col("n").alias("n_h1"),
        F.col("p50").alias("p50_h1"),
        F.col("p95").alias("p95_h1"),
    )
    c = q.where(F.col("half") == 2).select(
        "event_type",
        F.col("n").alias("n_h2"),
        F.col("p50").alias("p50_h2"),
        F.col("p95").alias("p95_h2"),
    )
    out = a.join(c, "event_type")
    return out.select(
        "event_type",
        "n_h1",
        "n_h2",
        "p50_h1",
        "p50_h2",
        "p95_h1",
        "p95_h2",
        F.when(F.col("p50_h1") == 0, F.lit(None))
        .otherwise(
            F.floor(F.col("p50_h2") * 1000 / F.col("p50_h1")) - 1000
        )
        .cast("bigint")
        .alias("p50_drift_permille"),
        F.when(F.col("p95_h1") == 0, F.lit(None))
        .otherwise(
            F.floor(F.col("p95_h2") * 1000 / F.col("p95_h1")) - 1000
        )
        .cast("bigint")
        .alias("p95_drift_permille"),
    )


# --------------------------------------------------------------------------
# q187 — strict ordered funnel (view → click → purchase): a user counts
# for step k only with an event at step k strictly AFTER their first
# qualifying time at step k-1. Three user-keyed min-aggregates chained by
# equi-joins on user_id — every shuffle shares the user_id key (AQE
# reuses the partitioning), counts are exact integers. The classic
# product-analytics operator the reference's surface lacks entirely.
# --------------------------------------------------------------------------


@register(
    "q187_funnel_conversion",
    oracle="""
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
  GROUP BY e.user_id
),
n AS (
  SELECT CAST(1 AS INT) AS step_no, 'view' AS step,
         (SELECT count(*) FROM v) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT count(*) FROM c)
  UNION ALL
  SELECT 3, 'purchase', (SELECT count(*) FROM p)
)
SELECT step_no, step, CAST(n_users AS BIGINT) AS n_users,
       CAST(n_users * 1000
            // lag(n_users, 1, n_users) OVER (ORDER BY step_no)
            AS BIGINT) AS conv_from_prev_permille
FROM n
""",
    doc="strict ordered funnel view->click->purchase: per-step user counts "
    "and step-over-step conversion in exact integer permille; each step "
    "requires an event strictly after the user's first qualifying time "
    "at the previous step (user-keyed min-aggregates chained on one "
    "join key)",
    tags=("events", "funnel"),
)
def q187_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us"
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts_us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    steps = (
        v.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit(1).alias("step_no"), F.lit("view").alias("step"), "n_users")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(2).alias("step_no"), F.lit("click").alias("step"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(3).alias("step_no"),
                F.lit("purchase").alias("step"),
                "n_users",
            )
        )
    )
    # The lag window runs over the 3-row step table, never the corpus.
    w = Window.orderBy("step_no")
    return steps.select(
        F.col("step_no").cast("int").alias("step_no"),
        "step",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.expr(
            "n_users * 1000 div lag(n_users, 1, n_users) "
            "over (order by step_no)"
        )
        .cast("bigint")
        .alias("conv_from_prev_permille"),
    )


# --------------------------------------------------------------------------
# q188 — audience-overlap sketch gate (the q99/q37 discipline applied to
# set intersection): pairwise |users(A) ∩ users(B)| across event types,
# exact via a distinct-pair self-join, estimated via HLL inclusion-
# exclusion (est(A) + est(B) - est(A∪B), union by sketch merge — the only
# way set overlap is computable at 100 TB without reshuffling raw keys
# twice). The sketch estimate is engine-native (DataSketches), so the
# CONTRACT is what's oracle-checked: the exact overlap plus a boolean
# that the sketch lands within 5% relative + 50 absolute of it.
# --------------------------------------------------------------------------


@register(
    "q188_audience_overlap_sketch",
    oracle="""
WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS exact_overlap,
       TRUE AS within_bound
FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
""",
    doc="pairwise audience overlap across event types: exact distinct-user "
    "intersection plus an HLL inclusion-exclusion estimate gated at 5% "
    "relative + 50 absolute error — mergeable-sketch set algebra, the "
    "scale path for cross-source overlap (exact leg shuffles distinct "
    "pairs once)",
    tags=("events", "sketch", "audit"),
)
def q188_audience_overlap_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    d = ev.distinct()
    exact = (
        d.alias("a")
        .join(d.alias("b"), "user_id")
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_overlap"))
    )
    sk = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"),
    )
    sa = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("est").alias("est_a"),
    )
    sb = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("est").alias("est_b"),
    )
    pairs = (
        sa.crossJoin(F.broadcast(sb))
        .where(F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "est_a",
            "est_b",
            F.expr(
                "hll_sketch_estimate(hll_union(sk_a, sk_b))"
            ).alias("est_union"),
        )
        .select(
            "type_a",
            "type_b",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_inter"
            ),
        )
    )
    return exact.join(pairs, ["type_a", "type_b"]).select(
        "type_a",
        "type_b",
        "exact_overlap",
        (
            F.abs(F.col("est_inter") - F.col("exact_overlap"))
            <= F.col("exact_overlap") * 0.05 + F.lit(50)
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# q190 — retention cohort matrix: users grouped by first-activity day
# (their cohort), then for each day offset the share of the cohort still
# active. The canonical growth-analytics triangle. Two passes over
# events: one user-keyed min (cohort assignment, broadcast back is a
# user-keyed JOIN, not a broadcast — user cardinality scales with the
# corpus), one (cohort, offset) distinct-user count. Exact integers
# throughout.
# --------------------------------------------------------------------------


@register(
    "q190_retention_cohorts",
    oracle="""
WITH f AS (
  SELECT user_id,
         CAST(min(epoch_us(ts)) // 86400000000 AS BIGINT) AS cohort_day
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, f.cohort_day,
         CAST(epoch_us(e.ts) // 86400000000 AS BIGINT) - f.cohort_day
           AS day_offset
  FROM events e JOIN f ON e.user_id = f.user_id
),
sz AS (SELECT cohort_day, count(*) AS cohort_size FROM f GROUP BY 1)
SELECT a.cohort_day, a.day_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(count(*) * 1000 // s.cohort_size AS BIGINT)
         AS retained_permille
FROM act a JOIN sz s ON a.cohort_day = s.cohort_day
GROUP BY a.cohort_day, a.day_offset, s.cohort_size
""",
    doc="retention cohort triangle: users bucketed by first-activity day, "
    "per (cohort, day-offset) distinct active users and retained share "
    "in exact integer permille — two user-keyed aggregates, no window "
    "over the corpus",
    tags=("events", "funnel", "aggregate"),
)
def q190_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    day_us = 86_400_000_000
    ev = table(spark, sf_dir, "events").select("user_id", "ts_us")
    f = ev.groupBy("user_id").agg(
        F.expr(f"min(ts_us) div {day_us}").cast("bigint").alias("cohort_day")
    )
    act = (
        ev.join(f, "user_id")
        .select(
            "user_id",
            "cohort_day",
            (F.expr(f"ts_us div {day_us}") - F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    sz = f.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        act.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
        .join(sz, "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("bigint").alias("day_offset"),
            "n_active",
            F.expr("n_active * 1000 div cohort_size")
            .cast("bigint")
            .alias("retained_permille"),
        )
    )


# --------------------------------------------------------------------------
# q192 — population stability index (PSI) per event type between the
# first and second time-halves: the standard drift score
# Σ (p_i - q_i)·ln(p_i/q_i) over fixed value buckets. Laplace-smoothed
# bucket shares keep every ratio a single exact-integer division, and
# each bucket's term is floored to integer micro-units BEFORE the sum
# (the q184 discipline), so the score is order- and engine-invariant.
# PSI > 0.1 is the conventional "investigate" threshold.
# --------------------------------------------------------------------------


@register(
    "q192_psi_value_drift",
    oracle="""
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m FROM events
),
b AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) < m THEN 0 ELSE 1 END AS half,
         least(greatest(CAST(floor(value / 10) AS BIGINT), 0), 9) AS bucket
  FROM events, mid
),
c AS (
  SELECT event_type, bucket,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c2
  FROM b GROUP BY 1, 2
),
n AS (
  SELECT event_type, sum(c1) AS n1, sum(c2) AS n2 FROM c GROUP BY 1
),
terms AS (
  SELECT c.event_type,
         CAST(floor(1000000.0
              * ((c.c1 + 1.0) / (n.n1 + 10.0) - (c.c2 + 1.0) / (n.n2 + 10.0))
              * ln(((c.c1 + 1.0) / (n.n1 + 10.0))
                   / ((c.c2 + 1.0) / (n.n2 + 10.0)))) AS BIGINT) AS t_micro
  FROM c JOIN n ON c.event_type = n.event_type
)
SELECT event_type, CAST(sum(t_micro) AS BIGINT) AS psi_micro,
       sum(t_micro) > 100000 AS drifted
FROM terms GROUP BY event_type
""",
    doc="population stability index of the value distribution per event "
    "type between time halves: Laplace-smoothed fixed-bucket shares, "
    "per-bucket terms floored to integer micro-units before the sum "
    "(order-invariant), PSI > 0.1 flags drift — the standard model/data "
    "drift monitor",
    tags=("events", "monitoring", "audit"),
)
def q192_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "ts_us", "value")
    mid = ev.agg(
        ((F.min("ts_us") + F.max("ts_us")) / F.lit(2))
        .cast("bigint")
        .alias("m")
    )
    b = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.when(F.col("ts_us") < F.col("m"), 0).otherwise(1).alias("half"),
        F.least(
            F.greatest(
                F.floor(F.col("value") / 10).cast("bigint"), F.lit(0)
            ),
            F.lit(9),
        ).alias("bucket"),
    )
    c = b.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c2"),
    )
    n = c.groupBy("event_type").agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    terms = c.join(n, "event_type").select(
        "event_type",
        F.floor(
            F.lit(1000000.0)
            * (
                (F.col("c1") + 1.0) / (F.col("n1") + 10.0)
                - (F.col("c2") + 1.0) / (F.col("n2") + 10.0)
            )
            * F.log(
                ((F.col("c1") + 1.0) / (F.col("n1") + 10.0))
                / ((F.col("c2") + 1.0) / (F.col("n2") + 10.0))
            )
        )
        .cast("bigint")
        .alias("t_micro"),
    )
    return terms.groupBy("event_type").agg(
        F.sum("t_micro").cast("bigint").alias("psi_micro"),
        (F.sum("t_micro") > 100000).alias("drifted"),
    )


# --------------------------------------------------------------------------
# q200 — OHLC bars (open/high/low/close) per event type per hour: the
# canonical downsampling shape for any metered series. Open/close are
# min_by/max_by on a (ts, event_id) total order packed into one
# wide-decimal key (ts_us*1e7 + event_id overflows bigint, so the key
# is DECIMAL(38,0)/HUGEINT on the two engines) — deterministic when two
# events share a timestamp; values surface as exact cents. One
# hour-keyed aggregate, map-side combinable.
# --------------------------------------------------------------------------


@register(
    "q200_ohlc_bars",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
         CAST(epoch_us(ts) AS HUGEINT) * 10000000 + event_id AS ord,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, hour_bucket,
       CAST(arg_min(cents, ord) AS BIGINT) AS open_cents,
       CAST(max(cents) AS BIGINT) AS high_cents,
       CAST(min(cents) AS BIGINT) AS low_cents,
       CAST(arg_max(cents, ord) AS BIGINT) AS close_cents,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1, 2
""",
    doc="hourly OHLC bars per event type: open/close by min_by/max_by on a "
    "(ts, event_id) total order (deterministic under timestamp ties), "
    "high/low/count exact — one map-side-combinable hour-keyed "
    "aggregate, the metered-series downsampling shape",
    tags=("events", "aggregate", "window"),
)
def q200_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("ts_us div 3600000000").cast("bigint").alias("hour_bucket"),
        (
            F.col("ts_us").cast("decimal(38,0)") * 10000000
            + F.col("event_id")
        ).alias("ord"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return ev.groupBy("event_type", "hour_bucket").agg(
        F.min_by("cents", "ord").cast("bigint").alias("open_cents"),
        F.max("cents").cast("bigint").alias("high_cents"),
        F.min("cents").cast("bigint").alias("low_cents"),
        F.max_by("cents", "ord").cast("bigint").alias("close_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# --------------------------------------------------------------------------
# q202 — rolling-window COUNT DISTINCT via mergeable HLL registers: the
# 3-day rolling distinct-user count per day. Exact rolling distinct at
# 100 TB means re-shuffling every key once per window position; the
# sketch path builds ONE register table per day (256 rows/day,
# q135's portable md5-HLL) and merges each day's window by per-bucket
# MAX — idempotent, so overlapping windows re-merge the same day's
# registers harmlessly. The estimate is engine-native arithmetic, so
# the CONTRACT is oracle-checked (q37/q99/q188 discipline): exact
# rolling distinct plus a 20% relative error gate (256 registers →
# ~6.5% standard error).
# --------------------------------------------------------------------------

_Q202_WINDOW = 3  # days, current day inclusive


@register(
    "q202_rolling_distinct_hll",
    oracle=f"""
WITH d AS (
  SELECT DISTINCT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM d),
roll AS (
  SELECT days.day AS day, d.user_id
  FROM days JOIN d ON d.day BETWEEN days.day - {_Q202_WINDOW - 1}
                             AND days.day
)
SELECT day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_rolling_users,
       TRUE AS within_bound
FROM roll GROUP BY day
""",
    doc="3-day rolling distinct users per day: daily portable md5-HLL "
    "register tables merged per window by per-bucket max (idempotent, "
    "256 rows/day regardless of volume) — the scale path for rolling "
    "COUNT DISTINCT; sketch estimate gated at 20% relative error "
    "against the exact recompute",
    tags=("events", "sketch", "window"),
)
def q202_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    day_us = 86_400_000_000
    ev = table(spark, sf_dir, "events").select(
        F.expr(f"ts_us div {day_us}").cast("bigint").alias("day"), "user_id"
    )
    regs = hll_registers(ev, "user_id", ("day",))
    days = ev.select("day").distinct()
    # Window merge: day d's registers serve windows d..d+W-1; keep only
    # target days that exist. Fan-out is W x 256 rows per day — constant.
    off = spark.range(_Q202_WINDOW).select(F.col("id").alias("off"))
    window_regs = (
        regs.crossJoin(F.broadcast(off))
        .select((F.col("day") + F.col("off")).alias("day"), "bucket", "r")
        .join(days, "day")
        .groupBy("day", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est = hll_estimate(window_regs, ("day",))
    exact = (
        ev.distinct()
        .crossJoin(F.broadcast(off))
        .select((F.col("day") + F.col("off")).alias("day"), "user_id")
        .join(days, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias(
            "exact_rolling_users"
        ))
    )
    return exact.join(est, "day").select(
        "day",
        "exact_rolling_users",
        (
            F.abs(F.col("est") - F.col("exact_rolling_users"))
            <= F.col("exact_rolling_users") * 0.2
        ).alias("within_bound"),
    )


# --------------------------------------------------------------------------
# q203 — calibration curve: bucket a score (the event value, fixed-width
# deciles — fixed edges, not quantiles, so no rank machinery) and report
# the observed positive rate (purchase events) per bucket next to the
# bucket's mean score in exact integer algebra. The reliability-diagram
# table every scored model ships with; monotone deviations flag
# miscalibration. One bucket-keyed aggregate.
# --------------------------------------------------------------------------


@register(
    "q203_score_calibration",
    oracle="""
WITH b AS (
  SELECT least(greatest(CAST(floor(value / 10) AS BIGINT), 0), 9) AS bucket,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos,
         CAST(round(value * 1000) AS BIGINT) AS v_milli
  FROM events
)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(pos) * 1000 // count(*) AS BIGINT) AS pos_rate_permille,
       CAST(sum(v_milli) // count(*) AS BIGINT) AS mean_score_milli
FROM b GROUP BY bucket
""",
    doc="calibration/reliability table: fixed-width score deciles with "
    "observed positive rate and mean score in exact integer units — "
    "one bucket-keyed aggregate, no quantile machinery",
    tags=("events", "audit", "aggregate"),
)
def q203_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "value")
    b = ev.select(
        F.least(
            F.greatest(F.floor(F.col("value") / 10).cast("bigint"), F.lit(0)),
            F.lit(9),
        ).alias("bucket"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "pos"
        ),
        F.round(F.col("value") * 1000).cast("bigint").alias("v_milli"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.expr("sum(pos) * 1000 div count(*)")
        .cast("bigint")
        .alias("pos_rate_permille"),
        F.expr("sum(v_milli) div count(*)")
        .cast("bigint")
        .alias("mean_score_milli"),
    )


# --------------------------------------------------------------------------
# q204 — A/B experiment readout with an EXACT-integer chi-square test:
# users dealt to variants by md5 hash (reproducible assignment), outcome
# = did the user ever make a high-value (>= 90) purchase — rare enough
# on the fixture that both converted and unconverted cells populate. The 2x2 chi-square statistic
# N(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) is compared against the
# alpha=0.05 critical value 3.841 by cross-multiplication in
# DECIMAL(38,0) — no floats anywhere, so the significance verdict is
# engine- and partitioning-exact. The experimentation-analysis staple.
# DECIMAL(38,0) bounds the exact form to ~3e8 users per cell
# (N·(ad-bc)² ≤ 1e38); beyond that ANSI mode raises rather than
# silently overflowing, and the test is degenerate at that scale anyway
# (any visible difference is significant) — downscale counts first.
# --------------------------------------------------------------------------


@register(
    "q204_ab_test_chisq",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 2 AS variant,
         max(CASE WHEN event_type = 'purchase' AND value >= 90
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
cell AS (
  SELECT CAST(sum(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END)
              AS DECIMAL(38,0)) AS a,
         CAST(sum(CASE WHEN variant = 0 AND converted = 0 THEN 1 ELSE 0 END)
              AS DECIMAL(38,0)) AS b,
         CAST(sum(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END)
              AS DECIMAL(38,0)) AS c,
         CAST(sum(CASE WHEN variant = 1 AND converted = 0 THEN 1 ELSE 0 END)
              AS DECIMAL(38,0)) AS d
  FROM u
)
SELECT CAST(a AS BIGINT) AS control_converted,
       CAST(b AS BIGINT) AS control_not,
       CAST(c AS BIGINT) AS treat_converted,
       CAST(d AS BIGINT) AS treat_not,
       CAST(CAST(a AS BIGINT) * 1000 // CAST(a + b AS BIGINT) AS BIGINT)
         AS control_rate_permille,
       CAST(CAST(c AS BIGINT) * 1000 // CAST(c + d AS BIGINT) AS BIGINT)
         AS treat_rate_permille,
       (a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 1000
         > 3841 * (a + b) * (c + d) * (a + c) * (b + d) AS significant
FROM cell
""",
    doc="A/B readout: md5-hash variant assignment, per-variant conversion "
    "in exact permille, and a 2x2 chi-square significance verdict at "
    "alpha=0.05 computed entirely by DECIMAL(38,0) cross-multiplication "
    "— no floats, engine-exact; one user-keyed aggregate + one scalar "
    "cell table",
    tags=("events", "audit", "aggregate"),
)
def q204_ab_test_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import md5_u60

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 90),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).select(
        (md5_u60(F.col("user_id").cast("string")) % 2).alias("variant"),
        "converted",
    )
    dec38 = "decimal(38,0)"
    cell = u.agg(
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1).otherwise(0))
        .cast(dec38)
        .alias("a"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 0), 1).otherwise(0))
        .cast(dec38)
        .alias("b"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1).otherwise(0))
        .cast(dec38)
        .alias("c"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 0), 1).otherwise(0))
        .cast(dec38)
        .alias("d"),
    )
    return cell.select(
        F.col("a").cast("bigint").alias("control_converted"),
        F.col("b").cast("bigint").alias("control_not"),
        F.col("c").cast("bigint").alias("treat_converted"),
        F.col("d").cast("bigint").alias("treat_not"),
        F.expr(
            "cast(cast(a as bigint) * 1000 div cast(a + b as bigint) "
            "as bigint)"
        ).alias("control_rate_permille"),
        F.expr(
            "cast(cast(c as bigint) * 1000 div cast(c + d as bigint) "
            "as bigint)"
        ).alias("treat_rate_permille"),
        F.expr(
            "(a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 1000 "
            "> 3841 * (a + b) * (c + d) * (a + c) * (b + d)"
        ).alias("significant"),
    )


# --------------------------------------------------------------------------
# q206 — per-group MODE without the banned mode() aggregate: the plan
# lint (tests/test_plan_lint.py) rejects exact mode()/median() because
# they buffer whole groups; this query is the sanctioned rewrite —
# count by (group, value) first (map-side combinable), then argmax via
# a window over the AGGREGATED layer, whose partition is bounded by the
# value domain (rounded value: <= 101 rows per group), never the
# corpus. Total-order tiebreak (smallest value wins) keeps it exact.
# --------------------------------------------------------------------------


@register(
    "q206_group_mode",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value) AS BIGINT) AS v, count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, v, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY n DESC, v ASC) AS rn
  FROM c
)
SELECT event_type, CAST(v AS BIGINT) AS mode_value,
       CAST(n AS BIGINT) AS n_occurrences
FROM r WHERE rn = 1
""",
    doc="per-group mode via count-then-argmax: (group, value) aggregate "
    "with map-side partials, argmax window bounded by the value domain "
    "(<= 101 rows per group), deterministic smallest-value tiebreak — "
    "the scale-safe rewrite of the banned mode() aggregate",
    tags=("events", "aggregate", "scale"),
)
def q206_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type", F.round("value").cast("bigint").alias("v")
    )
    c = ev.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("v").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("v").cast("bigint").alias("mode_value"),
            F.col("n").cast("bigint").alias("n_occurrences"),
        )
    )


# --------------------------------------------------------------------------
# q217 — Poisson bootstrap confidence interval (the resampling idiom
# that actually works at 100 TB: classic bootstrap needs N draws per
# resample — impossible distributed — but each row's multiplicity in a
# resample is ~Poisson(1), drawable independently per row). Every draw
# is DETERMINISTIC: the md5-uniform of (event_id, resample) inverted
# through the exact integer Poisson(1) CDF thresholds (2^60-scaled), so
# any engine reproduces the same 32 resamples bit-for-bit. Per-resample
# means quantize to micro-units before the CI order statistics — the
# whole audit is exact integers.
# --------------------------------------------------------------------------

_Q217_B = 32
# floor(CDF_Poisson(1)(k) * 2^60) for k = 0..4; >= t4 draws weight 5
_Q217_T = (
    424136118829305344,
    848272237658610688,
    1060340297073263360,
    1131029650211480960,
    1148701988496035328,
)


def _q217_weight_sql(u: str) -> str:
    t = _Q217_T
    return (
        f"CASE WHEN {u} < {t[0]} THEN 0 WHEN {u} < {t[1]} THEN 1 "
        f"WHEN {u} < {t[2]} THEN 2 WHEN {u} < {t[3]} THEN 3 "
        f"WHEN {u} < {t[4]} THEN 4 ELSE 5 END"
    )


@register(
    "q217_poisson_bootstrap_ci",
    oracle=f"""
WITH d AS (
  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT d.cents, t.b,
         {_q217_weight_sql("CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || '#' || CAST(t.b AS VARCHAR)), 1, 15)) AS BIGINT)")}
           AS w
  FROM d, UNNEST(range(0, {_Q217_B})) AS t(b)
),
means AS (
  SELECT b,
         CAST(sum(w * cents) * 10000 // sum(w) AS BIGINT) AS mean_microcents
  FROM r GROUP BY b HAVING sum(w) > 0
),
pt AS (
  SELECT CAST(sum(cents) * 10000 // count(*) AS BIGINT) AS point FROM d
)
SELECT CAST(pt.point AS BIGINT) AS mean_microcents,
       CAST((SELECT count(*) FROM means) AS BIGINT) AS n_resamples,
       CAST((SELECT min(m) FROM (SELECT mean_microcents AS m FROM means
             ORDER BY m LIMIT {_Q217_B} OFFSET 1)) AS BIGINT) AS ci_lo,
       CAST((SELECT max(m) FROM (SELECT mean_microcents AS m FROM means
             ORDER BY m DESC LIMIT {_Q217_B} OFFSET 1)) AS BIGINT) AS ci_hi
FROM pt
""",
    doc=f"Poisson bootstrap CI for the mean purchase value: {_Q217_B} "
    "deterministic resamples (per-row Poisson(1) multiplicity via exact "
    "integer inverse-CDF on the md5-uniform — reproducible in any "
    "engine), per-resample means in exact integer micro-cents, CI = "
    "2nd-smallest..2nd-largest resample mean — the only bootstrap shape "
    "that distributes (no N-draw resampling pass)",
    tags=("events", "audit", "sketch"),
)
def q217_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import md5_u60

    ev = table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    ).select(
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    b = spark.range(_Q217_B).select(F.col("id").cast("int").alias("b"))
    u = md5_u60(
        F.concat(
            F.col("event_id").cast("string"),
            F.lit("#"),
            F.col("b").cast("string"),
        )
    )
    t = _Q217_T
    w = (
        F.when(u < t[0], 0)
        .when(u < t[1], 1)
        .when(u < t[2], 2)
        .when(u < t[3], 3)
        .when(u < t[4], 4)
        .otherwise(5)
    )
    r = ev.crossJoin(F.broadcast(b)).select(
        "cents", "b", w.alias("w")
    )
    # decimal accumulation/scaling: w*cents sums and the *10000 scaling
    # outgrow bigint near ~1e9 purchase rows — same overflow class as the
    # rank-metric fix; the reported micro-cent means stay small bigints
    means = (
        r.groupBy("b")
        .agg(
            F.sum(
                F.col("w").cast("decimal(38,0)") * F.col("cents")
            ).alias("swc"),
            F.sum("w").cast("decimal(38,0)").alias("sw"),
        )
        .where(F.col("sw") > 0)
        .select(
            F.expr("swc * 10000 div sw").cast("bigint").alias(
                "mean_microcents"
            )
        )
    )
    pt = ev.agg(
        F.expr(
            "cast(sum(cast(cents as decimal(38,0))) * 10000 "
            "div count(*) as bigint)"
        ).alias("point")
    )
    # CI order statistics over the means table — a BOUNDED collect of at
    # most B=32 rows (scalar-class driver read, like .first()).
    ordered = means.orderBy("mean_microcents").collect()
    vals = [r2["mean_microcents"] for r2 in ordered]
    ci_lo = vals[1] if len(vals) > 1 else vals[0]
    ci_hi = vals[-2] if len(vals) > 1 else vals[-1]
    n = len(vals)
    return pt.select(
        F.col("point").alias("mean_microcents"),
        F.lit(n).cast("bigint").alias("n_resamples"),
        F.lit(ci_lo).cast("bigint").alias("ci_lo"),
        F.lit(ci_hi).cast("bigint").alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# q226 — seasonal hour-of-week forecast audit: train a per-(event_type,
# hour-of-week) mean-value profile on everything before the final 7 days,
# predict the final week with it, and report MAE in exact integer
# micro-units per event type. Hour-of-week is epoch-hour mod 168 (no
# engine-specific weekday conventions); the split point is max(ts) - 7d
# (a 1-row broadcast scalar, so the query adapts to any fixture span);
# test hours absent from the training profile are counted, not silently
# scored. The profile is types x 168 rows — broadcast, never shuffled.
# --------------------------------------------------------------------------


@register(
    "q226_seasonal_forecast_mae",
    oracle="""
WITH e AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 168 AS how,
         CAST(round(value * 1000000) AS BIGINT) AS v_micro,
         epoch_us(ts) AS us
  FROM events
),
cut AS (SELECT max(us) - 604800000000 AS cutoff FROM e),
train AS (SELECT event_type, how, v_micro FROM e, cut WHERE us < cutoff),
prof AS (
  SELECT event_type, how,
         CAST(sum(v_micro) // count(*) AS BIGINT) AS pred_micro
  FROM train GROUP BY event_type, how
),
trn AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_train
  FROM train GROUP BY event_type
),
test AS (SELECT event_type, how, v_micro FROM e, cut WHERE us >= cutoff),
j AS (
  SELECT t.event_type, t.v_micro, p.pred_micro
  FROM test t LEFT JOIN prof p
    ON p.event_type = t.event_type AND p.how = t.how
),
a AS (
  SELECT event_type,
         CAST(count(pred_micro) AS BIGINT) AS n_test_scored,
         CAST(count(*) - count(pred_micro) AS BIGINT) AS n_test_unmatched,
         CASE WHEN count(pred_micro) > 0 THEN
           CAST(sum(CASE WHEN pred_micro IS NOT NULL
                    THEN abs(v_micro - pred_micro) ELSE 0 END)
                // count(pred_micro) AS BIGINT)
         END AS mae_micro
  FROM j GROUP BY event_type
)
SELECT a.event_type, trn.n_train, a.n_test_scored, a.n_test_unmatched,
       a.mae_micro
FROM a JOIN trn ON trn.event_type = a.event_type
""",
    doc="hour-of-week mean-value profile trained on all but the final 7 "
    "days, scored on the final week: MAE in exact integer micro-units "
    "per event type — epoch-hour mod 168 bucketing, broadcast profile, "
    "unmatched test hours surfaced not silently scored",
    tags=("events", "timeseries", "eval"),
)
def q226_seasonal_forecast_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "event_type",
        (F.expr("ts_us div 3600000000") % 168).alias("how"),
        F.round(F.col("value") * 1000000).cast("bigint").alias("v_micro"),
        "ts_us",
    )
    cut = ev.agg(
        (F.max("ts_us") - F.lit(604800000000)).alias("cutoff")
    )
    train = ev.crossJoin(F.broadcast(cut)).where(
        F.col("ts_us") < F.col("cutoff")
    )
    prof = train.groupBy("event_type", "how").agg(
        F.expr("sum(v_micro) div count(*)")
        .cast("bigint")
        .alias("pred_micro")
    )
    trn = train.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_train")
    )
    test = ev.crossJoin(F.broadcast(cut)).where(
        F.col("ts_us") >= F.col("cutoff")
    )
    j = test.join(F.broadcast(prof), ["event_type", "how"], "left")
    a = j.groupBy("event_type").agg(
        F.count("pred_micro").cast("bigint").alias("n_test_scored"),
        (F.count("*") - F.count("pred_micro"))
        .cast("bigint")
        .alias("n_test_unmatched"),
        F.expr(
            "CASE WHEN count(pred_micro) > 0 THEN "
            "CAST(sum(CASE WHEN pred_micro IS NOT NULL "
            "THEN abs(v_micro - pred_micro) ELSE 0 END) "
            "div count(pred_micro) AS BIGINT) END"
        ).alias("mae_micro"),
    )
    return a.join(F.broadcast(trn), "event_type").select(
        "event_type", "n_train", "n_test_scored", "n_test_unmatched",
        "mae_micro",
    )


# --------------------------------------------------------------------------
# q227 — noisy aggregate release with deterministic seeded noise: per-
# event-type counts and value sums published with bounded integer noise
# derived from md5('q227' || event_type) — the differential-privacy
# release *shape* (noise magnitude column, per-release seed, exact true
# values never in the output) with reproducible noise so both engines
# and any re-run produce the identical release. Swapping the md5-derived
# noise for true Laplace draws is a one-line change; everything else
# (scale, budget accounting, column contract) is what a DP release
# pipeline needs at 100 TB: one hash-partitioned aggregate, no extra
# passes for the noise.
# --------------------------------------------------------------------------

_Q227_NOISE_HALF_WIDTH = 50  # +-50 events / +-50 micro-units of sum


@register(
    "q227_noisy_release",
    oracle=f"""
WITH a AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_true,
         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
           AS sum_micro_true
  FROM events GROUP BY event_type
),
n AS (
  SELECT event_type, n_true, sum_micro_true,
         CAST(('0x' || substr(md5('q227c' || event_type), 1, 15)) AS BIGINT)
           % {2 * _Q227_NOISE_HALF_WIDTH + 1} - {_Q227_NOISE_HALF_WIDTH}
           AS noise_n,
         CAST(('0x' || substr(md5('q227s' || event_type), 1, 15)) AS BIGINT)
           % {2 * _Q227_NOISE_HALF_WIDTH + 1} - {_Q227_NOISE_HALF_WIDTH}
           AS noise_s
  FROM a
)
SELECT event_type,
       CAST(n_true + noise_n AS BIGINT) AS n_released,
       CAST(sum_micro_true + noise_s AS BIGINT) AS sum_micro_released,
       CAST({_Q227_NOISE_HALF_WIDTH} AS BIGINT) AS noise_half_width
FROM n
""",
    doc="noisy per-type count/sum release with deterministic md5-seeded "
    "bounded integer noise — the DP release column contract (noise "
    "magnitude published, true values withheld) with reproducible "
    "noise; single hash aggregate, noise computed post-aggregate",
    tags=("events", "governance"),
)
def q227_noisy_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.functions.text import md5_u60

    w = _Q227_NOISE_HALF_WIDTH
    a = (
        table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_true"),
            F.sum(F.round(F.col("value") * 1000000).cast("bigint"))
            .cast("bigint")
            .alias("sum_micro_true"),
        )
    )
    noise_n = (
        md5_u60(F.concat(F.lit("q227c"), F.col("event_type"))) % (2 * w + 1)
        - w
    )
    noise_s = (
        md5_u60(F.concat(F.lit("q227s"), F.col("event_type"))) % (2 * w + 1)
        - w
    )
    return a.select(
        "event_type",
        (F.col("n_true") + noise_n).cast("bigint").alias("n_released"),
        (F.col("sum_micro_true") + noise_s)
        .cast("bigint")
        .alias("sum_micro_released"),
        F.lit(w).cast("bigint").alias("noise_half_width"),
    )


# --------------------------------------------------------------------------
# q228 — threshold up-crossing alerts (batch twin of s26): per
# (user, event_type) ordered by (ts, event_id), an alert fires when the
# value crosses from below to at-or-above the type's threshold between
# consecutive events. The lag window partitions on the (user, type) key
# — bounded per-key cells, never a global ordering; the per-type
# threshold is a literal CASE. Output: alerts and alerted-user counts
# per type.
# --------------------------------------------------------------------------

THRESHOLDS_Q228 = {
    "error": 100.0,
    "signup": 150.0,
    "view": 200.0,
    "click": 250.0,
    "purchase": 300.0,
}


@register(
    "q228_threshold_crossings",
    oracle="""
WITH s AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CASE WHEN value >= (CASE event_type
              WHEN 'error' THEN 100.0 WHEN 'signup' THEN 150.0
              WHEN 'view' THEN 200.0 WHEN 'click' THEN 250.0
              ELSE 300.0 END) THEN 1 ELSE 0 END AS side
  FROM events
),
l AS (
  SELECT user_id, event_type, side,
         lag(side) OVER (PARTITION BY user_id, event_type
                         ORDER BY us, event_id) AS prev_side
  FROM s
),
a AS (
  SELECT user_id, event_type,
         CAST(count(*) FILTER (WHERE prev_side = 0 AND side = 1)
              AS BIGINT) AS n_up
  FROM l GROUP BY user_id, event_type
)
SELECT event_type, CAST(sum(n_up) AS BIGINT) AS n_alerts,
       CAST(count(*) FILTER (WHERE n_up > 0) AS BIGINT) AS n_users_alerted
FROM a GROUP BY event_type
""",
    doc="per-(user, type) threshold up-crossing alerts between "
    "consecutive events — bounded per-key lag windows, literal per-type "
    "thresholds; batch twin of streaming s26",
    tags=("events", "window", "monitoring"),
)
def q228_threshold_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    thr = F.when(F.col("event_type") == "error", 100.0)
    for t, v in (("signup", 150.0), ("view", 200.0), ("click", 250.0)):
        thr = thr.when(F.col("event_type") == t, v)
    thr = thr.otherwise(300.0)
    s = ev.select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.when(F.col("value") >= thr, 1).otherwise(0).alias("side"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts_us", "event_id"
    )
    lagged = s.withColumn("prev_side", F.lag("side").over(w))
    a = lagged.groupBy("user_id", "event_type").agg(
        F.sum(
            F.when(
                (F.col("prev_side") == 0) & (F.col("side") == 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_up")
    )
    return a.groupBy("event_type").agg(
        F.sum("n_up").cast("bigint").alias("n_alerts"),
        F.sum(F.when(F.col("n_up") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_users_alerted"),
    )


# --------------------------------------------------------------------------
# q230 — exponentially-weighted moving value (alpha = 1/2, 16 terms) at
# each (user, type) key's latest event, summed per type. With alpha a
# power of two every weight 2^-(j+1) is a dyadic rational, so each term
# v_micro * 2^-(j+1) is EXACT in a double (v_micro < 2^29, 16 extra
# mantissa bits needed, 29 + 17 < 53) and the 16-term sum is exact and
# order-independent — the trick that makes an EWMA hash-comparable
# across engines. The recursion unrolls to 16 lag() terms over the
# bounded per-key window; missing history contributes 0 (documented:
# the EWMA of a short history is the truncated series, not a
# renormalized one).
# --------------------------------------------------------------------------

_Q230_TERMS = 16


def _q230_series() -> str:
    """The unrolled dyadic lag series — one text, both engines."""
    return " + ".join(
        f"coalesce(CAST(lag(v_micro, {j}) OVER w AS DOUBLE), 0.0)"
        f" / {float(2 ** (j + 1))!r}"
        for j in range(_Q230_TERMS)
    )


@register(
    "q230_ewma_latest",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CAST(round(value * 1000000) AS BIGINT) AS v_micro
  FROM events
),
s AS (
  SELECT user_id, event_type,
         {_q230_series()} AS ewma,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY us DESC, event_id DESC) AS rn_desc
  FROM e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY us, event_id)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_keys,
       -- ewma * 2^16 is an exact integer (dyadic lsb 2^-16); summing
       -- AS BIGINT keeps the aggregate associative at any parallelism,
       -- then one flooring shift recovers floor(sum(ewma))
       CAST(sum(CAST(ewma * 65536.0 AS BIGINT)) // 65536 AS BIGINT)
         AS total_ewma_micro
FROM s WHERE rn_desc = 1
GROUP BY event_type
""",
    doc="EWMA (alpha=1/2, 16 dyadic terms — bit-exact in doubles) at "
    "each (user, type) key's latest event, summed per type — unrolled "
    "lag series over bounded per-key windows, no recursion, no state",
    tags=("events", "timeseries", "window"),
)
def q230_ewma_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("us"),
        "event_id",
        F.round(F.col("value") * 1000000).cast("bigint").alias("v_micro"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    ewma = None
    for j in range(_Q230_TERMS):
        term = F.coalesce(
            F.lag("v_micro", j).over(w).cast("double"), F.lit(0.0)
        ) / F.lit(float(2 ** (j + 1)))
        ewma = term if ewma is None else ewma + term
    w_desc = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    s = ev.select(
        "event_type",
        ewma.alias("ewma"),
        F.row_number().over(w_desc).alias("rn_desc"),
    )
    return (
        s.where(F.col("rn_desc") == 1)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.expr("sum(CAST(ewma * 65536.0 AS BIGINT)) div 65536")
            .cast("bigint")
            .alias("total_ewma_micro"),
        )
    )


# --------------------------------------------------------------------------
# q231 — exact peak concurrency by distributed sweep-line: sessionize
# (30-min gap), emit +1/-1 boundary points per session interval
# (half-open [start, end+1µs) so simultaneous exit/enter never double-
# counts), and take the running sum over the boundary total order with
# the range-partitioned exclusive-prefix operator (operators/ranking.py)
# — never a single-task global window. Output: the peak, its first
# timestamp, and the session count. The capacity-planning primitive
# (max concurrent sessions/connections/streams) done exactly at scale.
# --------------------------------------------------------------------------


@register(
    "q231_peak_concurrency",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
x AS (
  SELECT user_id, us, event_id,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM x
),
iv AS (
  SELECT user_id, sess_id, min(us) AS start_us, max(us) + 1 AS end_us
  FROM s GROUP BY user_id, sess_id
),
p AS (
  SELECT start_us AS ts, 1 AS delta, user_id, sess_id FROM iv
  UNION ALL
  SELECT end_us AS ts, -1 AS delta, user_id, sess_id FROM iv
),
c AS (
  SELECT ts, delta,
         sum(delta) OVER (ORDER BY ts, delta, user_id, sess_id
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM p
),
m AS (SELECT max(conc) AS peak FROM c)
SELECT CAST(m.peak AS BIGINT) AS peak_concurrency,
       CAST((SELECT min(ts) FROM c, m WHERE c.conc = m.peak) AS BIGINT)
         AS peak_at_us,
       CAST((SELECT count(*) FROM iv) AS BIGINT) AS n_sessions
FROM m
""",
    doc="exact peak concurrent sessions via sweep-line: 30-min-gap "
    "sessions, half-open +1/-1 boundary points, range-partitioned "
    "exclusive prefix sum (no global single-task window), peak + first "
    "peak timestamp + session count",
    tags=("events", "sessions", "ranking"),
)
def q231_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        exclusive_prefix_sums,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts", "ts_us", "event_id"
    )
    sess = sessionize(ev, "user_id", "ts", 1800, "event_id")
    iv = sess.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("start_us"),
        (F.max("ts_us") + 1).alias("end_us"),
    )
    pts = iv.select(
        F.col("start_us").alias("ts"),
        F.lit(1).cast("bigint").alias("delta"),
        "user_id",
        "session_id",
    ).unionByName(
        iv.select(
            F.col("end_us").alias("ts"),
            F.lit(-1).cast("bigint").alias("delta"),
            "user_id",
            "session_id",
        )
    )
    pre = exclusive_prefix_sums(
        pts, ["ts", "delta", "user_id", "session_id"], ["delta"]
    )
    conc = pre.select(
        "ts", (F.col("delta_before") + F.col("delta")).alias("conc")
    )
    peak = conc.agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
    peak_at = (
        conc.join(F.broadcast(peak), conc.conc == peak.peak_concurrency)
        .agg(F.min("ts").cast("bigint").alias("peak_at_us"))
    )
    n_sess = iv.agg(F.count("*").cast("bigint").alias("n_sessions"))
    return (
        peak.crossJoin(F.broadcast(peak_at))
        .crossJoin(F.broadcast(n_sess))
        .select("peak_concurrency", "peak_at_us", "n_sessions")
    )


# --------------------------------------------------------------------------
# q234 — exact Gini coefficient of per-user purchase spend: the
# inequality statistic behind "how concentrated is revenue", computed
# WITHOUT a global sort of the rows — the per-user spend table collapses
# to distinct-value groups, one range-partitioned prefix layer lays them
# on the value order, and the classic rank formula runs in exact
# DECIMAL(38,0) algebra (operators/rankstats.py:gini_exact). Ties make
# the within-group rank choice irrelevant, so the ppm output is exact.
# --------------------------------------------------------------------------


@register(
    "q234_gini_user_spend",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id
),
g AS (SELECT cents AS v, CAST(count(*) AS BIGINT) AS n FROM u
      WHERE cents IS NOT NULL GROUP BY cents),
p AS (
  SELECT v, n,
         coalesce(sum(n) OVER (ORDER BY v
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS b
  FROM g
),
m AS (
  SELECT CAST(sum(n) AS HUGEINT) AS n,
         CAST(sum(CAST(v AS HUGEINT) * n) AS HUGEINT) AS sx,
         CAST(sum(CAST(v AS HUGEINT)
                  * (n * b + (n * (n + 1)) // 2)) AS HUGEINT) AS srx
  FROM p
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(sx AS BIGINT) AS total,
       CAST((2 * srx - (n + 1) * sx) * 1000000 // (n * sx) AS BIGINT)
         AS gini_ppm
FROM m
""",
    doc="exact Gini coefficient of per-user purchase spend in ppm: "
    "distinct-value groups + range-partitioned prefix layer + the rank "
    "formula in exact DECIMAL(38,0) — no global row sort, no float "
    "accumulation",
    tags=("events", "aggregate", "ranking"),
)
def q234_gini_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        gini_exact,
    )

    ev = table(spark, sf_dir, "events")
    spend = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    return gini_exact(spend, "cents")


# --------------------------------------------------------------------------
# q235 — two-sample Kolmogorov–Smirnov distance between the purchase and
# click value distributions, exact in integer cross-multiplication: the
# ECDF gap only moves at observed values, so distinct-cents groups + one
# prefix layer give every cumulative pair, and |A·n_b − B·n_a| avoids
# per-sample division entirely (operators/rankstats.py:ks_two_sample).
# The drift gate for "did this slice's distribution move" at any scale.
# --------------------------------------------------------------------------


@register(
    "q235_ks_purchase_click",
    oracle="""
WITH e AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS b
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
),
g AS (
  SELECT v,
         CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(b) AS BIGINT) AS nb
  FROM e GROUP BY v
),
c AS (
  SELECT v,
         sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM g
),
t AS (SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b
      FROM g),
gap AS (
  SELECT v, abs(CAST(ca AS HUGEINT) * t.n_b - CAST(cb AS HUGEINT) * t.n_a)
           AS gp
  FROM c, t
),
m AS (SELECT max(gp) AS mg FROM gap)
SELECT t.n_a, t.n_b,
       CAST(m.mg * 1000000 // (CAST(t.n_a AS HUGEINT) * t.n_b) AS BIGINT)
         AS d_ppm,
       CAST((SELECT min(v) FROM gap, m WHERE gap.gp = m.mg) AS BIGINT)
         AS d_at
FROM t, m
""",
    doc="exact two-sample Kolmogorov-Smirnov distance (ppm) between "
    "purchase and click value distributions: distinct-value ECDF steps, "
    "range-partitioned prefix layer, integer cross-multiplied gap — "
    "plus the smallest value attaining the supremum",
    tags=("events", "aggregate", "ranking", "audit"),
)
def q235_ks_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        ks_two_sample,
    )

    ev = table(spark, sf_dir, "events")
    sample = ev.filter(
        F.col("event_type").isin("purchase", "click")
    ).select(
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        F.when(F.col("event_type") == "purchase", F.lit(0))
        .otherwise(F.lit(1))
        .alias("b"),
    )
    return ks_two_sample(sample, "v", "b")


# --------------------------------------------------------------------------
# q236 — Kaplan–Meier survival of user lifetimes: per user, lifetime =
# days between first and last event; the lifetime is an observed
# "churn" event only when the user has been silent for ≥ 12 hours before
# the corpus end (the fixture corpus spans ~30 days with near-daily
# activity, so half-day silence is the churn signal at this cadence), else right-censored. The product estimator runs in
# log space with each step's ln(1 − d/n) floor-quantized to integer
# nano-nats BEFORE the cumulative sum (the repo's quantize-then-
# integer-sum discipline), both the at-risk and the cumulative layers
# being range-partitioned prefix passes over the bounded distinct-
# duration table (operators/rankstats.py:kaplan_meier).
# --------------------------------------------------------------------------


@register(
    "q236_kaplan_meier_lifetimes",
    oracle="""
WITH u AS (
  SELECT user_id, epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l
  FROM events GROUP BY user_id
),
mx AS (SELECT max(l) AS m FROM u),
d AS (
  SELECT (l - f) // 86400000000 AS t,
         CASE WHEN l <= mx.m - 43200000000 THEN 1 ELSE 0 END AS ev
  FROM u, mx WHERE l IS NOT NULL
),
g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ev) AS BIGINT) AS n_events
  FROM d GROUP BY t
),
p AS (
  SELECT t, n, n_events, n - n_events AS n_censored,
         (SELECT sum(n) FROM g)
           - coalesce(sum(n) OVER (ORDER BY t
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS n_risk
  FROM g
),
s AS (
  SELECT t, n_risk, n_events, n_censored,
         CASE WHEN n_events > 0 AND n_events < n_risk
              THEN CAST(floor(1000000000.0
                              * ln(CAST(n_risk - n_events AS DOUBLE)
                                   / CAST(n_risk AS DOUBLE))) AS BIGINT)
              ELSE 0 END AS step,
         CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END AS dead
  FROM p
)
SELECT CAST(t AS BIGINT) AS t,
       CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
       CAST(CASE WHEN max(dead) OVER (ORDER BY t
                                      ROWS UNBOUNDED PRECEDING) = 1
                 THEN NULL
                 ELSE sum(step) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
            END AS BIGINT) AS log_s_nano
FROM s
WHERE n_events > 0
ORDER BY t
""",
    doc="Kaplan-Meier survival table of user lifetimes (days first->last "
    "event, churn observed iff silent >= 12 hours before corpus end): "
    "at-risk counts and cumulative log-survival both via range-"
    "partitioned prefix passes, per-step ln quantized to integer "
    "nano-nats before summation; NULL survival after S hits 0",
    tags=("events", "aggregate", "ranking", "audit"),
)
def q236_kaplan_meier_lifetimes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        kaplan_meier,
    )

    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("f"), F.max("ts_us").alias("l")
    )
    mx = u.agg(F.max("l").alias("m"))
    d = u.crossJoin(F.broadcast(mx)).select(
        F.expr("(l - f) div 86400000000").cast("bigint").alias("t"),
        F.when(F.col("l") <= F.col("m") - F.lit(43_200_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("ev"),
    )
    # the operator itself NULLs log-S at and after any step where S hits
    # exactly 0, matching the oracle's CASE
    return kaplan_meier(d, "t", "ev").select(
        "t", "n_risk", "n_events", "n_censored", "log_s_nano"
    )


# --------------------------------------------------------------------------
# q237 — mean NDCG@10 of each user's event feed against value-graded
# relevance, in pure integer arithmetic: position discounts 1/log₂(i+1)
# for the fixed i = 1..10 are pre-quantized micro-unit constants (a
# 10-row broadcast literal table — no runtime libm anywhere), relevance
# grades purchases 3 / clicks 1 / rest 0, per-user DCG and ideal-DCG
# are integer dot products under per-user windows (small bounded
# groups), and the corpus mean is an exact integer floor division.
# Ranking-quality eval ("are the high-value actions early in the
# feed?") with no float anywhere — hash-portable by construction.
# --------------------------------------------------------------------------

_NDCG_DISC = (
    (1, 1000000), (2, 630930), (3, 500000), (4, 430677), (5, 386853),
    (6, 356207), (7, 333333), (8, 315465), (9, 301030), (10, 289065),
)


@register(
    "q237_ndcg_user_feeds",
    oracle=f"""
WITH disc(i, dm) AS (VALUES {', '.join(f'({i}, {d})' for i, d in _NDCG_DISC)}),
e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE event_type WHEN 'purchase' THEN 3
                         WHEN 'click' THEN 1 ELSE 0 END AS rel
  FROM events
),
feed AS (
  SELECT user_id, rel,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us, event_id) AS pos
  FROM e
),
ideal AS (
  SELECT user_id, rel,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY rel DESC, us, event_id) AS pos
  FROM e
),
dcg AS (
  SELECT f.user_id,
         CAST(sum(f.rel * d.dm) AS BIGINT) AS dcg_micro
  FROM feed f JOIN disc d ON d.i = f.pos
  GROUP BY f.user_id
),
idcg AS (
  SELECT i.user_id,
         CAST(sum(i.rel * d.dm) AS BIGINT) AS idcg_micro
  FROM ideal i JOIN disc d ON d.i = i.pos
  GROUP BY i.user_id
),
per_user AS (
  SELECT dcg.user_id,
         CAST(dcg.dcg_micro * 1000 // idcg.idcg_micro AS BIGINT)
           AS ndcg_permille
  FROM dcg JOIN idcg ON dcg.user_id = idcg.user_id
  WHERE idcg.idcg_micro > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(ndcg_permille) // count(*) AS BIGINT)
         AS mean_ndcg_permille,
       CAST(min(ndcg_permille) AS BIGINT) AS min_ndcg_permille
FROM per_user
""",
    doc="mean NDCG@10 of per-user event feeds (relevance: purchase 3, "
    "click 1, else 0; feed order = timestamp): fixed 10-row integer "
    "micro-discount table (no runtime libm), per-user integer dot "
    "products under bounded windows, exact integer corpus mean",
    tags=("events", "ranking", "eval"),
)
def q237_ndcg_user_feeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(F.col("event_type") == "purchase", F.lit(3))
        .when(F.col("event_type") == "click", F.lit(1))
        .otherwise(F.lit(0))
        .alias("rel"),
    )
    disc = F.broadcast(
        ev.sparkSession.createDataFrame(list(_NDCG_DISC), "i int, dm bigint")
    )
    w_feed = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w_ideal = Window.partitionBy("user_id").orderBy(
        F.col("rel").desc(), "ts_us", "event_id"
    )
    ranked = ev.withColumn("pos_f", F.row_number().over(w_feed)).withColumn(
        "pos_i", F.row_number().over(w_ideal)
    )
    dcg = (
        ranked.join(disc, ranked.pos_f == disc.i)
        .groupBy("user_id")
        .agg(F.sum(F.col("rel") * F.col("dm")).cast("bigint").alias("dcg"))
    )
    idcg = (
        ranked.join(disc, ranked.pos_i == disc.i)
        .groupBy("user_id")
        .agg(F.sum(F.col("rel") * F.col("dm")).cast("bigint").alias("idcg"))
    )
    per_user = (
        dcg.join(idcg, "user_id")
        .filter(F.col("idcg") > 0)
        .select(
            F.expr("cast(dcg * 1000 div idcg as bigint)").alias(
                "ndcg_permille"
            )
        )
    )
    return per_user.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.expr(
            "cast(sum(ndcg_permille) div count(*) as bigint)"
        ).alias("mean_ndcg_permille"),
        F.min("ndcg_permille").cast("bigint").alias("min_ndcg_permille"),
    )


# --------------------------------------------------------------------------
# q246 — temporal distribution drift: the exact two-sample KS distance
# between the first and second time-half of the purchase value stream
# (split at the midpoint of the observed time range — no driver
# scalars; the midpoint is a broadcast one-row aggregate). The batch
# value-twin of the s27 streaming monitor: both funnel through the
# same count-level KS algebra (operators/rankstats.py:ks_from_counts),
# whose per-value count partials sum-merge exactly, so stream and
# batch agree bit-for-bit.
# --------------------------------------------------------------------------


@register(
    "q246_ks_time_drift",
    oracle="""
WITH b AS (
  SELECT epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
),
mp AS (SELECT (min(us) + max(us)) // 2 AS mid FROM b),
e AS (SELECT v, CASE WHEN us >= mp.mid THEN 1 ELSE 0 END AS grp
      FROM b, mp WHERE v IS NOT NULL),
g AS (
  SELECT v,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(grp) AS BIGINT) AS nb
  FROM e GROUP BY v
),
c AS (
  SELECT v,
         sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM g
),
t AS (SELECT CAST(sum(na) AS BIGINT) AS n_a, CAST(sum(nb) AS BIGINT) AS n_b
      FROM g),
gap AS (
  SELECT v, abs(CAST(ca AS HUGEINT) * t.n_b - CAST(cb AS HUGEINT) * t.n_a)
           AS gp
  FROM c, t
),
m AS (SELECT max(gp) AS mg FROM gap)
SELECT t.n_a, t.n_b,
       CAST(m.mg * 1000000 // (CAST(t.n_a AS HUGEINT) * t.n_b) AS BIGINT)
         AS d_ppm,
       CAST((SELECT min(v) FROM gap, m WHERE gap.gp = m.mg) AS BIGINT)
         AS d_at
FROM t, m
""",
    doc="exact KS distance (ppm) between first- and second-time-half "
    "purchase values, split at the broadcast time midpoint — the batch "
    "value-twin of the s27 streaming KS monitor (same count-level "
    "integer algebra, sum-mergeable partials)",
    tags=("events", "aggregate", "ranking", "audit", "streaming-twin"),
)
def q246_ks_time_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        ks_two_sample,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    mp = ev.agg(
        F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid")
    )
    sample = ev.crossJoin(F.broadcast(mp)).select(
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        F.when(F.col("ts_us") >= F.col("mid"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("grp"),
    )
    return ks_two_sample(sample, "v", "grp")


# --------------------------------------------------------------------------
# q247 — purchase odds ratio across a user split with an exact-integer
# Katz confidence interval: users hash-split A/B (md5, the q42/q58
# discipline), the 2×2 contingency table (purchased-or-not × arm) folds
# in ONE conditional-aggregate pass, and the odds ratio plus its 95% CI
# come out in quantized micro-units — ln(OR) and its standard error are
# each ONE deterministic float expression over the four exact cells
# (the q214 stance), floor-quantized before the ± fold, never a float
# accumulation. Haldane +0.5 correction keeps zero cells finite.
# --------------------------------------------------------------------------


@register(
    "q247_purchase_odds_ratio",
    oracle="""
WITH u AS (
  SELECT user_id,
         CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                   % 2 = 0 THEN 0 ELSE 1 END AS arm,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
  FROM events GROUP BY user_id
),
c AS (
  SELECT CAST(sum(CASE WHEN arm = 0 AND bought = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(sum(CASE WHEN arm = 0 AND bought = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
         CAST(sum(CASE WHEN arm = 1 AND bought = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
         CAST(sum(CASE WHEN arm = 1 AND bought = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS d
  FROM u
)
SELECT a, b, c, d,
       CAST(floor(1000000.0
                  * ln(((a + 0.5) * (d + 0.5)) / ((b + 0.5) * (c + 0.5))))
            AS BIGINT) AS log_or_micro,
       CAST(floor(1000000.0
                  * 1.959964
                  * sqrt(1.0/(a + 0.5) + 1.0/(b + 0.5)
                         + 1.0/(c + 0.5) + 1.0/(d + 0.5))) AS BIGINT)
         AS half_ci_micro
FROM c
""",
    doc="purchase odds ratio across an md5 user split with exact-integer "
    "2x2 cells from one conditional-aggregate pass; ln(OR) and the 95% "
    "Katz half-interval each one deterministic float expression over "
    "the exact cells, floor-quantized to micro-units (Haldane +0.5)",
    tags=("events", "aggregate", "eval", "audit"),
)
def q247_purchase_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("bought")
    ).select(
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
        ).alias("arm"),
        "bought",
    )
    cells = u.agg(
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("bought") == 1), 1).otherwise(0)
        ).cast("bigint").alias("a"),
        F.sum(
            F.when((F.col("arm") == 0) & (F.col("bought") == 0), 1).otherwise(0)
        ).cast("bigint").alias("b"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("bought") == 1), 1).otherwise(0)
        ).cast("bigint").alias("c"),
        F.sum(
            F.when((F.col("arm") == 1) & (F.col("bought") == 0), 1).otherwise(0)
        ).cast("bigint").alias("d"),
    )
    return cells.select(
        "a", "b", "c", "d",
        F.floor(
            F.lit(1_000_000.0)
            * F.log(
                ((F.col("a") + 0.5) * (F.col("d") + 0.5))
                / ((F.col("b") + 0.5) * (F.col("c") + 0.5))
            )
        ).cast("bigint").alias("log_or_micro"),
        F.floor(
            F.lit(1_000_000.0)
            * F.lit(1.959964)
            * F.sqrt(
                1.0 / (F.col("a") + 0.5)
                + 1.0 / (F.col("b") + 0.5)
                + 1.0 / (F.col("c") + 0.5)
                + 1.0 / (F.col("d") + 0.5)
            )
        ).cast("bigint").alias("half_ci_micro"),
    )


# --------------------------------------------------------------------------
# q248 — autocorrelation of the hourly event-count series at lags 1, 2,
# 3, 6, 12, 24: the seasonality detector. The corpus folds ONCE to the
# bounded hourly table; each lag is an equi-self-join on hour+lag of
# that table (never the event stream), and each lag's ACF is Pearson
# over the exact integer (count, lagged-count) pairs — five exact
# DECIMAL(38,0) moments per lag, one deterministic float expression
# (the q214 discipline). Missing hours count as zero activity via a
# dense hour spine derived from the observed range.
# --------------------------------------------------------------------------


@register(
    "q248_hourly_autocorrelation",
    oracle="""
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS c
  FROM events GROUP BY 1
),
r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
spine AS (
  SELECT CAST(t.h AS BIGINT) AS h
  FROM r, LATERAL unnest(generate_series(r.h0, r.h1)) t(h)
),
d AS (
  SELECT spine.h, CAST(coalesce(e.c, 0) AS BIGINT) AS c
  FROM spine LEFT JOIN e ON e.h = spine.h
),
lags(lag) AS (VALUES (1), (2), (3), (6), (12), (24)),
p AS (
  SELECT l.lag, a.c AS x, b.c AS y
  FROM lags l
  JOIN d a ON TRUE
  JOIN d b ON b.h = a.h + l.lag
),
m AS (
  SELECT lag,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(x) AS DECIMAL(38,0)) AS sx,
         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(y * y) AS DECIMAL(38,0)) AS syy
  FROM p GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS acf
FROM m
""",
    doc="hourly-count autocorrelation at lags 1/2/3/6/12/24 over a dense "
    "hour spine (missing hours = 0): one corpus fold to the bounded "
    "hourly table, per-lag equi-self-joins of that table, Pearson from "
    "five exact DECIMAL(38,0) moments per lag",
    tags=("events", "timeseries", "aggregate"),
)
def q248_hourly_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        densify_counts,
    )

    ev = table(spark, sf_dir, "events")
    e = ev.groupBy(
        F.expr("ts_us div 3600000000").alias("h")
    ).agg(F.count("*").cast("bigint").alias("c"))
    d = densify_counts(e)
    lags = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(1,), (2,), (3,), (6,), (12,), (24,)], "lag bigint"
        )
    )
    a = d.select(F.col("h").alias("ha"), F.col("c").alias("x"))
    b = d.select(F.col("h").alias("hb"), F.col("c").alias("y"))
    p = a.crossJoin(lags).join(b, F.col("hb") == F.col("ha") + F.col("lag"))
    dec38 = "decimal(38,0)"
    m = p.groupBy("lag").agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("x").cast(dec38).alias("sx"),
        F.sum("y").cast(dec38).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec38).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec38).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast(dec38).alias("syy"),
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        (
            F.expr("cast(n * sxy - sx * sy as double)")
            / (
                F.sqrt(F.expr("cast(n * sxx - sx * sx as double)"))
                * F.sqrt(F.expr("cast(n * syy - sy * sy as double)"))
            )
        ).alias("acf"),
    )


# --------------------------------------------------------------------------
# q249 — CUSUM changepoint scan over the hourly event-count series, in
# EXACT integer arithmetic: scaling deviations by n turns the classic
# cumulative sum of (c_i − mean) into Σ (n·c_i − total) — an integer
# prefix sum with no division anywhere. The corpus folds once to the
# dense hourly table (missing hours = 0); the running sum rides the
# range-partitioned prefix operator, and the report is the argmax hour
# of |CUSUM| (tie-broken to the earliest hour) with the peak scaled
# back to micro-events via one exact integer division at the end.
# --------------------------------------------------------------------------


@register(
    "q249_cusum_changepoint",
    oracle="""
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS c
  FROM events GROUP BY 1
),
r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
spine AS (
  SELECT CAST(t.h AS BIGINT) AS h
  FROM r, LATERAL unnest(generate_series(r.h0, r.h1)) t(h)
),
d AS (
  SELECT spine.h, CAST(coalesce(e.c, 0) AS BIGINT) AS c
  FROM spine LEFT JOIN e ON e.h = spine.h
),
t AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS total
      FROM d),
cu AS (
  SELECT d.h,
         sum(t.n * d.c - t.total)
           OVER (ORDER BY d.h ROWS UNBOUNDED PRECEDING) AS s
  FROM d, t
),
m AS (SELECT max(abs(s)) AS peak FROM cu)
SELECT t.n AS n_hours, t.total AS n_events,
       CAST((SELECT min(h) FROM cu, m WHERE abs(cu.s) = m.peak) AS BIGINT)
         AS change_at_hour,
       CAST(m.peak * 1000000 // t.n AS BIGINT) AS peak_micro_events
FROM t, m
""",
    doc="CUSUM changepoint over the dense hourly count series in exact "
    "integer arithmetic (deviations scaled by n: sum of n*c - total), "
    "range-partitioned prefix sum, earliest argmax hour of |CUSUM|, "
    "peak scaled to micro-events by one exact division",
    tags=("events", "timeseries", "ranking", "audit"),
)
def q249_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        cusum_changepoint_from_counts,
        densify_counts,
    )

    ev = table(spark, sf_dir, "events")
    e = ev.groupBy(
        F.expr("ts_us div 3600000000").alias("h")
    ).agg(F.count("*").cast("bigint").alias("c"))
    d = densify_counts(e)
    return cusum_changepoint_from_counts(d)


# --------------------------------------------------------------------------
# q250 — conditional entropy of the session transition matrix H(next |
# current) in integer micro-nats: how predictable the next action is.
# Transitions come from ONE lead window per user (ordered by time with
# the event-id tie-break); the transition matrix is vocabulary-sized
# (|event_type|²), marginals broadcast back, and each cell's
# n_xy·ln(n_x/n_xy) floor-quantizes BEFORE the integer sum (the repo's
# quantize-then-sum discipline), normalized by one exact division.
# --------------------------------------------------------------------------


@register(
    "q250_transition_entropy",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS nxt
  FROM events
),
c AS (
  SELECT event_type AS x, nxt AS y, CAST(count(*) AS BIGINT) AS nxy
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
),
mx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx FROM c GROUP BY x),
t AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM c),
cells AS (
  SELECT CAST(floor(1000000.0 * c.nxy
                    * ln(CAST(mx.nx AS DOUBLE) / c.nxy)) AS BIGINT)
           AS contrib
  FROM c JOIN mx USING (x)
)
SELECT t.n AS n_transitions,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_cells,
       CAST((SELECT sum(contrib) FROM cells) // t.n AS BIGINT)
         AS cond_entropy_micro_nats
FROM t
""",
    doc="conditional entropy H(next|current) of the per-user event "
    "transition matrix in integer micro-nats: one lead window per user, "
    "vocabulary-sized transition counts, broadcast marginals, per-cell "
    "floor-quantized n_xy*ln(n_x/n_xy) summed as integers",
    tags=("events", "sessions", "aggregate", "audit"),
)
def q250_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).where(F.col("nxt").isNotNull())
    c = s.groupBy(
        F.col("event_type").alias("x"), F.col("nxt").alias("y")
    ).agg(F.count("*").cast("bigint").alias("nxy"))
    mx = c.groupBy("x").agg(F.sum("nxy").cast("bigint").alias("nx"))
    t = c.agg(F.sum("nxy").cast("bigint").alias("n"))
    cells = c.join(F.broadcast(mx), "x").select(
        F.floor(
            F.lit(1_000_000.0)
            * F.col("nxy")
            * F.log(F.col("nx").cast("double") / F.col("nxy"))
        )
        .cast("bigint")
        .alias("contrib")
    )
    n_cells = c.agg(F.count("*").cast("bigint").alias("n_cells"))
    sc = cells.agg(F.sum("contrib").alias("s"))
    return (
        t.crossJoin(F.broadcast(n_cells))
        .crossJoin(F.broadcast(sc))
        .select(
            F.col("n").alias("n_transitions"),
            "n_cells",
            F.expr("cast(s div n as bigint)").alias(
                "cond_entropy_micro_nats"
            ),
        )
    )


# --------------------------------------------------------------------------
# q251 — inter-rater agreement (Cohen's kappa) between two independent
# rule-based document labelers — the label-quality audit for weak
# supervision: observed agreement corrected for chance, EXACT in parts-
# per-million with no float anywhere (kappa = (N·agree − Σ_k r1_k·r2_k)
# / (N² − Σ_k r1_k·r2_k) — both numerator and denominator exact
# integers from one conditional-aggregate pass). Rater 1 labels by
# character length, rater 2 by whitespace token count.
# --------------------------------------------------------------------------


@register(
    "q251_cohens_kappa_labelers",
    oracle="""
WITH l AS (
  SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS r1,
         CASE WHEN len(string_split(text, ' ')) >= 40 THEN 1 ELSE 0 END
           AS r2
  FROM documents
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT)
           AS agree,
         CAST(sum(r1) AS BIGINT) AS n1,
         CAST(sum(r2) AS BIGINT) AS n2
  FROM l
)
SELECT n, agree,
       CAST((CAST(n AS HUGEINT) * agree - (n1 * n2 + (n - n1) * (n - n2)))
            * 1000000
            // (CAST(n AS HUGEINT) * n - (n1 * n2 + (n - n1) * (n - n2)))
            AS BIGINT) AS kappa_ppm
FROM c
""",
    doc="Cohen's kappa between two rule-based labelers (length vs token "
    "count) exact in ppm: one conditional-aggregate pass for the "
    "agreement and marginal products, pure integer division — the "
    "weak-supervision label-quality audit",
    tags=("llm", "eval", "aggregate", "audit"),
)
def q251_cohens_kappa_labelers(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    l = docs.select(
        F.when(F.col("n_chars") >= 250, 1).otherwise(0).alias("r1"),
        F.when(
            F.size(F.split(F.col("text"), " ")) >= 40, 1
        ).otherwise(0).alias("r2"),
    )
    c = l.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("r1") == F.col("r2"), 1).otherwise(0))
        .cast("bigint")
        .alias("agree"),
        F.sum("r1").cast("bigint").alias("n1"),
        F.sum("r2").cast("bigint").alias("n2"),
    )
    return c.select(
        "n",
        "agree",
        F.expr(
            "cast((cast(n as decimal(38,0)) * agree "
            "- (n1 * n2 + (n - n1) * (n - n2))) * 1000000 "
            "div (cast(n as decimal(38,0)) * n "
            "- (n1 * n2 + (n - n1) * (n - n2))) as bigint)"
        ).alias("kappa_ppm"),
    )


# --------------------------------------------------------------------------
# q253 — RFM segmentation at scale: per-user recency (µs since last
# event), frequency (event count), monetary (purchase cents) quintile-
# scored 1–5 and rolled up to segment counts. The quintile thresholds
# come from the exact rank-selection quantile operator on a CONSTANT
# group (operators/quantiles.py — no value buffer, quantile_cont-
# identical doubles), broadcast back for the bucket CASE; the user
# table is never globally sorted or ntile'd through one task. Higher
# scores are better: frequency/monetary score by value above
# thresholds, recency by value below.
# --------------------------------------------------------------------------


@register(
    "q253_rfm_segments",
    oracle="""
WITH mx AS (SELECT max(epoch_us(ts)) AS m FROM events),
u AS (
  SELECT user_id,
         CAST(mx.m - max(epoch_us(ts)) AS BIGINT) AS recency,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                                THEN CAST(round(value * 100) AS BIGINT)
                                ELSE 0 END), 0) AS BIGINT) AS monetary
  FROM events, mx GROUP BY user_id, mx.m
),
q AS (
  SELECT quantile_cont(recency, [0.2, 0.4, 0.6, 0.8]) AS rq,
         quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fq,
         quantile_cont(monetary, [0.2, 0.4, 0.6, 0.8]) AS mq
  FROM u
),
s AS (
  SELECT CAST(1 + (CASE WHEN u.recency < q.rq[1] THEN 1 ELSE 0 END)
                + (CASE WHEN u.recency < q.rq[2] THEN 1 ELSE 0 END)
                + (CASE WHEN u.recency < q.rq[3] THEN 1 ELSE 0 END)
                + (CASE WHEN u.recency < q.rq[4] THEN 1 ELSE 0 END)
              AS BIGINT) AS r_score,
         CAST(1 + (CASE WHEN u.frequency > q.fq[1] THEN 1 ELSE 0 END)
                + (CASE WHEN u.frequency > q.fq[2] THEN 1 ELSE 0 END)
                + (CASE WHEN u.frequency > q.fq[3] THEN 1 ELSE 0 END)
                + (CASE WHEN u.frequency > q.fq[4] THEN 1 ELSE 0 END)
              AS BIGINT) AS f_score,
         CAST(1 + (CASE WHEN u.monetary > q.mq[1] THEN 1 ELSE 0 END)
                + (CASE WHEN u.monetary > q.mq[2] THEN 1 ELSE 0 END)
                + (CASE WHEN u.monetary > q.mq[3] THEN 1 ELSE 0 END)
                + (CASE WHEN u.monetary > q.mq[4] THEN 1 ELSE 0 END)
              AS BIGINT) AS m_score
  FROM u, q
)
SELECT r_score, f_score, m_score,
       CAST(count(*) AS BIGINT) AS n_users
FROM s GROUP BY r_score, f_score, m_score
""",
    doc="RFM segmentation: per-user recency/frequency/monetary quintile "
    "scores 1-5 from exact rank-selection quantile thresholds "
    "(constant-group, broadcast back — no ntile through one task), "
    "rolled up to (r,f,m) segment counts",
    tags=("events", "aggregate", "ranking", "analytics"),
)
def q253_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.quantiles import (
        group_quantiles_exact,
    )

    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts_us").alias("m"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            (F.first("m") - F.max("ts_us")).cast("bigint").alias("recency"),
            F.count("*").cast("bigint").alias("frequency"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.col("value") * 100).cast("bigint"),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("monetary"),
        )
    )
    # the per-user fold feeds the quantile selection plus the scoring
    # pass — persist it once instead of re-folding events (the dedup.py/
    # windows.py persist discipline), and melt the three metrics into
    # ONE group-quantile selection (group = metric) so all 12 thresholds
    # come from a single multi-pass instead of three serial ones
    u = u.persist()
    qs = {"q20": 0.2, "q40": 0.4, "q60": 0.6, "q80": 0.8}
    melted = u.selectExpr(
        "stack(3, 'r', recency, 'f', frequency, 'm', monetary) "
        "as (metric, v)"
    )
    th = group_quantiles_exact(melted, "metric", "v", qs)
    thresholds = th.agg(
        *[
            F.max(F.when(F.col("metric") == pfx, F.col(k))).alias(
                f"{pfx}_{k}"
            )
            for pfx in ("r", "f", "m")
            for k in qs
        ]
    )
    score = lambda v, pfx, op: sum(  # noqa: E731
        (
            F.when(op(F.col(v), F.col(f"{pfx}_{k}")), 1).otherwise(0)
            for k in ("q40", "q60", "q80")
        ),
        start=F.lit(1)
        + F.when(op(F.col(v), F.col(f"{pfx}_q20")), 1).otherwise(0),
    )
    s = u.crossJoin(F.broadcast(thresholds)).select(
        score("recency", "r", lambda a, b: a < b)
        .cast("bigint")
        .alias("r_score"),
        score("frequency", "f", lambda a, b: a > b)
        .cast("bigint")
        .alias("f_score"),
        score("monetary", "m", lambda a, b: a > b)
        .cast("bigint")
        .alias("m_score"),
    )
    return s.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_users")
    )


# --------------------------------------------------------------------------
# q254 — first-touch vs last-touch revenue attribution: sessions (30-min
# gap, the q231 sessionization) containing a purchase attribute their
# total purchase revenue to (a) the session's first event type and (b)
# the event type immediately preceding the session's FIRST purchase
# ('direct' when the purchase opens the session). All windows ride the
# (user, session) partitioning — bounded groups, one shuffle — and the
# two models publish as one long-format channel table. Revenue in exact
# integer cents.
# --------------------------------------------------------------------------


@register(
    "q254_revenue_attribution",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
x AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
  FROM x
),
r AS (
  SELECT *,
         row_number() OVER ws AS rn,
         first_value(event_type) OVER ws AS first_type,
         lag(event_type) OVER ws AS prev_type
  FROM s WINDOW ws AS (PARTITION BY user_id, sess ORDER BY us, event_id)
),
agg AS (
  SELECT user_id, sess,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
              AS BIGINT) AS rev,
         min(CASE WHEN event_type = 'purchase' THEN rn END) AS first_p
  FROM r GROUP BY user_id, sess
),
conv AS (
  SELECT r.first_type,
         coalesce(r.prev_type, 'direct') AS last_touch,
         a.rev
  FROM r JOIN agg a ON a.user_id = r.user_id AND a.sess = r.sess
                    AND a.first_p = r.rn
  WHERE a.rev > 0
),
lng AS (
  SELECT 'first_touch' AS model, first_type AS channel, rev FROM conv
  UNION ALL
  SELECT 'last_touch' AS model, last_touch AS channel, rev FROM conv
)
SELECT model, channel,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(rev) AS BIGINT) AS rev_cents
FROM lng GROUP BY model, channel
""",
    doc="first-touch vs last-touch revenue attribution over 30-min-gap "
    "sessions: per-session first event type and pre-first-purchase "
    "event type ('direct' when the purchase opens the session), total "
    "purchase cents per channel under both models — all windows on the "
    "bounded (user, session) partitioning",
    tags=("events", "sessions", "analytics", "aggregate"),
)
def q254_revenue_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts_us",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    sess = sessionize(ev, "user_id", "ts_us", 1_800_000_000, "event_id")
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    r = sess.select(
        "user_id",
        "session_id",
        "event_type",
        "cents",
        F.row_number().over(ws).alias("rn"),
        F.first("event_type").over(ws).alias("first_type"),
        F.lag("event_type").over(ws).alias("prev_type"),
    )
    agg = r.groupBy("user_id", "session_id").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents"))
            .otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("rev"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("rn"))
        ).alias("first_p"),
    )
    conv = (
        r.join(
            agg,
            (r.user_id == agg.user_id)
            & (r.session_id == agg.session_id)
            & (agg.first_p == r.rn),
        )
        .where(F.col("rev") > 0)
        .select(
            "first_type",
            F.coalesce(F.col("prev_type"), F.lit("direct")).alias(
                "last_touch"
            ),
            "rev",
        )
    )
    lng = conv.select(
        F.lit("first_touch").alias("model"),
        F.col("first_type").alias("channel"),
        "rev",
    ).unionByName(
        conv.select(
            F.lit("last_touch").alias("model"),
            F.col("last_touch").alias("channel"),
            "rev",
        )
    )
    return lng.groupBy("model", "channel").agg(
        F.count("*").cast("bigint").alias("n_sessions"),
        F.sum("rev").cast("bigint").alias("rev_cents"),
    )


# --------------------------------------------------------------------------
# q255 — out-of-fold target encoding of event_type against purchase
# cents: the leakage-safe categorical encoder. Rows hash-split into 5
# folds (md5 on event_id); the encoding a fold-k row would receive is
# the mean target over the OTHER four folds, computed leave-one-fold-
# out from the (type, fold) partial-sum table — sums and counts fold
# once, the totals broadcast back, and each cell's encoding is one
# exact integer floor division to micro-cents. Output is the bounded
# (event_type, fold) encoding table itself: |types|×5 rows at any
# corpus size, with no per-row re-aggregation anywhere.
# --------------------------------------------------------------------------


@register(
    "q255_oof_target_encoding",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
              % 5 AS BIGINT) AS fold,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
pf AS (
  SELECT event_type, fold,
         CAST(sum(cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM e GROUP BY event_type, fold
),
t AS (
  SELECT event_type, CAST(sum(s) AS BIGINT) AS st, CAST(sum(c) AS BIGINT) AS ct
  FROM pf GROUP BY event_type
)
SELECT pf.event_type, pf.fold,
       CAST(pf.c AS BIGINT) AS n_rows,
       CAST((t.st - pf.s) * 1000000 // (t.ct - pf.c) AS BIGINT)
         AS encoding_micro_cents
FROM pf JOIN t USING (event_type)
WHERE t.ct > pf.c
""",
    doc="out-of-fold target encoding (event_type -> mean purchase cents "
    "over the other 4 md5 folds): one (type, fold) partial-sum fold, "
    "broadcast totals, leave-one-fold-out by exact subtraction and one "
    "integer floor division to micro-cents — the leakage-safe encoder "
    "as a bounded encoding table",
    tags=("events", "aggregate", "eval", "sampling"),
)
def q255_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        (
            F.conv(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    pf = e.groupBy("event_type", "fold").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count("*").cast("bigint").alias("c"),
    )
    t = pf.groupBy("event_type").agg(
        F.sum("s").cast("bigint").alias("st"),
        F.sum("c").cast("bigint").alias("ct"),
    )
    return (
        pf.join(F.broadcast(t), "event_type")
        .where(F.col("ct") > F.col("c"))
        .select(
            "event_type",
            "fold",
            F.col("c").alias("n_rows"),
            F.expr(
                "cast((st - s) * 1000000 div (ct - c) as bigint)"
            ).alias("encoding_micro_cents"),
        )
    )


# --------------------------------------------------------------------------
# q258 — spatial radius join via geo-cell bucketing: users get
# deterministic md5-derived positions (integer micro-degrees in a ~±0.5°
# box around 45°N), and the join finds ALL user pairs within the radius
# WITHOUT an all-pairs pass.  Longitudes scale to the local metric FIRST
# (slon = lon·707 div 1000, cos 45° ≈ 0.707 — per-point, exact integer,
# no trig at runtime), so the distance Δlat² + Δslon² is isotropic in
# (lat, slon) space; each point then lands in one grid cell of the
# radius size in THAT space, which is what makes the 3×3 neighbor-cell
# equi-join (a 9-row broadcast offset table) provably complete — any
# in-radius pair differs by ≤ 1 cell on each axis.  (Bucketing raw lon
# would under-cover: the radius spans 1/0.707 ≈ 1.41 lon cells.)  The
# standard scale-safe spatial-join shape: cell partitioning bounds
# candidates exactly like the band/LSH joins.
# --------------------------------------------------------------------------

_GEO_CELL = 18000  # micro-degrees ≈ 2 km at 45°N (the radius)
_GEO_R2 = 18000 * 18000  # squared radius threshold in micro-deg²


@register(
    "q258_spatial_radius_join",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT
              % 1000000 - 500000 AS BIGINT) AS lat,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 7, 6))::BIGINT
              % 1000000 - 500000 AS BIGINT) AS lon
  FROM (SELECT DISTINCT user_id FROM events)
),
c AS (
  SELECT user_id, lat, lon * 707 // 1000 AS slon,
         CAST(floor(lat / {_GEO_CELL}.0) AS BIGINT) AS cx,
         CAST(floor((lon * 707 // 1000) / {_GEO_CELL}.0) AS BIGINT) AS cy
  FROM u
),
off(dx, dy) AS (
  VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
),
cand AS (
  SELECT a.user_id AS ua, b.user_id AS ub,
         a.lat - b.lat AS dlat, a.slon - b.slon AS dslon
  FROM c a
  JOIN off o ON TRUE
  JOIN c b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
  WHERE a.user_id < b.user_id
),
pairs AS (
  SELECT ua, ub
  FROM cand
  WHERE dlat * dlat + dslon * dslon <= {_GEO_R2}
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT ua) AS BIGINT) AS n_left_users,
       CAST(coalesce(min(ua), -1) AS BIGINT) AS min_user
FROM pairs
""",
    doc="spatial radius join (~2 km) over md5-derived user positions: "
    "one grid cell per point at radius size, 3x3 neighbor-cell equi-"
    "join from a 9-row broadcast offset table, exact integer "
    "equirectangular distance verify (no runtime trig) — the cell-"
    "bucketed spatial-join shape, candidates bounded like band/LSH",
    tags=("events", "join", "spatial", "dedup"),
)
def q258_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct().select(
        "user_id",
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 6),
                16,
                10,
            ).cast("bigint")
            % 1_000_000
            - 500_000
        ).alias("lat"),
        (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 7, 6),
                16,
                10,
            ).cast("bigint")
            % 1_000_000
            - 500_000
        ).alias("lon"),
    )
    # scale lon to the local metric BEFORE bucketing (integer truncating
    # division — DuckDB's integer // and Spark's div agree, verified),
    # so cells are radius-sized in the same space the verifier measures
    c = u.select(
        "user_id",
        "lat",
        F.expr("lon * 707 div 1000").alias("slon"),
        F.floor(F.col("lat") / _GEO_CELL).cast("bigint").alias("cx"),
        F.floor(F.expr("lon * 707 div 1000") / _GEO_CELL)
        .cast("bigint")
        .alias("cy"),
    )
    off = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
            "dx bigint, dy bigint",
        )
    )
    a = c.select(
        F.col("user_id").alias("ua"),
        F.col("lat").alias("la"),
        F.col("slon").alias("sla"),
        "cx",
        "cy",
    ).crossJoin(off)
    b = c.select(
        F.col("user_id").alias("ub"),
        F.col("lat").alias("lb"),
        F.col("slon").alias("slb"),
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    )
    cand = a.join(
        b,
        (b.bx == a.cx + a.dx) & (b.by == a.cy + a.dy) & (a.ua < b.ub),
    ).select(
        "ua",
        "ub",
        (F.col("la") - F.col("lb")).alias("dlat"),
        (F.col("sla") - F.col("slb")).alias("dslon"),
    )
    pairs = cand.where(
        F.col("dlat") * F.col("dlat") + F.col("dslon") * F.col("dslon")
        <= F.lit(_GEO_R2)
    )
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.count_distinct("ua").cast("bigint").alias("n_left_users"),
        F.coalesce(F.min("ua"), F.lit(-1)).cast("bigint").alias("min_user"),
    )


# --------------------------------------------------------------------------
# q259 — MRR and hit-rate@10 of per-user event feeds against purchase
# relevance: the retrieval-eval pair NDCG (q237) doesn't cover. Each
# user's feed ranks by time (event-id tie-break); the first purchase
# position gives the reciprocal rank — quantized per user to exact
# integer micro-units (10⁶ div rank) BEFORE the mean, so the corpus
# aggregate is one integer fold. Hit@10 is a windowed min-position
# threshold. Per-user windows ride bounded groups; no global ordering.
# --------------------------------------------------------------------------


@register(
    "q259_mrr_hit_rate",
    oracle="""
WITH f AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS pos
  FROM events
),
fp AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'purchase' THEN pos END) AS first_p
  FROM f GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN first_p IS NOT NULL
                     THEN 1000000 // first_p ELSE 0 END)
            // count(*) AS BIGINT) AS mrr_micro,
       CAST(sum(CASE WHEN first_p <= 10 THEN 1 ELSE 0 END) * 1000
            // count(*) AS BIGINT) AS hit10_permille
FROM fp
""",
    doc="MRR and hit-rate@10 of per-user feeds vs purchase relevance: "
    "per-user reciprocal rank quantized to integer micro-units before "
    "the mean (one integer fold), hit@10 from the min purchase "
    "position — bounded per-user windows, no global ordering",
    tags=("events", "eval", "ranking"),
)
def q259_mrr_hit_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    f = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("pos")
    )
    fp = f.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("pos"))
        ).alias("first_p")
    )
    return fp.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.expr(
            "cast(sum(case when first_p is not null "
            "then 1000000 div first_p else 0 end) div count(*) as bigint)"
        ).alias("mrr_micro"),
        F.expr(
            "cast(sum(case when first_p <= 10 then 1 else 0 end) * 1000 "
            "div count(*) as bigint)"
        ).alias("hit10_permille"),
    )


# --------------------------------------------------------------------------
# q265 — cross-correlation between the hourly purchase-count and
# error-count series at lags 0, ±1, ±3, ±6: the lead–lag detector
# ("do errors precede purchase dips?"). Both series ride ONE corpus
# fold to a (hour, purchases, errors) table densified over the shared
# spine; each lag is an equi-self-join of that bounded table (purchase
# at h vs error at h+lag), and each CCF value is Pearson from five
# exact DECIMAL(38,0) moments (the q214/q248 discipline). Negative
# lags mean errors lead.
# --------------------------------------------------------------------------


@register(
    "q265_purchase_error_ccf",
    oracle="""
WITH e AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS x
  FROM events GROUP BY 1
),
r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
spine AS (
  SELECT CAST(t.h AS BIGINT) AS h
  FROM r, LATERAL unnest(generate_series(r.h0, r.h1)) t(h)
),
d AS (
  SELECT spine.h, CAST(coalesce(e.p, 0) AS BIGINT) AS p,
         CAST(coalesce(e.x, 0) AS BIGINT) AS x
  FROM spine LEFT JOIN e ON e.h = spine.h
),
lags(lag) AS (VALUES (-6), (-3), (-1), (0), (1), (3), (6)),
pr AS (
  SELECT l.lag, a.p AS pv, b.x AS xv
  FROM lags l
  JOIN d a ON TRUE
  JOIN d b ON b.h = a.h + l.lag
),
m AS (
  SELECT lag,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(pv) AS DECIMAL(38,0)) AS sx,
         CAST(sum(xv) AS DECIMAL(38,0)) AS sy,
         CAST(sum(pv * xv) AS DECIMAL(38,0)) AS sxy,
         CAST(sum(pv * pv) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(xv * xv) AS DECIMAL(38,0)) AS syy
  FROM pr GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS ccf
FROM m
""",
    doc="cross-correlation of hourly purchase vs error counts at lags "
    "0/±1/±3/±6 (negative lag = errors lead): one fold to the densified "
    "(hour, purchases, errors) table, per-lag bounded self-joins, "
    "Pearson from exact DECIMAL(38,0) moments",
    tags=("events", "timeseries", "aggregate"),
)
def q265_purchase_error_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    e = ev.groupBy(F.expr("ts_us div 3600000000").alias("h")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .cast("bigint")
        .alias("p"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    r = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = r.select(
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
    )
    d = spine.join(e, "h", "left").select(
        "h",
        F.coalesce(F.col("p"), F.lit(0)).cast("bigint").alias("p"),
        F.coalesce(F.col("x"), F.lit(0)).cast("bigint").alias("x"),
    )
    lags = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(-6,), (-3,), (-1,), (0,), (1,), (3,), (6,)], "lag bigint"
        )
    )
    a = d.select(F.col("h").alias("ha"), F.col("p").alias("pv"))
    b = d.select(F.col("h").alias("hb"), F.col("x").alias("xv"))
    pr = a.crossJoin(lags).join(b, F.col("hb") == F.col("ha") + F.col("lag"))
    dec38 = "decimal(38,0)"
    m = pr.groupBy("lag").agg(
        F.count(F.lit(1)).cast(dec38).alias("n"),
        F.sum("pv").cast(dec38).alias("sx"),
        F.sum("xv").cast(dec38).alias("sy"),
        F.sum(F.col("pv") * F.col("xv")).cast(dec38).alias("sxy"),
        F.sum(F.col("pv") * F.col("pv")).cast(dec38).alias("sxx"),
        F.sum(F.col("xv") * F.col("xv")).cast(dec38).alias("syy"),
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        (
            F.expr("cast(n * sxy - sx * sy as double)")
            / (
                F.sqrt(F.expr("cast(n * sxx - sx * sx as double)"))
                * F.sqrt(F.expr("cast(n * syy - sy * sy as double)"))
            )
        ).alias("ccf"),
    )


# --------------------------------------------------------------------------
# q266 — session entry/exit analysis with bounce rate: per event type,
# how often it opens a session, how often it closes one, and the
# corpus-level bounce share (single-event sessions) — the web-analytics
# landing/exit readout over the standard 30-min sessionization. First/
# last flags come from one row_number pair under the (user, session)
# windows (bounded groups, one shuffle); the rollup is vocabulary-sized.
# --------------------------------------------------------------------------


@register(
    "q266_session_entry_exit",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
x AS (
  SELECT *, CASE WHEN lag(us) OVER w IS NULL
                   OR us - lag(us) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess
  FROM x
),
rr AS (
  SELECT user_id, sess, event_type,
         row_number() OVER ws AS rn,
         count(*) OVER (PARTITION BY user_id, sess) AS slen
  FROM s WINDOW ws AS (PARTITION BY user_id, sess ORDER BY us, event_id)
),
agg AS (
  SELECT event_type,
         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_entries,
         CAST(sum(CASE WHEN rn = slen THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exits,
         CAST(sum(CASE WHEN rn = 1 AND slen = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_bounces
  FROM rr GROUP BY event_type
)
SELECT event_type, n_entries, n_exits, n_bounces,
       CAST(CASE WHEN n_entries > 0
                 THEN n_bounces * 1000 // n_entries ELSE 0 END AS BIGINT)
         AS bounce_permille
FROM agg
""",
    doc="session entry/exit/bounce analysis per event type over 30-min "
    "sessions: first/last flags from one row_number + count pair under "
    "bounded (user, session) windows, vocabulary-sized rollup with "
    "bounce rate in integer permille",
    tags=("events", "sessions", "analytics", "aggregate"),
)
def q266_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    sess = sessionize(ev, "user_id", "ts_us", 1_800_000_000, "event_id")
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts_us", "event_id"
    )
    wc = Window.partitionBy("user_id", "session_id")
    rr = sess.select(
        "event_type",
        F.row_number().over(ws).alias("rn"),
        F.count("*").over(wc).alias("slen"),
    )
    agg = rr.groupBy("event_type").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_entries"),
        F.sum(F.when(F.col("rn") == F.col("slen"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_exits"),
        F.sum(
            F.when((F.col("rn") == 1) & (F.col("slen") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_bounces"),
    )
    return agg.select(
        "event_type",
        "n_entries",
        "n_exits",
        "n_bounces",
        F.expr(
            "cast(case when n_entries > 0 "
            "then n_bounces * 1000 div n_entries else 0 end as bigint)"
        ).alias("bounce_permille"),
    )


# --------------------------------------------------------------------------
# q269 — ML lag-feature generation: per (user, event) row, the previous
# two purchase values and the trailing 3-event mean — the standard
# supervised-learning feature prep — all from ONE window partitioning
# (user, ordered by time with the event-id tie-break), values in exact
# integer cents so the features are engine-portable. Output is the
# bounded per-user-tail sample: each user's LAST feature row (the row
# that would feed a serving-time prediction), so the result stays
# |users|-sized while every window computation still runs corpus-wide.
# --------------------------------------------------------------------------


@register(
    "q269_lag_features",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
f AS (
  SELECT user_id, us, event_id, cents,
         lag(cents, 1) OVER w AS lag1,
         lag(cents, 2) OVER w AS lag2,
         CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS sum3,
         CAST(count(*) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cnt3,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY us DESC, event_id DESC) AS rdesc
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT user_id, cents,
       CAST(coalesce(lag1, -1) AS BIGINT) AS lag1_cents,
       CAST(coalesce(lag2, -1) AS BIGINT) AS lag2_cents,
       CAST(sum3 * 100 // cnt3 AS BIGINT) AS mean3_centicents
FROM f WHERE rdesc = 1
""",
    doc="ML lag-feature prep per purchase row (prev two purchase cents, "
    "trailing 3-event mean in exact centi-cents) from one (user, time) "
    "window partitioning; publishes each user's latest feature row "
    "(serving-time shape, |users|-sized output)",
    tags=("events", "windows", "analytics", "eval"),
)
def q269_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        "ts_us",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    w3 = w.rowsBetween(-2, 0)
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    f = ev.select(
        "user_id",
        "cents",
        F.lag("cents", 1).over(w).alias("lag1"),
        F.lag("cents", 2).over(w).alias("lag2"),
        F.sum("cents").over(w3).cast("bigint").alias("sum3"),
        F.count("*").over(w3).cast("bigint").alias("cnt3"),
        F.row_number().over(wd).alias("rdesc"),
    )
    return f.where(F.col("rdesc") == 1).select(
        "user_id",
        "cents",
        F.coalesce(F.col("lag1"), F.lit(-1))
        .cast("bigint")
        .alias("lag1_cents"),
        F.coalesce(F.col("lag2"), F.lit(-1))
        .cast("bigint")
        .alias("lag2_cents"),
        F.expr("cast(sum3 * 100 div cnt3 as bigint)").alias(
            "mean3_centicents"
        ),
    )


# --------------------------------------------------------------------------
# q271 — exact per-day activity coverage (interval-union length): the
# seconds of each UTC day covered by at least one active session,
# counting overlaps once — the SLA/uptime primitive, and the classic
# hard-SQL interval-union problem. Sessions (30-min gap) clip to day
# boundaries (a bounded per-interval day explode), so every day's
# boundary deltas sum to zero and ONE global range-partitioned prefix
# sum gives the running concurrency with per-day resets for free; each
# boundary's segment to the next same-day boundary (rank self-join on
# the same prefix layer — no global window) contributes its length
# exactly when concurrency stays positive.
# --------------------------------------------------------------------------


@register(
    "q271_daily_uptime_union",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
x AS (
  SELECT user_id, us, event_id,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, us,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM x
),
iv AS (
  SELECT user_id, sess, min(us) AS a, max(us) + 1 AS b
  FROM s GROUP BY user_id, sess
),
clipped AS (
  SELECT greatest(iv.a, d.day * 86400000000) AS a,
         least(iv.b, (d.day + 1) * 86400000000) AS b,
         d.day, iv.user_id, iv.sess
  FROM iv, LATERAL unnest(generate_series(iv.a // 86400000000,
                                          (iv.b - 1) // 86400000000))
           d(day)
),
p AS (
  SELECT day, a AS ts, 1 AS delta, user_id, sess FROM clipped
  UNION ALL
  SELECT day, b AS ts, -1 AS delta, user_id, sess FROM clipped
),
c AS (
  SELECT day, ts,
         sum(delta) OVER (PARTITION BY day
                          ORDER BY ts, delta, user_id, sess
                          ROWS UNBOUNDED PRECEDING) AS conc,
         lead(ts) OVER (PARTITION BY day
                        ORDER BY ts, delta, user_id, sess) AS nxt
  FROM p
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(coalesce(sum(CASE WHEN conc > 0 THEN nxt - ts END), 0)
            // 1000000 AS BIGINT) AS covered_seconds
FROM c GROUP BY day ORDER BY day
""",
    doc="exact per-day session-union coverage (seconds of each UTC day "
    "with >=1 active session, overlaps counted once): day-clipped "
    "sweep-line — one global range-partitioned prefix sum (per-day "
    "deltas net to zero so days reset for free) + a rank self-join for "
    "segment lengths, no single-task global window",
    tags=("events", "sessions", "timeseries", "ranking"),
)
def q271_daily_uptime_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.ranking import (
        exclusive_prefix_sums,
    )

    ev = table(spark, sf_dir, "events").select(
        "user_id", "ts_us", "event_id"
    )
    sess = sessionize(ev, "user_id", "ts_us", 1_800_000_000, "event_id")
    iv = sess.groupBy("user_id", "session_id").agg(
        F.min("ts_us").alias("a"), (F.max("ts_us") + 1).alias("b")
    )
    day_us = 86_400_000_000
    clipped = iv.select(
        "user_id",
        "session_id",
        "a",
        "b",
        F.explode(
            F.sequence(
                F.expr(f"a div {day_us}"), F.expr(f"(b - 1) div {day_us}")
            )
        ).alias("day"),
    ).select(
        "user_id",
        "session_id",
        "day",
        F.greatest(F.col("a"), F.col("day") * day_us).alias("ca"),
        F.least(F.col("b"), (F.col("day") + 1) * day_us).alias("cb"),
    )
    pts = clipped.select(
        "day",
        F.col("ca").alias("ts"),
        F.lit(1).cast("bigint").alias("delta"),
        "user_id",
        "session_id",
    ).unionByName(
        clipped.select(
            "day",
            F.col("cb").alias("ts"),
            F.lit(-1).cast("bigint").alias("delta"),
            "user_id",
            "session_id",
        )
    ).withColumn("one", F.lit(1).cast("bigint"))
    pre = exclusive_prefix_sums(
        pts,
        ["day", "ts", "delta", "user_id", "session_id"],
        ["delta", "one"],
    ).select(
        "day",
        "ts",
        (F.col("delta_before") + F.col("delta")).alias("conc"),
        (F.col("one_before") + F.col("one")).alias("rk"),
    )
    nxt = pre.select(
        F.col("day").alias("nday"),
        F.col("ts").alias("nts"),
        (F.col("rk") - 1).alias("prk"),
    )
    seg = pre.join(
        nxt, (pre.rk == nxt.prk) & (pre.day == nxt.nday)
    ).select(
        "day",
        F.when(F.col("conc") > 0, F.col("nts") - F.col("ts"))
        .otherwise(F.lit(0))
        .alias("len"),
    )
    days = pts.select("day").distinct()
    return (
        days.join(
            seg.groupBy("day").agg(
                F.expr("cast(sum(len) div 1000000 as bigint)").alias(
                    "covered_seconds"
                )
            ),
            "day",
            "left",
        )
        .select(
            F.col("day").cast("bigint").alias("day"),
            F.coalesce(F.col("covered_seconds"), F.lit(0))
            .cast("bigint")
            .alias("covered_seconds"),
        )
    )


# --------------------------------------------------------------------------
# q272 — metrics-layer materialization: the (event_type × UTC day)
# metrics table a semantic layer would publish — count, exact money
# sum, min/max, AND the exact p50 — in two bounded passes: one
# conditional-aggregate fold for the additive metrics, one composite-
# group rank-selection pass (operators/quantiles.py on the type⊗day
# key) for the median, joined on the composite key. Medians per group
# without any per-group buffer, additive metrics map-side combinable —
# the dashboard-backing rollup shape at any scale.
# --------------------------------------------------------------------------


@register(
    "q272_metrics_layer",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'click')
),
add_m AS (
  SELECT event_type, day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS total_cents,
         CAST(min(cents) AS BIGINT) AS min_cents,
         CAST(max(cents) AS BIGINT) AS max_cents
  FROM e GROUP BY event_type, day
),
med AS (
  SELECT event_type, day,
         quantile_cont(cents, 0.5) AS p50_cents
  FROM e GROUP BY event_type, day
)
SELECT a.event_type, CAST(a.day AS BIGINT) AS day,
       a.n, a.total_cents, a.min_cents, a.max_cents,
       m.p50_cents
FROM add_m a JOIN med m USING (event_type, day)
""",
    doc="metrics-layer rollup per (event_type, UTC day): additive "
    "metrics from one map-side-combinable fold, exact p50 from one "
    "composite-group rank selection (no per-group buffer), joined on "
    "the composite key — the dashboard-backing shape",
    tags=("events", "aggregate", "ranking", "analytics"),
)
def q272_metrics_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.quantiles import (
        group_quantiles_exact,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    e = ev.select(
        "event_type",
        F.expr("ts_us div 86400000000").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).withColumn(
        "gkey", F.concat_ws("|", "event_type", F.col("day").cast("string"))
    )
    add_m = e.groupBy("event_type", "day").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
    )
    med = group_quantiles_exact(e, "gkey", "cents", {"p50_cents": 0.5})
    med = med.select(
        F.split("gkey", "\\|").getItem(0).alias("event_type"),
        F.split("gkey", "\\|").getItem(1).cast("bigint").alias("day"),
        "p50_cents",
    )
    return add_m.join(med, ["event_type", "day"]).select(
        "event_type",
        F.col("day").cast("bigint").alias("day"),
        "n",
        "total_cents",
        "min_cents",
        "max_cents",
        "p50_cents",
    )


# --------------------------------------------------------------------------
# q273 — quantile treatment effect: the p25/p50/p75 of purchase value
# per md5 A/B arm and the per-quantile differences — where an average
# treatment effect hides heterogeneity, the QTE shows which part of
# the distribution moved. Both arms' quantiles come from ONE composite-
# group rank selection (arm is the group key, no per-group buffer);
# the effect row is a self-join of the two-arm table. quantile_cont-
# identical interpolation makes the float differences engine-portable.
# --------------------------------------------------------------------------


@register(
    "q273_quantile_treatment_effect",
    oracle="""
WITH u AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
q AS (
  SELECT arm,
         quantile_cont(cents, 0.25) AS p25,
         quantile_cont(cents, 0.5) AS p50,
         quantile_cont(cents, 0.75) AS p75
  FROM u GROUP BY arm
)
SELECT a.p25 AS a_p25, a.p50 AS a_p50, a.p75 AS a_p75,
       b.p25 AS b_p25, b.p50 AS b_p50, b.p75 AS b_p75,
       b.p25 - a.p25 AS qte_p25,
       b.p50 - a.p50 AS qte_p50,
       b.p75 - a.p75 AS qte_p75
FROM q a JOIN q b ON a.arm = 'A' AND b.arm = 'B'
""",
    doc="quantile treatment effect across the md5 A/B split: p25/p50/p75 "
    "of purchase cents per arm from one composite-group rank selection "
    "(quantile_cont-identical interpolation), per-quantile differences "
    "— distributional effect where the mean hides heterogeneity",
    tags=("events", "eval", "ranking", "aggregate"),
)
def q273_quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cassandra_analytics_example_spark.operators.quantiles import (
        group_quantiles_exact,
    )

    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    u = ev.select(
        F.when(
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("arm"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    q = group_quantiles_exact(
        u, "arm", "cents", {"p25": 0.25, "p50": 0.5, "p75": 0.75}
    )
    a = q.where(F.col("arm") == "A").select(
        F.col("p25").alias("a_p25"),
        F.col("p50").alias("a_p50"),
        F.col("p75").alias("a_p75"),
    )
    b = q.where(F.col("arm") == "B").select(
        F.col("p25").alias("b_p25"),
        F.col("p50").alias("b_p50"),
        F.col("p75").alias("b_p75"),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "a_p25",
        "a_p50",
        "a_p75",
        "b_p25",
        "b_p50",
        "b_p75",
        (F.col("b_p25") - F.col("a_p25")).alias("qte_p25"),
        (F.col("b_p50") - F.col("a_p50")).alias("qte_p50"),
        (F.col("b_p75") - F.col("a_p75")).alias("qte_p75"),
    )


# --------------------------------------------------------------------------
# q275 — per-slice distribution drift: the exact two-sample KS distance
# between the first and second time-half value distributions, PER EVENT
# TYPE — the "which slice drifted" monitoring table the global q246
# can't give. Grouped KS rides the grouped prefix operator (group key
# in the range partitioning and both window layers), so any number of
# slices of any size runs without a per-slice buffer; the gap algebra
# stays pure integer cross-multiplication.
# --------------------------------------------------------------------------


@register(
    "q275_ks_drift_by_type",
    oracle="""
WITH b AS (
  SELECT event_type, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
mp AS (SELECT (min(us) + max(us)) // 2 AS mid FROM b),
e AS (SELECT event_type, v,
             CASE WHEN us >= mp.mid THEN 1 ELSE 0 END AS grp
      FROM b, mp WHERE v IS NOT NULL),
g AS (
  SELECT event_type, v,
         CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(grp) AS BIGINT) AS nb
  FROM e GROUP BY event_type, v
),
c AS (
  SELECT event_type, v,
         sum(na) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS ca,
         sum(nb) OVER (PARTITION BY event_type ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cb
  FROM g
),
t AS (
  SELECT event_type, CAST(sum(na) AS BIGINT) AS n_a,
         CAST(sum(nb) AS BIGINT) AS n_b
  FROM g GROUP BY event_type
),
gap AS (
  SELECT c.event_type, t.n_a, t.n_b,
         abs(CAST(c.ca AS HUGEINT) * t.n_b
             - CAST(c.cb AS HUGEINT) * t.n_a) AS gp
  FROM c JOIN t USING (event_type)
)
SELECT event_type, n_a, n_b,
       CAST(max(gp) * 1000000 // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
         AS d_ppm
FROM gap WHERE n_a > 0 AND n_b > 0
GROUP BY event_type, n_a, n_b
""",
    doc="per-event-type two-sample KS drift (ppm) between time halves: "
    "grouped prefix cumulative layer (no per-slice buffer), integer "
    "cross-multiplied ECDF gaps — the which-slice-drifted monitor",
    tags=("events", "aggregate", "ranking", "audit"),
)
def q275_ks_drift_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        ks_grouped,
    )

    ev = table(spark, sf_dir, "events")
    mp = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid"))
    sample = ev.crossJoin(F.broadcast(mp)).select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
        F.when(F.col("ts_us") >= F.col("mid"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("grp"),
    )
    return ks_grouped(sample, "event_type", "v", "grp")


# --------------------------------------------------------------------------
# q277 — cohort survival curves: Kaplan–Meier lifetime tables per
# signup-week cohort (first-event week), the retention analysis that
# shows WHICH cohort's users churn faster. Same estimator and
# quantize-then-integer-sum discipline as q236, with both prefix
# layers on the grouped prefix operator so any number of cohorts of
# any size runs without a per-cohort buffer (operators/rankstats.py:
# kaplan_meier_grouped). Churn horizon 12 h (the fixture cadence).
# --------------------------------------------------------------------------


@register(
    "q277_cohort_survival",
    oracle="""
WITH u AS (
  SELECT user_id, epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l
  FROM events GROUP BY user_id
),
mx AS (SELECT max(l) AS m FROM u),
d AS (
  SELECT f // 604800000000 AS cohort_week,
         (l - f) // 86400000000 AS t,
         CASE WHEN l <= mx.m - 43200000000 THEN 1 ELSE 0 END AS ev
  FROM u, mx WHERE l IS NOT NULL
),
g AS (
  SELECT cohort_week, t, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ev) AS BIGINT) AS n_events
  FROM d GROUP BY cohort_week, t
),
p AS (
  SELECT cohort_week, t, n, n_events, n - n_events AS n_censored,
         sum(n) OVER (PARTITION BY cohort_week) -
           coalesce(sum(n) OVER (PARTITION BY cohort_week ORDER BY t
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS n_risk
  FROM g
),
s AS (
  SELECT cohort_week, t, n_risk, n_events, n_censored,
         CASE WHEN n_events > 0 AND n_events < n_risk
              THEN CAST(floor(1000000000.0
                              * ln(CAST(n_risk - n_events AS DOUBLE)
                                   / CAST(n_risk AS DOUBLE))) AS BIGINT)
              ELSE 0 END AS step,
         CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END AS dead
  FROM p
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(t AS BIGINT) AS t,
       CAST(n_risk AS BIGINT) AS n_risk, n_events, n_censored,
       CAST(CASE WHEN max(dead) OVER (PARTITION BY cohort_week ORDER BY t
                                      ROWS UNBOUNDED PRECEDING) = 1
                 THEN NULL
                 ELSE sum(step) OVER (PARTITION BY cohort_week ORDER BY t
                                      ROWS UNBOUNDED PRECEDING)
            END AS BIGINT) AS log_s_nano
FROM s WHERE n_events > 0
""",
    doc="Kaplan-Meier survival tables per signup-week cohort (12h churn "
    "horizon): both at-risk and cumulative log-survival layers on the "
    "grouped prefix operator - any number of cohorts without a "
    "per-cohort buffer; NULL log-S after cohort extinction",
    tags=("events", "aggregate", "ranking", "audit", "analytics"),
)
def q277_cohort_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        kaplan_meier_grouped,
    )

    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min("ts_us").alias("f"), F.max("ts_us").alias("l")
    )
    mx = u.agg(F.max("l").alias("m"))
    d = u.crossJoin(F.broadcast(mx)).select(
        F.expr("f div 604800000000").cast("bigint").alias("cohort_week"),
        F.expr("(l - f) div 86400000000").cast("bigint").alias("t"),
        F.when(F.col("l") <= F.col("m") - F.lit(43_200_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("ev"),
    )
    return kaplan_meier_grouped(d, "cohort_week", "t", "ev")


# --------------------------------------------------------------------------
# q278 — per-slice CUSUM changepoints: the hour each EVENT TYPE's
# volume regime shifted most, with the peak deviation — the which-
# slice-changed companion to the global q249. Every type shares one
# dense hour spine (from the global bounds, so slices are comparable),
# and the per-type running sums ride the grouped prefix operator with
# the same exact scaled-integer algebra — any number of slices without
# a per-slice buffer.
# --------------------------------------------------------------------------


@register(
    "q278_cusum_by_type",
    oracle="""
WITH e AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS c
  FROM events GROUP BY 1, 2
),
r AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
types AS (SELECT DISTINCT event_type FROM e),
spine AS (
  SELECT types.event_type, CAST(t.h AS BIGINT) AS h
  FROM types, r, LATERAL unnest(generate_series(r.h0, r.h1)) t(h)
),
d AS (
  SELECT spine.event_type, spine.h,
         CAST(coalesce(e.c, 0) AS BIGINT) AS c
  FROM spine LEFT JOIN e
    ON e.event_type = spine.event_type AND e.h = spine.h
),
t AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS total
  FROM d GROUP BY event_type
),
cu AS (
  SELECT d.event_type, d.h, t.n, t.total,
         sum(t.n * d.c - t.total)
           OVER (PARTITION BY d.event_type ORDER BY d.h
                 ROWS UNBOUNDED PRECEDING) AS s
  FROM d JOIN t USING (event_type)
),
m AS (SELECT event_type, max(abs(s)) AS peak FROM cu GROUP BY event_type)
SELECT cu.event_type,
       t.n AS n_hours, t.total AS n_events,
       CAST(min(cu.h) AS BIGINT) AS change_at_hour,
       CAST(m.peak * 1000000 // t.n AS BIGINT) AS peak_micro_events
FROM cu JOIN m USING (event_type) JOIN t USING (event_type)
WHERE abs(cu.s) = m.peak
GROUP BY cu.event_type, t.n, t.total, m.peak
""",
    doc="per-event-type CUSUM changepoint over a shared dense hour "
    "spine: grouped prefix running sums (no per-slice buffer), exact "
    "scaled-integer deviations, earliest argmax hour and micro-event "
    "peak per type",
    tags=("events", "timeseries", "ranking", "audit"),
)
def q278_cusum_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.operators.rankstats import (
        cusum_grouped_from_counts,
    )

    ev = table(spark, sf_dir, "events")
    e = ev.groupBy(
        "event_type", F.expr("ts_us div 3600000000").alias("h")
    ).agg(F.count("*").cast("bigint").alias("c"))
    r = e.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    types = e.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(r)).select(
        "event_type",
        F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
    )
    d = spine.join(e, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("c"),
    )
    return cusum_grouped_from_counts(d, "event_type")
