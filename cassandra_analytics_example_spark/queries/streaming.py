"""Streaming queries registered in the driver contract.

Structured Streaming MECHANICS aren't ANSI-SQL-expressible (watermarks,
session-window merging, stateful dedup), so most entries register WITHOUT
oracles — the driver records rows-only checks, and the deterministic batch
twins (q15/q16/q17 in queries/events) carry the value-level correctness
gate for the same logic. EXCEPTION (round 11): merge-on-read store
maintainers whose PUBLISHED table is a deterministic fold of the full
input (s12 count-min cells, s15 HLL registers, s16 hourly anomaly flags,
s17 chunk refcount histogram) register WITH a value oracle — the driver
then hash-checks the store the stream actually built, upgrading those
entries from rows-only to the full three-gate class. s16/s17 reference
their batch twins' oracle strings (q144/q155) from the registry, so the
twin pairs cannot drift; the import of the events/llm packages below
guarantees those registrations exist first (matching load_all's module
order). Round 12 extended the class to s18–s21, s23–s25 and s27–s30;
round 13 closed the r12 upgrade audit and went two further: s01/s02/s05
(exact-decimal / epoch-µs publishes), s03/s07 (per-type survivor-count
folds), s04 (exact-cents state + final-state publish), s06 (epoch-µs
join publish), s08 (struct-min fold), s09 (upsert counts — the same
countDistinct fold as s03, the r12 audit undervalued it), s10 (stateless
segment join — a pure function of the input, batch-exact under any
microbatch split), s13 (fixture-constant corrupt accounting), s14 (the
staged two-batch routing is a closed form once the batch PLAN is pinned
— which the runner stages and now asserts) and s22 (outer-join emission
is the twin's closed form under one-batch arrival, where the
finalization watermark is global-max − 2h) — 28 of 30 oracled.

Entries whose oracle rests on a PINNED BATCH PLAN assert it in their
runners instead of assuming it (r12 ADVICE): one-microbatch arrival for
s03/s06/s07/s08/s09/s21/s22 (single-file source / lastProgress
data-batch count / foreachBatch epoch count), the staged TWO-batch
arrival for s14 (epoch count == 2). With a different batchization,
watermark-expired dedup state, first-ARRIVAL-wins emission, join state
eviction, intermediate-watermark-gated outer emission, or the growing
inventory would legitimately diverge from the batch formulation.

The 2 still-rows-only entries (round-13 audit):

* s11 (transformWithState) — protobuf-gated with a runtime fallback
  path; output is environment-dependent by design. Stays rows-only.
* s26 (threshold alerts) — measured NON-upgradable at sf0.001: the
  stateful processor emits nothing for zero-crossing keys while the
  batch twin q228 emits (type, 0, 0) rows. Stays rows-only by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.queries import REGISTRY, register
from cassandra_analytics_example_spark.queries import events as _events  # noqa: F401
from cassandra_analytics_example_spark.queries import llm as _llm  # noqa: F401
from cassandra_analytics_example_spark.streaming import (
    run_sessionized_stream,
    run_sliding_stream,
    run_stateful_totals,
    run_stream_dedup,
    run_tumbling_stream,
)


@register(
    "s01_stream_tumbling_windows",
    # Round 13: rows-only -> full value oracle. The complete-mode output
    # of a bounded single-batch stream is the batch windowed aggregate
    # exactly, and the publish moved to the exact-decimal money_sum fold
    # (the float sum was the only blocker) — so the driver hash-checks
    # the store the stream built against the batch twin q15's own oracle
    # string (registry reuse: the twins cannot drift).
    oracle=REGISTRY["q15_hourly_event_windows"].oracle,
    doc="Structured Streaming: watermarked tumbling 1h windows over a "
    "file-source stream, memory sink, exact-decimal sums (batch twin + "
    "shared oracle: q15)",
    tags=("streaming",),
)
def s01_stream_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_tumbling_stream(spark, sf_dir)


@register(
    "s02_stream_session_windows",
    # Round 13: rows-only -> full value oracle — the publish moved to
    # epoch-µs session bounds, making it column-for-column the oracled
    # batch twin q107 (F.session_window in batch mode); oracle string
    # reused from the registry so the twins cannot drift.
    oracle=REGISTRY["q107_batch_session_window"].oracle,
    doc="Structured Streaming: F.session_window 30-min-gap sessions, "
    "epoch-µs bounds (batch twin + shared oracle: q107; sessionize twin: "
    "q16)",
    tags=("streaming",),
)
def s02_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sessionized_stream(spark, sf_dir)


@register(
    "s03_stream_dedup",
    # Round 13: rows-only -> full value oracle. The REGISTERED publish is
    # the per-type count of dedup survivors — count(DISTINCT user_id) per
    # type, a deterministic fold — not the row-level store (WHICH row
    # survives stays arrival-order state, which is why the r12 audit kept
    # the row store itself rows-only). Exact under one-microbatch arrival,
    # asserted in the runner (_require_single_file_source).
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_first_seen
FROM events GROUP BY event_type
""",
    doc="Structured Streaming: dropDuplicatesWithinWatermark on "
    "(user_id, event_type), published as per-type survivor counts "
    "(batch twin: q17)",
    tags=("streaming",),
)
def s03_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = run_stream_dedup(spark, sf_dir)
    return deduped.groupBy("event_type").agg(F.count("*").alias("n_first_seen"))


@register(
    "s04_stream_stateful_totals",
    # Round 13: rows-only -> full value oracle — the running sum state
    # moved to exact integer cents (the float accumulator was the only
    # blocker), and the publish reduces update-mode emissions to each
    # user's FINAL state (max n_events wins; n_events is strictly
    # increasing per user), so the published table is the per-user batch
    # aggregate regardless of how many microbatches emitted.
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY user_id
""",
    doc="Structured Streaming: custom stateful operator "
    "(applyInPandasWithState) - per-user running count/sum state "
    "across microbatches, exact-cents accumulator, final-state publish",
    tags=("streaming", "stateful"),
)
def s04_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    totals = run_stateful_totals(spark, sf_dir)
    return (
        totals.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("m"))
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.col("m.sum_value").alias("sum_value"),
        )
    )


@register(
    "s05_stream_sliding_windows",
    # Round 13: rows-only -> full value oracle via the exact-decimal
    # publish (sliding_aggregate_exact); oracle string reused from the
    # batch twin q38's registration.
    oracle=REGISTRY["q38_sliding_windows"].oracle,
    doc="Structured Streaming: watermarked SLIDING 1h/30min windows over a "
    "file-source stream, memory sink, exact-decimal sums (batch twin + "
    "shared oracle: q38)",
    tags=("streaming",),
)
def s05_stream_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sliding_stream(spark, sf_dir)


@register(
    "s06_stream_stream_join",
    # Round 13: rows-only -> full value oracle — the publish moved to
    # epoch-µs event times (purchase_value is a raw-double pass-through,
    # exact by construction), matching the oracled batch interval join
    # q45 column-for-column; one-microbatch arrival asserted in the
    # runner (a cross-batch pair aged past the watermark would be
    # dropped — correct streaming semantics the batch oracle can't see).
    oracle=REGISTRY["q45_view_purchase_attribution"].oracle,
    doc="Structured Streaming: watermarked stream-stream inner join — "
    "purchases attributed to same-user views within 1h; the time-range "
    "predicate bounds the join state store (batch twin + shared oracle: "
    "q45)",
    tags=("streaming", "join"),
)
def s06_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_stream_join,
    )

    return run_stream_stream_join(spark, sf_dir)


@register(
    "s07_stream_file_sink",
    # Round 13: rows-only -> full value oracle — same deterministic
    # per-type survivor-count fold as s03, but read back from the
    # checkpointed parquet FILE sink the stream committed (so the driver
    # hash-checks the production sink path end-to-end); one-microbatch
    # invariant asserted on the query's lastProgress.
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_first_seen
FROM events GROUP BY event_type
""",
    doc="Structured Streaming: streaming dedup written to a checkpointed "
    "parquet FILE sink (exactly-once commit log; the production sink "
    "shape) and read back — same output shape as s03",
    tags=("streaming", "sink"),
)
def s07_stream_file_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_dedup_to_files,
    )

    return run_stream_dedup_to_files(spark, sf_dir)


@register(
    "s08_stream_first_seen",
    # Round 13: rows-only -> full value oracle. The struct-min publish
    # ((ts, value) total order — value tiebreak pinned in the operator,
    # the twin test, and this oracle alike) is a deterministic fold under
    # one-microbatch arrival, asserted in the runner.
    oracle="""
WITH r AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY epoch_us(ts), value) AS rn
  FROM events)
SELECT user_id, event_type, ts_us AS first_ts_us,
       CAST(value AS DOUBLE) AS first_value
FROM r WHERE rn = 1
""",
    doc="Structured Streaming: custom stateful first-touch dedup — first "
    "event per (user, event_type) across microbatches, O(distinct keys) "
    "state with an opt-in processing-time TTL lease for unbounded key "
    "domains (batch twin: min-struct per pair)",
    tags=("streaming", "stateful"),
)
def s08_stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_first_seen_stream,
    )

    return run_first_seen_stream(spark, sf_dir)


@register(
    "s09_stream_foreach_batch_upsert",
    # Round 13: rows-only -> full value oracle. The upserted target holds
    # exactly the dedup survivors (event_ids are unique, so the anti-join
    # merge drops nothing on first insert), making the published per-type
    # count the same countDistinct fold as s03/s07; one-microbatch
    # invariant asserted on the foreachBatch epoch count.
    oracle="""
SELECT event_type, count(DISTINCT user_id) AS n_upserted
FROM events GROUP BY event_type
""",
    doc="Structured Streaming: foreachBatch custom sink performing an "
    "idempotent parquet UPSERT (batch anti-joined against the target "
    "key inventory) — the production pattern for sinks without a native "
    "streaming writer, incl. the reference's batch-shaped Cassandra "
    "bulk writer",
    tags=("streaming", "sink"),
)
def s09_stream_foreach_batch_upsert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_foreach_batch_upsert,
    )

    return run_foreach_batch_upsert(spark, sf_dir)


@register(
    "s10_stream_static_join",
    # Round 13: rows-only -> full value oracle. The join is STATELESS
    # (every microbatch joins the same static dimension; no watermark, no
    # state) and the dimension is a pure function of user_id, so the
    # published per-(segment, type) counts are batch-exact under ANY
    # microbatch split — no one-batch caveat needed.
    oracle="""
SELECT user_id % 5 AS segment, event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2
""",
    doc="Structured Streaming: stream-STATIC dimension join — events "
    "stream enriched with a broadcast per-user segment table, stateless "
    "(no watermark/state store); per-(segment, type) counts (batch "
    "twin: same join+aggregate in batch, pinned by "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "join"),
)
def s10_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_static_join,
    )

    return run_stream_static_join(spark, sf_dir)


@register(
    "s11_transform_with_state",
    oracle=None,
    doc="Structured Streaming: transformWithStateInPandas (the Spark 4 "
    "typed-state API — ValueState handle per user) computing running "
    "per-user count/sum across microbatches; O(distinct keys) state "
    "(batch twin: per-user aggregate, pinned by "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "stateful"),
)
def s11_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        transform_with_state_totals,
    )

    return transform_with_state_totals(spark, sf_dir)


@register(
    "s12_stream_countmin",
    # Round 11: upgraded from rows-only to a FULL value oracle — the
    # stream's published store is deterministic (sum-merge over
    # md5-derived cells of the same events the view exposes), so the
    # driver can hash-compare it like any batch query; the stream
    # mechanics stay covered by the replay/batch-twin tests.
    oracle="""
WITH k AS (SELECT event_type AS key FROM events),
ds AS (SELECT unnest([0, 1, 2, 3]) AS d)
SELECT d,
       CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || key), 1, 15))
            AS BIGINT) % 64 AS cell,
       CAST(count(*) AS BIGINT) AS c
FROM k, ds GROUP BY 1, 2
""",
    doc="Structured Streaming: count-min sketch maintained incrementally — "
    "per-microbatch partial cells appended via foreachBatch (associative "
    "merge unit, no read-modify-write), live sketch = merge-on-read "
    "sum; final cell table is BIT-IDENTICAL to the batch sketch "
    "(batch twin gate: tests/test_streaming_batch_twins.py; batch op: "
    "operators/sketches.py) — and since round 11 the driver hash-checks "
    "the published store against a DuckDB oracle directly",
    tags=("streaming", "sketch"),
)
def s12_stream_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_countmin,
    )

    return run_stream_countmin(spark, sf_dir)


@register(
    "s13_stream_jsonl_ingest",
    # Round 13: rows-only -> full value oracle. The clean side is SQL
    # over documents (every fixture doc round-trips clean through the
    # PERMISSIVE reader — q123's batch contract); the corrupt side is the
    # runner's own fixture constant (it PLANTS exactly 2 malformed lines,
    # so the literal is the contract, not a measurement). Complete-mode
    # global aggregate — multi-batch safe, no one-microbatch caveat.
    oracle="""
SELECT count(*) + 2 AS n_rows,
       count(*) AS n_clean,
       CAST(2 AS BIGINT) AS n_corrupt,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM documents
""",
    doc="Structured Streaming: JSONL ingestion through the explicit-schema "
    "PERMISSIVE reader with corrupt-record quarantine accounting — "
    "clean/corrupt counts + clean digest as a single-row streaming "
    "aggregate (batch twin: q123 / sources.files round trip)",
    tags=("streaming", "sources"),
)
def s13_stream_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_jsonl_ingest_stream,
    )

    return run_jsonl_ingest_stream(spark, sf_dir)


@register(
    "s14_stream_late_data_audit",
    # Round 13: rows-only -> full value oracle. The runner STAGES the
    # out-of-order arrival deterministically (newest quarter first with
    # pinned mtimes, maxFilesPerTrigger=1, explicit persisted watermark),
    # so the routing is a closed form over the fixture: batch0 advances
    # the watermark to the global max, batch1 rows are late iff
    # ts < split AND ts < max - lateness (split = lo + 3*span/4,
    # lateness = span/2, integer floor both engines). The two-batch plan
    # is asserted in the runner.
    oracle="""
WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
           FROM events),
e AS (SELECT event_type, epoch_us(ts) AS tus FROM events)
SELECT event_type,
       CAST(sum(CASE WHEN tus < b.lo + (3 * (b.hi - b.lo)) // 4
                      AND tus < b.hi - (b.hi - b.lo) // 2
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_ontime,
       CAST(sum(CASE WHEN tus < b.lo + (3 * (b.hi - b.lo)) // 4
                      AND tus < b.hi - (b.hi - b.lo) // 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM e, b
GROUP BY event_type
""",
    doc="Structured Streaming: late-data DEAD-LETTER accounting — a "
    "foreachBatch sink with an explicit persisted high-watermark routes "
    "rows older than (watermark - lateness) to a quarantine sink instead "
    "of silently dropping them; per-type on-time/late counts over a "
    "deterministic out-of-order two-batch arrival (batch twin pinned by "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "governance"),
)
def s14_stream_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        late_data_audit,
    )

    return late_data_audit(spark, sf_dir)


@register(
    "s15_stream_hll",
    # Round 11: rows-only -> full value oracle, same rationale as s12 —
    # the published register table is a deterministic max-merge over
    # md5-derived (bucket, rho) of the events view's own keys.
    oracle="""
WITH h AS (
  SELECT CAST(('0x' || substr(md5(
           CAST(user_id AS VARCHAR) || ':' || event_type), 1, 15))
         AS BIGINT) AS h
  FROM events),
rho AS (
  SELECT h >> 52 AS bucket, h % 4503599627370496 AS rem FROM h)
SELECT bucket,
       CAST(max(CASE WHEN rem = 0 THEN 53
                     ELSE 53 - length(bin(rem)) END) AS INTEGER) AS r
FROM rho GROUP BY bucket
""",
    doc="Structured Streaming: mergeable HyperLogLog distinct-count "
    "maintenance — per-microbatch 256-register partials appended via "
    "foreachBatch, live sketch = max-merge-on-read; max is idempotent, so "
    "replayed batches are harmless even without the checkpoint (batch "
    "twin gate: tests/test_streaming_batch_twins.py; duplicate-replay "
    "measured in tests/test_streaming_semantics.py; batch op: "
    "operators/sketches.py:hll_registers) — and since round 11 the "
    "driver hash-checks the published registers against a DuckDB oracle",
    tags=("streaming", "sketch"),
)
def s15_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_hll,
    )

    return run_stream_hll(spark, sf_dir)


@register(
    "s16_stream_hourly_anomalies",
    # Round 11: the published flags table == q144's (bit-identity already
    # claimed and twin-gated) — reuse its oracle so the driver value-checks
    # the stream-built table itself.
    oracle=REGISTRY["q144_hourly_anomalies"].oracle,
    doc="Structured Streaming: hourly volume-anomaly monitoring — "
    "per-microbatch partial hourly counts appended via foreachBatch "
    "(associative sum-merge), live table = merge-on-read sum, anomaly "
    "layer = the batch audit's exact-integer 2-sigma algebra "
    "(operators/profiling.py:hourly_anomaly_flags); flags are "
    "BIT-IDENTICAL to q144's (batch twin gate: "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "anomaly", "monitoring"),
)
def s16_stream_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_hourly_anomalies,
    )

    return run_stream_hourly_anomalies(spark, sf_dir)


@register(
    "s17_stream_chunk_store",
    # Round 11: same upgrade — the published histogram == q155's.
    oracle=REGISTRY["q155_chunk_store_dedup"].oracle,
    doc="Structured Streaming: content-addressable chunk-store "
    "maintenance — per-microbatch partial (digest, refcount, bytes) rows "
    "appended via foreachBatch, live store = merge-on-read sum per "
    "digest, published report = the refcount histogram, BIT-IDENTICAL "
    "to the batch accounting q155 (batch twin gate: "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "multimodal", "dedup"),
)
def s17_stream_chunk_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_chunk_store,
    )

    return run_stream_chunk_store(spark, sf_dir)


@register(
    "s18_stream_freshness",
    # Round 12: rows-only -> full value oracle (the s16/s17 pattern) —
    # the published report == q162's (bit-identity twin-gated), so the
    # driver hash-checks the stream-built table against q162's oracle.
    oracle=REGISTRY["q162_freshness_sla"].oracle,
    doc="Structured Streaming: ingest-freshness SLA monitoring — "
    "per-microbatch partial (type, newest, n) rows appended via "
    "foreachBatch (max/sum are associative merge units; max-merge is "
    "idempotent under duplicate replay, the sum side is what the "
    "checkpoint protects — tests/test_streaming_semantics.py), live "
    "state = merge-on-read max+sum per type, published report = the "
    "exact integer minute-lag + 24h staleness verdict, BIT-IDENTICAL "
    "to the batch audit q162 (batch twin gate: "
    "tests/test_streaming_batch_twins.py); since round 12 the driver "
    "hash-checks the published report against q162's DuckDB oracle",
    tags=("streaming", "monitoring"),
)
def s18_stream_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_freshness,
    )

    return run_stream_freshness(spark, sf_dir)


@register(
    "s19_stream_zonemap",
    # Round 12: rows-only -> full value oracle — the published stats are
    # exactly q175's `stats` CTE (per-day count/max-cents/max-ts), a
    # deterministic fold of the full input, directly SQL-expressible.
    oracle="""
WITH ev AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         epoch_us(ts) AS ts_us
  FROM events
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n,
       max(cents) AS max_c,
       max(ts_us) AS day_max_ts
FROM ev GROUP BY day
""",
    doc="Structured Streaming: zone-map stats maintenance — per-microbatch "
    "partial per-day (count, max-cents, max-ts) rows appended via "
    "foreachBatch (sum/max merge units; the max-merged zone bounds are "
    "replay-idempotent, the count is what the checkpoint protects — "
    "duplicate-replay pinned in tests/test_streaming_semantics.py), "
    "live stats = merge-on-read sum/max per day, feeding the batch "
    "pruning audit q175; maintained stats are BIT-IDENTICAL to a batch "
    "recompute (batch twin gate: tests/test_streaming_batch_twins.py); "
    "since round 12 the driver hash-checks the published stats against "
    "a DuckDB oracle (q175's stats CTE)",
    tags=("streaming", "layout", "monitoring"),
)
def s19_stream_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_zonemap,
    )

    return run_stream_zonemap(spark, sf_dir)


@register(
    "s20_stream_sliding_topk",
    # Round 12: rows-only -> full value oracle — the published top-3 is
    # q38's sliding counts + a deterministic (n DESC, type ASC) rank,
    # directly SQL-expressible.
    oracle="""
WITH e AS (SELECT epoch_us(ts) AS tus, event_type FROM events),
wins AS (
  SELECT CAST(make_timestamp((tus // 1800000000) * 1800000000 - j * 1800000000)
              AS VARCHAR) AS window_start,
         event_type
  FROM e, UNNEST([0, 1]) AS t(j)
),
agg AS (
  SELECT window_start, event_type, CAST(count(*) AS BIGINT) AS n
  FROM wins GROUP BY 1, 2
),
ranked AS (
  SELECT window_start, event_type, n,
         CAST(row_number() OVER (PARTITION BY window_start
                                 ORDER BY n DESC, event_type ASC)
              AS INTEGER) AS rnk
  FROM agg
)
SELECT window_start, event_type, n, rnk FROM ranked WHERE rnk <= 3
""",
    doc="Structured Streaming: sliding-window heavy hitters — watermarked "
    "1h/30min sliding counts maintained in streaming mode, top-3 event "
    "types per window published from the materialized aggregate with a "
    "deterministic tiebreak (report pass bounded by windows x types, "
    "never event volume; batch twin: q38 + rank, "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "window", "sketch"),
)
def s20_stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_sliding_topk,
    )

    return run_stream_sliding_topk(spark, sf_dir)


@register(
    "s21_stream_incremental_dedup",
    # Round 12: rows-only -> full value oracle — the accepted store ==
    # q61's anti-join result (twin-gated; the growing inventory admits
    # the same set because the fixture recrawl has no intra-stream
    # duplicates beyond what the seed inventory already blocks).
    oracle=REGISTRY["q61_incremental_dedup"].oracle,
    doc="Structured Streaming: incremental ingest dedup — each microbatch "
    "anti-joins its md5 content hashes against a persisted inventory, "
    "appends survivors to the accepted store and their hashes to the "
    "inventory, so the dedup frontier grows WITH the stream; "
    "hash-keyed joins only, inventory 32 bytes/doc (batch twin: q61, "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "dedup"),
)
def s21_stream_incremental_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_incremental_dedup,
    )

    return run_stream_incremental_dedup(spark, sf_dir)


@register(
    "s22_stream_stream_outer_join",
    # Round 13: rows-only -> full value oracle. Under the asserted
    # one-microbatch invariant the finalization watermark is
    # (global max ts - 2h), so the emitted set is the twin's closed form:
    # matched pairs always emit; unmatched views emit null-padded iff
    # view_ts + 1h < watermark (state expiry).
    oracle="""
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events),
v AS (SELECT user_id, event_id AS view_id, tus AS view_ts_us
      FROM ev WHERE event_type = 'view'),
p AS (SELECT user_id AS p_user_id, event_id AS purchase_id, tus AS pt
      FROM ev WHERE event_type = 'purchase')
SELECT v.user_id, v.view_id, p.purchase_id, v.view_ts_us
FROM v LEFT JOIN p
  ON v.user_id = p.p_user_id
 AND p.pt >= v.view_ts_us
 AND p.pt <= v.view_ts_us + 3600000000
WHERE p.purchase_id IS NOT NULL
   OR v.view_ts_us + 3600000000 <
      (SELECT max(tus) - 7200000000 FROM ev)
""",
    doc="Structured Streaming: watermarked stream-stream LEFT OUTER join — "
    "unmatched views emit null-padded only when the watermark passes "
    "their last possible match time (emit-on-state-expiry), state "
    "bounded by the time-range condition (batch twin: left join + the "
    "same watermark inequality, tests/test_streaming_batch_twins.py)",
    tags=("streaming", "join"),
)
def s22_stream_stream_outer_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_stream_outer_join,
    )

    return run_stream_stream_outer_join(spark, sf_dir)


@register(
    "s23_stream_psi_drift",
    # Round 12: rows-only -> full value oracle — published PSI == q192's
    # (bit-identity twin-gated), reuse its oracle.
    oracle=REGISTRY["q192_psi_value_drift"].oracle,
    doc="Structured Streaming: PSI drift monitor — baseline histogram "
    "pinned once, per-microbatch (type, bucket) count partials appended "
    "via foreachBatch (sum merge unit), published PSI computed from the "
    "merged-on-read live histogram with micro-unit-quantized terms, "
    "BIT-IDENTICAL to the batch monitor q192 (batch twin gate: "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "monitoring", "audit"),
)
def s23_stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_psi_drift,
    )

    return run_stream_psi_drift(spark, sf_dir)


@register(
    "s24_stream_ohlc",
    # Round 12: rows-only -> full value oracle — published bars == q200's
    # (bit-identity twin-gated), reuse its oracle.
    oracle=REGISTRY["q200_ohlc_bars"].oracle,
    doc="Structured Streaming: OHLC bar maintenance — per-microbatch "
    "partial bars (argmin/argmax on the total ordering key, max/min/"
    "sum) appended via foreachBatch, merged on read into bars "
    "BIT-IDENTICAL to the batch q200 at any microbatch split (batch "
    "twin gate: tests/test_streaming_batch_twins.py; duplicate-replay: "
    "open/high/low/close are argmin/argmax/max/min merges and replay-"
    "idempotent, volume is the sum the checkpoint protects — "
    "tests/test_streaming_semantics.py); since round 12 the driver "
    "hash-checks the published bars against q200's DuckDB oracle",
    tags=("streaming", "aggregate", "window"),
)
def s24_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_ohlc,
    )

    return run_stream_ohlc(spark, sf_dir)


@register(
    "s25_stream_weighted_sample",
    # Round 12: rows-only -> full value oracle — the published sample ==
    # q185's (deterministic ES keys; top-k is a mergeable unit), reuse
    # its oracle.
    oracle=REGISTRY["q185_weighted_sample"].oracle,
    doc="Structured Streaming: weighted sampling without replacement — "
    "per-microbatch local top-k on the deterministic "
    "Efraimidis-Spirakis key appended via foreachBatch (top-k is a "
    "mergeable unit), published sample = top-k of identity-DEDUPED "
    "partials (r12: a naive top-k over replayed duplicate partials "
    "keeps each winner twice and crowds out true rank-k rows — "
    "tests/test_streaming_semantics.py pins both directions), "
    "BIT-IDENTICAL to the batch q185 at any microbatch split (batch "
    "twin gate: tests/test_streaming_batch_twins.py)",
    tags=("streaming", "sampling"),
)
def s25_stream_weighted_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_weighted_sample,
    )

    return run_stream_weighted_sample(spark, sf_dir)


@register(
    "s26_stream_threshold_alerts",
    # Round 12 upgrade audit: NOT oracle-upgradable — the stateful
    # processor emits only keys whose state produced output, so an
    # event type with zero crossings is ABSENT from the stream result
    # while q228's batch aggregate emits its (type, 0, 0) row; measured
    # at sf0.001 ('purchase' row missing, 4 vs 5). The sf0.01 twin
    # equality is scale-coincidental; stays rows-only by design.
    oracle=None,
    doc="Structured Streaming: stateful per-(user, type) threshold "
    "up-crossing alerts via applyInPandasWithState — one integer of "
    "state per key (the last-seen side), per-batch sorted boundary "
    "handling (batch twin: q228)",
    tags=("streaming", "stateful", "monitoring"),
)
def s26_stream_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_threshold_alerts,
    )

    return run_stream_threshold_alerts(spark, sf_dir)


@register(
    "s27_stream_ks_drift",
    # Round 12: rows-only -> full value oracle — published KS == q246's
    # (bit-identity twin-gated), reuse its oracle.
    oracle=REGISTRY["q246_ks_time_drift"].oracle,
    doc="Structured Streaming: two-sample KS drift monitor — baseline "
    "per-value counts pinned once, per-microbatch count partials "
    "appended via foreachBatch (sum merge unit), published KS computed "
    "from the merged-on-read counts with pure integer cross-"
    "multiplication, BIT-IDENTICAL to the batch q246 (batch twin gate: "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "monitoring", "audit", "ranking"),
)
def s27_stream_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_ks_drift,
    )

    return run_stream_ks_drift(spark, sf_dir)


@register(
    "s28_stream_cusum",
    # Round 12: rows-only -> full value oracle — published scan == q249's
    # (bit-identity twin-gated), reuse its oracle.
    oracle=REGISTRY["q249_cusum_changepoint"].oracle,
    doc="Structured Streaming: CUSUM changepoint monitor — per-microbatch "
    "hourly count partials appended via foreachBatch (sum merge unit), "
    "published integer CUSUM scan over the densified merged-on-read "
    "hourly table, BIT-IDENTICAL to the batch q249 (batch twin gate: "
    "tests/test_streaming_batch_twins.py)",
    tags=("streaming", "monitoring", "timeseries", "audit"),
)
def s28_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_cusum,
    )

    return run_stream_cusum(spark, sf_dir)


@register(
    "s29_stream_lag_features",
    # Round 12: rows-only -> full value oracle — published features ==
    # q269's (bit-identity twin-gated; top-k-by-recency is a mergeable
    # unit and replay-idempotent), reuse its oracle.
    oracle=REGISTRY["q269_lag_features"].oracle,
    doc="Structured Streaming: serving-feature maintenance — per-user "
    "top-3-by-recency purchase partials appended via foreachBatch "
    "(top-k is the merge unit: the global top-3 is contained in the "
    "union of batch top-3s), published feature rows (latest, two lags, "
    "trailing-3 mean) BIT-IDENTICAL to the batch q269 (batch twin "
    "gate: tests/test_streaming_batch_twins.py)",
    tags=("streaming", "analytics", "eval"),
)
def s29_stream_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_lag_features,
    )

    return run_stream_lag_features(spark, sf_dir)


@register(
    "s30_stream_metrics_layer",
    # Round 12: rows-only -> full value oracle — published layer ==
    # q272's (bit-identity twin-gated), reuse its oracle.
    oracle=REGISTRY["q272_metrics_layer"].oracle,
    doc="Structured Streaming: semantic-layer maintenance with exact "
    "medians — per-(type, day, cents) count partials appended via "
    "foreachBatch (sum merge unit: at-least-once without the "
    "checkpoint, duplicate-replay pinned in "
    "tests/test_streaming_semantics.py), published additive metrics AND "
    "exact interpolated p50 derived from the merged-on-read count "
    "table, BIT-IDENTICAL to the batch q272 (batch twin gate: "
    "tests/test_streaming_batch_twins.py); since round 12 the driver "
    "hash-checks the published layer against q272's DuckDB oracle",
    tags=("streaming", "aggregate", "ranking", "analytics"),
)
def s30_stream_metrics_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_analytics_example_spark.streaming.windows import (
        run_stream_metrics_layer,
    )

    return run_stream_metrics_layer(spark, sf_dir)
