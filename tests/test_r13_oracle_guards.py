"""Round-13 oracle-precondition guards — the NEGATIVE paths.

Six streaming stores registered full value oracles this round whose
exactness rests on ONE-MICROBATCH arrival (s03/s06/s07/s08/s09/s21).
Their runners assert the invariant instead of assuming it (r12 ADVICE);
these tests pin that the guards actually FIRE when the precondition is
broken — a guard that never trips is documentation, not enforcement.

Also pins the s04 final-state publish reduce: update-mode memory sinks
APPEND one row per (microbatch, touched user), and the registered query
must reduce that to each user's final state no matter how many update
rows accumulated.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _multi_file_fixture_dir(spark, tmp_path) -> str:
    """A fixture dir whose events.parquet is a DIRECTORY (multi-file) —
    the shape that breaks the one-microbatch invariant for file-source
    streams reading pathGlobFilter='events.parquet'."""
    d = str(tmp_path / "fixture")
    os.makedirs(d, exist_ok=True)
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    ev.repartition(4).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    return d


def test_single_file_guard_trips_on_directory_fixture(spark, tmp_path):
    from cassandra_analytics_example_spark.streaming.windows import (
        run_first_seen_stream,
        run_stream_dedup,
        run_stream_stream_join,
    )

    d = _multi_file_fixture_dir(spark, tmp_path)
    for runner in (run_stream_dedup, run_first_seen_stream,
                   run_stream_stream_join):
        with pytest.raises(ValueError, match="single-file"):
            runner(spark, d)


def test_single_file_guard_passes_on_real_fixture(spark):
    from cassandra_analytics_example_spark.streaming.windows import (
        _require_single_file_source,
    )

    _require_single_file_source(SF, "events", "test")  # must not raise
    with pytest.raises(ValueError, match="single-file"):
        _require_single_file_source(SF, "no_such_table", "test")


def test_incremental_dedup_epoch_guard_trips_on_multi_batch(
    spark, tmp_path, monkeypatch
):
    """s21's oracle assumes one microbatch; with the documents fixture
    split into several files the foreachBatch epoch counter must refuse
    rather than hand the driver a silently-divergent store."""
    from cassandra_analytics_example_spark.streaming import windows as W

    d = str(tmp_path / "fixture")
    os.makedirs(d, exist_ok=True)
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    docs.repartition(3).write.mode("overwrite").parquet(
        os.path.join(d, "documents.parquet")
    )
    with pytest.raises(ValueError, match="exactly one"):
        W.run_stream_incremental_dedup(spark, d)


def test_s04_final_state_reduce_survives_multi_update_rows(spark, sf_dir):
    """The s04 registration reduces update-mode emissions to final state
    via max(struct(n_events, sum_value)) — feed it a synthetic TWO-batch
    update log (each user emitted twice, n_events strictly increasing)
    and require exactly the final rows back."""
    from cassandra_analytics_example_spark.queries import load_all

    load_all()
    # replicate the reduce the registration applies
    updates = spark.createDataFrame(
        [
            (1, 3, 30.0),   # batch 1
            (1, 7, 75.5),   # batch 2 (final)
            (2, 2, 8.25),   # only batch 1 touched user 2
        ],
        "user_id bigint, n_events bigint, sum_value double",
    )
    got = (
        updates.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "sum_value")).alias("m"))
        .select(
            "user_id",
            F.col("m.n_events").alias("n_events"),
            F.col("m.sum_value").alias("sum_value"),
        )
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.n_events, r.sum_value) for r in got] == [
        (1, 7, 75.5),
        (2, 2, 8.25),
    ]


def test_mint_finalize_refuses_empty_namespace(tmp_path):
    """r12 ADVICE: --finalize with a label that holds no samples must
    error out (listing the populated namespaces), not overwrite the
    anchor artifact with a 0-query one."""
    import json
    import subprocess
    import sys

    state = tmp_path / "state.json"
    state.write_text(json.dumps({"probe": {"q01_pricing_summary": [
        {"sec": 1.0, "wall": 2.0}
    ]}}))
    out = tmp_path / "out.json"
    proc = subprocess.run(
        [
            sys.executable,
            "tools/mint_isolated_anchors.py",
            "--finalize",
            "--state", str(state),
            "--out", str(out),
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode != 0
    assert "probe" in (proc.stderr + proc.stdout)
    assert not out.exists()
