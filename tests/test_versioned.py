"""Versioned-table transaction log (sources/versioned.py): append /
overwrite commits, time travel, optimistic-concurrency conflict handling.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("x"))


def test_append_accumulates_and_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = V.append(spark, root, _df(spark, 0, 100))
    v2 = V.append(spark, root, _df(spark, 100, 150))
    assert (v1, v2) == (1, 2)
    assert V.read_version(spark, root).count() == 150
    assert V.read_version(spark, root, 1).count() == 100
    assert V.current_version(root) == 2


def test_overwrite_replaces_but_history_survives(spark, tmp_path):
    root = str(tmp_path / "t")
    V.append(spark, root, _df(spark, 0, 100))
    V.append(spark, root, _df(spark, 100, 150))
    v3 = V.overwrite(spark, root, _df(spark, 1000, 1010))
    assert v3 == 3
    assert V.read_version(spark, root).count() == 10
    # time travel: pre-overwrite versions stay readable
    assert V.read_version(spark, root, 2).count() == 150
    assert V.read_version(spark, root, 1).count() == 100
    ops = [h["op"] for h in V.history(root)]
    assert ops == ["append", "append", "overwrite"]


def test_append_retries_past_concurrent_commit(spark, tmp_path):
    """A racing commit occupying the next version must not fail an append
    — the append lands one version later and replay includes both."""
    root = str(tmp_path / "t")
    V.append(spark, root, _df(spark, 0, 10))
    # simulate a concurrent writer winning version 2
    with open(V._entry_path(root, 2), "x") as fh:
        json.dump({"version": 2, "op": "append", "add": []}, fh)
    v = V.append(spark, root, _df(spark, 10, 20))
    assert v == 3
    assert V.read_version(spark, root).count() == 20


def test_overwrite_conflict_raises(spark, tmp_path, monkeypatch):
    """A commit landing AFTER overwrite read its base version but before
    its log write must fail the overwrite (it would clobber state it
    never observed)."""
    root = str(tmp_path / "t")
    V.append(spark, root, _df(spark, 0, 10))

    real_write = V._write_data_files

    def write_and_race(df, r):
        names = real_write(df, r)
        # concurrent writer wins version 2 while our overwrite is staging
        with open(V._entry_path(r, 2), "x") as fh:
            json.dump({"version": 2, "op": "append", "add": []}, fh)
        return names

    monkeypatch.setattr(V, "_write_data_files", write_and_race)
    with pytest.raises(RuntimeError, match="committed concurrently"):
        V.overwrite(spark, root, _df(spark, 0, 5))


def test_empty_table_read_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no live files"):
        V.read_version(spark, str(tmp_path / "nope"))


def test_failed_writer_leaves_no_visible_data(spark, tmp_path):
    """Data files without a log entry are invisible: writing files but
    never committing must not change any read."""
    root = str(tmp_path / "t")
    V.append(spark, root, _df(spark, 0, 10))
    V._write_data_files(_df(spark, 0, 99), root)  # orphaned, uncommitted
    assert V.read_version(spark, root).count() == 10
