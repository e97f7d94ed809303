"""Physical-layout operators: Z-order clustering, bucketed co-located
joins, small-file compaction (operators/layout.py)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cassandra_analytics_example_spark.operators.layout import (
    compact_files,
    rank_scale,
    write_bucketed,
    zorder_write,
    zvalue,
    zvalue_sql,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp()
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_zvalue_matches_reference_interleave(spark):
    # a=0b0011, b=0b0101 → Morton(a,b) = 0b100111 = 39
    row = spark.range(1).select(
        zvalue([F.lit(3), F.lit(5)], 4).alias("z")
    ).first()
    assert row.z == 39


def test_zvalue_sql_twin_agrees(spark):
    import duckdb

    vals = [(3, 5), (0, 0), (1023, 1023), (17, 900)]
    df = spark.createDataFrame(vals, "a bigint, b bigint")
    got = sorted(
        r.z for r in df.select(zvalue(["a", "b"], 10).alias("z")).collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            f"select {zvalue_sql(['a','b'],10)} as z from (values "
            + ",".join(str(v) for v in vals)
            + ") t(a,b)"
        ).fetchall()
    )
    assert got == want


def test_zvalue_rejects_overflowing_width(spark):
    with pytest.raises(ValueError):
        zvalue(["a", "b", "c", "d"], 16)  # 64 bits > 62


def test_rank_scale_bounds(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], "v bigint")
    got = [
        r.s for r in df.select(rank_scale("v", 100, 8).alias("s")).collect()
    ]
    assert got == [0, 127, 255]


def test_zorder_write_tiles_disjoint_ranges(spark, tmpdir):
    # 2-D grid; after zorder_write each parquet file must hold a disjoint
    # Z-range (that is what repartitionByRange on the Z-value guarantees),
    # which is the property scan pruning relies on.
    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x bigint, y bigint"
    )
    zorder_write(df, f"{tmpdir}/z", ["x", "y"], bits=6, n_files=8)
    back = spark.read.parquet(f"{tmpdir}/z")
    assert back.count() == 64 * 64
    per_file = (
        back.select(
            zvalue(["x", "y"], 6).alias("z"),
            F.input_file_name().alias("f"),
        )
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    assert len(spans) == 8
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, "file Z-ranges overlap"


def test_bucketed_join_has_no_shuffle(spark, tmpdir):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        write_bucketed(a, "t_bucket_a", "k", 8, sort_by="k")
        write_bucketed(b, "t_bucket_b", "k", 8, sort_by="k")
        joined = spark.table("t_bucket_a").join(
            spark.table("t_bucket_b"), "k"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_write_bucketed_survives_stale_warehouse_dir(spark):
    """Kill-rerun safety: a killed prior job leaves the managed table's
    data directory under the warehouse with NO catalog entry — the exact
    state that failed the round-7 suite run with LOCATION_ALREADY_EXISTS.
    write_bucketed must clear the orphan and succeed."""
    import os

    from cassandra_analytics_example_spark.operators.layout import (
        _managed_location,
    )

    name = "t_bucket_stale"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    loc = _managed_location(spark, name).replace("file:", "")
    # fabricate the orphan: data on disk, catalog ignorant
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "part-orphan.parquet"), "wb") as f:
        f.write(b"not a real parquet file")
    try:
        df = spark.range(0, 1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        write_bucketed(df, name, "k", 4, sort_by="k")
        assert spark.table(name).count() == 1_000
        # the orphan file must be gone, not merged into the table dir
        assert not os.path.exists(os.path.join(loc, "part-orphan.parquet"))
        # rerun over a now-known table also works (catalogued overwrite)
        write_bucketed(df, name, "k", 4, sort_by="k")
        assert spark.table(name).count() == 1_000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_compact_files_reduces_file_count(spark, tmpdir):
    # 64 tiny files in → ~1 file out (input is far below one target size).
    spark.range(0, 100_000).repartition(64).write.parquet(f"{tmpdir}/small")
    n_out = compact_files(
        spark, f"{tmpdir}/small", f"{tmpdir}/compact",
        target_file_bytes=256 * 1024 * 1024,
    )
    assert n_out == 1
    assert spark.read.parquet(f"{tmpdir}/compact").count() == 100_000


def test_compact_files_respects_target_size(spark, tmpdir):
    spark.range(0, 200_000).repartition(40).write.parquet(f"{tmpdir}/small")
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{tmpdir}/small")
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    target = max(1, total // 4)
    n_out = compact_files(
        spark, f"{tmpdir}/small", f"{tmpdir}/c4", target_file_bytes=int(target)
    )
    assert 3 <= n_out <= 6
    assert spark.read.parquet(f"{tmpdir}/c4").count() == 200_000


def test_partitioned_write_prunes_directories(spark, tmpdir):
    from cassandra_analytics_example_spark.operators.layout import (
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4], i * 1.5) for i in range(1000)],
        "id bigint, kind string, v double",
    )
    write_partitioned(df, f"{tmpdir}/part", ["kind"])
    back = spark.read.parquet(f"{tmpdir}/part")
    picked = back.filter(F.col("kind") == "b")
    plan = picked._jdf.queryExecution().executedPlan().toString()
    # the predicate must surface as a PartitionFilter (directory pruning),
    # NOT a PushedFilter (row-group pruning) — it never reaches the data.
    assert "PartitionFilters: [isnotnull(kind" in plan
    assert picked.count() == 250
    # and only the one directory's files are touched
    files = {
        r.f
        for r in picked.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert files and all("kind=b" in f for f in files)


def test_zorder_stats_pruned_read_skips_files(spark, tmpdir):
    """The full layout loop: zorder_write → file_stats manifest →
    pruned_read with a small 2-D box must (a) touch strictly fewer files
    than the layout holds and (b) return exactly the rows a full-scan
    filter returns. A LINEAR layout on x makes the same y-predicate
    touch EVERY file — the comparison that justifies Z-ordering."""
    from cassandra_analytics_example_spark.operators.layout import (
        file_stats,
        pruned_read,
        zorder_write,
    )

    df = spark.createDataFrame(
        [(x, y) for x in range(64) for y in range(64)], "x bigint, y bigint"
    )
    zorder_write(df, f"{tmpdir}/z", ["x", "y"], bits=6, n_files=16)
    stats = file_stats(spark, f"{tmpdir}/z", ["x", "y"])
    box = {"x": (8, 15), "y": (8, 15)}
    got, n_sel, n_tot = pruned_read(spark, f"{tmpdir}/z", stats, box)
    assert n_tot == 16
    assert 0 < n_sel < n_tot, f"no skipping: {n_sel}/{n_tot}"
    want = df.filter(
        (F.col("x") >= 8) & (F.col("x") <= 15)
        & (F.col("y") >= 8) & (F.col("y") <= 15)
    )
    assert got.count() == 64
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # linear layout on x: the y-box constrains nothing at file level
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(f"{tmpdir}/linear")
    )
    lin_stats = file_stats(spark, f"{tmpdir}/linear", ["x", "y"])
    _, lin_sel, lin_tot = pruned_read(
        spark, f"{tmpdir}/linear", lin_stats, {"y": (8, 15)}
    )
    assert lin_sel == lin_tot, "linear layout cannot skip on y"


def test_pruned_read_distributed_filter_matches_driver_selection(spark, tmpdir):
    """The manifest overlap filter runs as a DataFrame op; the surviving
    file set must equal what a driver-side row walk over the same manifest
    selects (the pre-distributed semantics, kept here as the oracle)."""
    from cassandra_analytics_example_spark.operators.layout import (
        file_stats,
        pruned_read,
        zorder_write,
    )

    df = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x bigint, y bigint"
    )
    zorder_write(df, f"{tmpdir}/z2", ["x", "y"], bits=5, n_files=8)
    stats = file_stats(spark, f"{tmpdir}/z2", ["x", "y"])
    box = {"x": (4, 11), "y": (20, 27)}
    got, n_sel, n_tot = pruned_read(spark, f"{tmpdir}/z2", stats, box)

    want_files = sorted(
        r["file"]
        for r in stats.collect()
        if all(
            r[f"min_{c}"] <= hi and r[f"max_{c}"] >= lo
            for c, (lo, hi) in box.items()
        )
    )
    assert n_sel == len(want_files) and n_tot == 8
    got_files = sorted(
        r["f"]
        for r in got.select(F.input_file_name().alias("f")).distinct().collect()
    )
    assert set(got_files) <= set(want_files)
    assert got.count() == 8 * 8


def test_bloom_pruned_read_skips_files_minmax_cannot(spark, tmpdir):
    """Point lookup on a key that INTERLEAVES across files: every file's
    min-max box covers the probe (min-max skips nothing), but the bloom
    manifest selects only the file(s) actually holding the key — and the
    rows returned equal the full-scan filter."""
    from cassandra_analytics_example_spark.operators.membership import (
        bloom_pruned_read,
        file_bloom_stats,
    )

    # id % 16 decides the file → every file spans [fileno, 4096) in id:
    # min-max on id is useless, bloom is exact
    df = spark.range(0, 4096).selectExpr("id", "id % 16 AS shard")
    df.repartition(16, "shard").write.parquet(f"{tmpdir}/b")
    n_files = (
        spark.read.parquet(f"{tmpdir}/b")
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    stats = file_bloom_stats(spark, f"{tmpdir}/b", ["id"], m=65536, k=3)
    got, n_sel, n_tot = bloom_pruned_read(
        spark, f"{tmpdir}/b", stats, {"id": 1234}, m=65536, k=3
    )
    assert n_tot == n_files and n_files > 4
    assert 1 <= n_sel < n_tot, f"bloom skipped nothing: {n_sel}/{n_tot}"
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["id"] == 1234


def test_bloom_pruned_read_absent_key_returns_empty(spark, tmpdir):
    from cassandra_analytics_example_spark.operators.membership import (
        bloom_pruned_read,
        file_bloom_stats,
    )

    df = spark.range(0, 256).selectExpr("id", "id % 4 AS shard")
    df.repartition(4, "shard").write.parquet(f"{tmpdir}/b2")
    stats = file_bloom_stats(spark, f"{tmpdir}/b2", ["id"], m=65536, k=3)
    got, n_sel, n_tot = bloom_pruned_read(
        spark, f"{tmpdir}/b2", stats, {"id": 999_999}, m=65536, k=3
    )
    assert got.count() == 0 and n_tot >= 2


def test_backfill_overwrites_only_present_partitions(spark, tmpdir):
    from cassandra_analytics_example_spark.operators.layout import (
        backfill_partitions,
        write_partitioned,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", "value"
    )
    path = os.path.join(tmpdir, "events_part")
    write_partitioned(ev, path, ["event_type"])
    before = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # backfill ONE partition with a halved recompute
    patch = ev.where(F.col("event_type") == "click").where(
        F.col("event_id") % 2 == 0
    )
    n_patch = patch.count()
    backfill_partitions(patch, path, ["event_type"])
    after = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert after["click"] == n_patch
    for k, v in before.items():
        if k != "click":
            assert after[k] == v, k
    # idempotence: re-running the same backfill converges
    backfill_partitions(patch, path, ["event_type"])
    again = (
        spark.read.parquet(path)
        .where(F.col("event_type") == "click")
        .count()
    )
    assert again == n_patch


def test_managed_location_respects_current_database(spark):
    """The pre-write cleanup must target the table's OWN database
    directory (review round 8: deriving <warehouse>/<tbl> by string math
    pointed the fs.delete at default.<tbl> while the session was in a
    different database — a latent wrong-directory delete)."""
    from cassandra_analytics_example_spark.operators.layout import (
        _managed_location,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS altdb")
    try:
        default_loc = _managed_location(spark, "tname")
        qualified = _managed_location(spark, "altdb.tname")
        assert qualified.rstrip("/").endswith("altdb.db/tname")
        assert default_loc != qualified
        spark.catalog.setCurrentDatabase("altdb")
        try:
            assert _managed_location(spark, "tname") == qualified
            assert _managed_location(spark, "default.tname") == default_loc
        finally:
            spark.catalog.setCurrentDatabase("default")
    finally:
        spark.sql("DROP DATABASE IF EXISTS altdb CASCADE")


def test_write_bucketed_rejects_catalog_qualified_names(spark):
    """A 3-part name (catalog.db.tbl) must be rejected BEFORE the
    destructive steps (review round 9): the old fallthrough treated the
    catalog name as a table in the current database, so the orphan
    cleanup would fs.delete <current_db_location>/<catalog_name> — a
    wrong-directory destructive delete."""
    import pytest

    from cassandra_analytics_example_spark.operators.layout import (
        _managed_location,
    )

    df = spark.range(4).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="catalog-qualified"):
        write_bucketed(df, "spark_catalog.default.t3part", "k", 2)
    with pytest.raises(ValueError, match="catalog-qualified"):
        _managed_location(spark, "spark_catalog.default.t3part")
    # and nothing was dropped/created along the way
    assert not spark.catalog.tableExists("spark_catalog")


def test_write_bucketed_in_non_default_database(spark):
    from cassandra_analytics_example_spark.operators.layout import (
        _managed_location,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS bdb")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    try:
        # seed BOTH a same-named default-db table and an orphan at the
        # qualified location: the cleanup must remove only the orphan
        write_bucketed(df, "t_scoped", "k", 2)
        import os

        loc = _managed_location(spark, "bdb.t_scoped").replace("file:", "")
        os.makedirs(loc, exist_ok=True)
        open(os.path.join(loc, "orphan"), "w").write("x")
        write_bucketed(df, "bdb.t_scoped", "k", 2)
        assert spark.table("bdb.t_scoped").count() == 200
        # the default-db twin survived the qualified write untouched
        assert spark.table("t_scoped").count() == 200
    finally:
        spark.sql("DROP TABLE IF EXISTS t_scoped")
        spark.sql("DROP DATABASE IF EXISTS bdb CASCADE")
