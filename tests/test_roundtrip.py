"""Round-trip count invariants — the reference's own operational correctness
checks (SURVEY.md §5: write N → read back → count == N; copy preserves count;
parquet re-materialization respects maxRecordsPerFile, App.scala:239-249,68).
"""

from __future__ import annotations

import os

from cassandra_analytics_example_spark.config import JobConfiguration
from cassandra_analytics_example_spark.datagen import (
    gen_dataset,
    gen_dataset_deterministic,
)
from cassandra_analytics_example_spark.plans import (
    copy_table,
    table_to_parquet,
    two_clusters_coordinated_write,
    two_clusters_copy_table,
    write_read_same_table,
)
from cassandra_analytics_example_spark.plans.listeners import (
    CoordinatedStorageTransportListener,
)

N = 10_000  # reference default rowCount (SparkUtils.scala:121)


def test_gen_dataset_schema_and_split(spark):
    df = gen_dataset(spark, 101, 4)
    assert [f.name for f in df.schema.fields] == ["id", "course", "marks"]
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 101


def test_gen_dataset_deterministic_values(spark):
    df = gen_dataset_deterministic(spark, 5, 2)
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert [r.id for r in rows] == [0, 1, 2, 3, 4]
    assert all(r.marks == r.id for r in rows)
    assert rows[3].course == b"crs-00000000000000000000000000000003"
    assert len(rows[0].course) == 36  # same width as a UUID string blob


def test_write_read_same_table(spark, tmp_path):
    path = str(tmp_path / "test")
    cfg = JobConfiguration(
        write_options={"rows": str(N), "path": path, "mode": "overwrite"},
        read_options={"path": path},
    )
    written, read_back = write_read_same_table(spark, cfg)
    assert written == N
    assert read_back == N


def test_copy_table(spark, tmp_path):
    src, dst = str(tmp_path / "test"), str(tmp_path / "test2")
    write_read_same_table(
        spark,
        JobConfiguration(
            write_options={"rows": str(N), "path": src, "mode": "overwrite"},
            read_options={"path": src},
        ),
    )
    copied = copy_table(
        spark,
        JobConfiguration(
            write_options={"path": dst, "mode": "overwrite"},
            read_options={"path": src},
        ),
    )
    assert copied == N
    assert spark.read.parquet(dst).count() == N


def test_copy_preserves_values(spark, tmp_path):
    src, dst = str(tmp_path / "a"), str(tmp_path / "b")
    gen_dataset_deterministic(spark, 500, 3).write.parquet(src)
    copy_table(
        spark,
        JobConfiguration(
            write_options={"path": dst, "mode": "overwrite"},
            read_options={"path": src},
        ),
    )
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_two_clusters_copy(spark, tmp_path):
    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    written, copied = two_clusters_copy_table(
        spark,
        JobConfiguration(
            write_options={"rows": str(N), "path": c1, "mode": "overwrite"},
            read_options={"path": c1},
        ),
        second_write_options={"path": c2, "mode": "overwrite"},
    )
    assert written == N == copied
    assert spark.read.parquet(c2).count() == N


def test_coordinated_write_two_targets(spark, tmp_path):
    targets = {
        "cluster1": {"path": str(tmp_path / "t1")},
        "cluster2": {"path": str(tmp_path / "t2")},
    }
    listener = CoordinatedStorageTransportListener(list(targets))
    n = two_clusters_coordinated_write(
        spark,
        JobConfiguration(
            write_options={
                "rows": "1000",
                "staging_dir": str(tmp_path / "staging"),
            }
        ),
        targets,
        listener,
    )
    assert n == 1000
    for t in targets.values():
        assert spark.read.parquet(t["path"]).count() == 1000
    kinds = [e.kind for e in listener.events]
    assert kinds[0] == "transport_start"
    assert "all_objects_persisted" in kinds
    assert kinds.count("stage_succeeded") == 2
    assert kinds.count("import_succeeded") == 2
    assert kinds[-1] == "job_succeeded"
    # staging completed on both clusters before any import started
    assert kinds.index("import_succeeded") > max(
        i for i, k in enumerate(kinds) if k == "stage_succeeded"
    )
    assert listener.signals.import_ready  # barrier fired


def test_table_to_parquet_max_records_per_file(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    gen_dataset_deterministic(spark, 2500, 1).write.parquet(src)
    rows, files = table_to_parquet(
        spark,
        JobConfiguration(
            read_options={"path": src},
            write_options={"maxRecordsPerFile": 1000},
        ),
        out,
    )
    assert rows == 2500
    assert files >= 3  # 2500 rows / ≤1000 rows per file
    import pyarrow.parquet as pq

    for f in os.listdir(out):
        if f.endswith(".parquet"):
            assert pq.ParquetFile(os.path.join(out, f)).metadata.num_rows <= 1000


def test_write_with_partition_key_clusters_files(spark, tmp_path):
    from cassandra_analytics_example_spark.sources import write

    df = gen_dataset_deterministic(spark, 1000, 4)
    path = str(tmp_path / "clustered")
    write(
        df,
        {
            "path": path,
            "mode": "overwrite",
            "partition_key": "id",
            "splits": "4",
        },
    )
    back = spark.read.parquet(path)
    assert back.count() == 1000


def test_multi_format_roundtrip(spark, tmp_path):
    """The source/sink registry is format-agnostic: the same option map
    drives parquet/orc/json/csv round-trips (schema re-asserted on read for
    the text formats, which don't persist types)."""
    from cassandra_analytics_example_spark.sources import read, write
    from cassandra_analytics_example_spark.datagen import (
        TEST_SCHEMA_DDL,
        gen_dataset_deterministic,
    )
    from pyspark.sql import functions as F

    df = gen_dataset_deterministic(spark, 300, 2)
    # text formats can't hold raw binary: ship course as base64 text
    textable = df.select(
        "id", F.base64("course").alias("course_b64"), "marks"
    )
    for fmt, data, opts in (
        ("parquet", df, {}),
        ("orc", df, {}),
        ("json", textable, {}),
        ("csv", textable, {"header": "true"}),
    ):
        path = str(tmp_path / f"rt_{fmt}")
        write(data, {"format": fmt, "path": path, "mode": "overwrite", **opts})
        reader = spark.read.format(fmt).options(**opts)
        if fmt in ("json", "csv"):
            reader = reader.schema("id BIGINT, course_b64 STRING, marks BIGINT")
        back = reader.load(path)
        assert back.count() == 300, fmt
        if fmt in ("parquet", "orc"):
            # Spark re-reads columnar files as nullable; compare name+type
            assert [(f.name, f.dataType) for f in back.schema.fields] == [
                (f.name, f.dataType) for f in df.schema.fields
            ], fmt
            assert df.exceptAll(back).count() == 0, fmt
        else:
            assert textable.exceptAll(back.select("id", "course_b64", "marks")).count() == 0, fmt


import pytest


@pytest.mark.parametrize("scheme", ["file", "viewfs"])
def test_coordinated_write_uri_staging(spark, tmp_path, scheme):
    """Object-store readiness: the staged two-phase path must accept
    URI-addressed staging and targets with an IDENTICAL listener
    lifecycle on more than one Hadoop FS scheme. ``file://`` is the
    baseline; ``viewfs://`` is a genuinely different scheme resolved
    through Hadoop's mount-table layer in-process (no extra jars), so it
    proves no POSIX/scheme assumption survives anywhere in the path —
    ``s3a://``/``hdfs://``/``gs://`` differ from it only by connector
    configuration (credentials/region), not code path."""
    if scheme == "viewfs":
        h = spark._jsc.hadoopConfiguration()
        for link, dst in (
            ("/staging", f"file://{tmp_path}/vstaging"),
            ("/u1", f"file://{tmp_path}/v1"),
            ("/u2", f"file://{tmp_path}/v2"),
        ):
            h.set(f"fs.viewfs.mounttable.stagetest.link.{link}", dst)
        base = "viewfs://stagetest"
    else:
        base = f"file://{tmp_path}"
    targets = {
        "cluster1": {"path": f"{base}/u1"},
        "cluster2": {"path": f"{base}/u2"},
    }
    listener = CoordinatedStorageTransportListener(list(targets))
    n = two_clusters_coordinated_write(
        spark,
        JobConfiguration(
            write_options={
                "rows": "500",
                "staging_dir": f"{base}/staging",
            }
        ),
        targets,
        listener,
    )
    assert n == 500
    for t in targets.values():
        assert spark.read.parquet(t["path"]).count() == 500
    kinds = [e.kind for e in listener.events]
    assert kinds[0] == "transport_start"
    assert kinds.count("stage_succeeded") == 2
    assert kinds.count("import_succeeded") == 2
    assert kinds[-1] == "job_succeeded"
    # the staged inventory saw URI paths of the scheme under test, not
    # bare POSIX ones
    staged_events = [e for e in listener.events if e.kind == "object_persisted"]
    assert staged_events
    assert all(f"{scheme}:" in str(e.detail) for e in staged_events)
