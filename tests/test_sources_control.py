"""Control-plane parity: Cassandra option translation, snapshot-isolation
reads, DataTransport routing, and the O1/O2 job wrappers.

The Cassandra connector jar is not on this classpath, so the cassandra
branch is exercised at the option-translation level (a pure function —
exactly what would reach ``DataFrameReader.options``) and the write
discipline at the plan level.
"""

from __future__ import annotations

import pytest

from cassandra_analytics_example_spark.config import JobConfiguration
from cassandra_analytics_example_spark.datagen import gen_dataset_deterministic
from cassandra_analytics_example_spark.plans import (
    execute,
    execute_job,
    table_to_parquet,
    write_job,
)
from cassandra_analytics_example_spark.plans.listeners import (
    StorageTransportListener,
)
from cassandra_analytics_example_spark.sources import (
    apply_write_discipline,
    cassandra_options,
    create_snapshot,
    read,
    read_snapshot,
    write,
)

# the reference's own option maps, verbatim (App.scala:107-115, 151-160)
REF_READ_OPTIONS = {
    "sidecar_contact_points": "spark-master-1,cassandra-node-1,cassandra-node-2",
    "keyspace": "spark_test",
    "table": "test",
    "dc": "dc1",
    "consistencyLevel": "ONE",
    "snapshotName": "8e12cba2-6aba-4a6a-a46a-demo",
    "createSnapshot": "true",
    "sizing": "default",
}
REF_WRITE_OPTIONS = {
    "sidecar_contact_points": "spark-master-1,cassandra-node-1,cassandra-node-2",
    "keyspace": "spark_test",
    "table": "test2",
    "local_dc": "dc1",
    "bulk_writer_cl": "ALL",
    "rows": "10000000",
    "data_transport": "DIRECT",
}


class TestCassandraOptionTranslation:
    def test_read_options_pass_through(self):
        out = cassandra_options({**REF_READ_OPTIONS, "format": "cassandra"}, "read")
        assert out == REF_READ_OPTIONS  # format stripped, the rest verbatim

    def test_write_options_strip_control_keys(self):
        mixed = {
            **REF_WRITE_OPTIONS,
            "format": "cassandra",
            "mode": "append",
            "path": "/should/never/reach/connector",
            "partition_key": "id",
            "splits": "8",
            "staging_dir": "/tmp/x",
            "deterministic": "true",
            "maxRecordsPerFile": "100000",
        }
        out = cassandra_options(mixed, "write")
        expected = {k: v for k, v in REF_WRITE_OPTIONS.items() if k != "rows"}
        assert out == expected
        # every reference connector key survives; every registry key is gone
        for k in ("keyspace", "table", "local_dc", "bulk_writer_cl", "data_transport"):
            assert k in out
        for k in ("path", "partition_key", "splits", "rows", "format", "mode"):
            assert k not in out

    def test_keyspace_and_table_required(self):
        with pytest.raises(ValueError, match="keyspace"):
            cassandra_options({"table": "test"}, "read")
        with pytest.raises(ValueError, match="table"):
            cassandra_options({"keyspace": "spark_test"}, "write")

    def test_side_validated(self):
        with pytest.raises(ValueError, match="side"):
            cassandra_options(REF_READ_OPTIONS, "sideways")

    # ---- VERDICT r6 task 6: contract pins for BOTH transports against
    # the documented connector option names (SparkUtils.scala:56-65,
    # App.scala:107-115 read / :151-160, :211-231 write) — a future
    # rename in the translation layer can't silently break the
    # real-cluster path.

    REF_S3_COMPAT_WRITE = {
        "coordinated_write_config": (
            '{"cluster_1": {"sidecarContactPoints": '
            '["spark-master-1:9043"], "localDc": "dc1"}, '
            '"cluster_2": {"sidecarContactPoints": '
            '["spark-master-2:9043"], "localDc": "dc2"}}'
        ),
        "keyspace": "spark_test",
        "table": "test",
        "bulk_writer_cl": "LOCAL_QUORUM",
        "data_transport": "S3_COMPAT",
        "data_transport_extension_class": (
            "org.apache.cassandra.spark.analytics.example."
            "LocalCoordinatedStorageTransportExtension"
        ),
        "storage_client_endpoint_override": "http://s3-mock:9090",
    }

    def test_s3_compat_write_options_pin(self):
        # the reference's coordinated S3_COMPAT map (App.scala:211-231)
        # plus registry control keys → the connector sees EXACTLY the
        # reference map (rows is a generator knob, never forwarded)
        mixed = {
            **self.REF_S3_COMPAT_WRITE,
            "rows": "1000000",
            "format": "cassandra",
            "staging_dir": "/tmp/stage",
            "partition_key": "id",
        }
        assert cassandra_options(mixed, "write") == self.REF_S3_COMPAT_WRITE

    def test_translated_keys_stay_inside_documented_vocabulary(self):
        from cassandra_analytics_example_spark.sources.options import (
            CASSANDRA_READ_OPTIONS,
            CASSANDRA_WRITE_OPTIONS,
        )

        read_out = cassandra_options(
            {**REF_READ_OPTIONS, "format": "cassandra"}, "read"
        )
        assert set(read_out) <= CASSANDRA_READ_OPTIONS
        for m in (REF_WRITE_OPTIONS, self.REF_S3_COMPAT_WRITE):
            out = cassandra_options({**m, "format": "cassandra"}, "write")
            assert set(out) <= CASSANDRA_WRITE_OPTIONS

    def test_documented_vocabulary_matches_reference_surface(self):
        # the names the reference actually uses, verbatim from App.scala
        from cassandra_analytics_example_spark.sources.options import (
            CASSANDRA_READ_OPTIONS,
            CASSANDRA_WRITE_OPTIONS,
        )

        ref_read = {
            "sidecar_contact_points", "keyspace", "table", "dc",
            "consistencyLevel", "snapshotName", "createSnapshot", "sizing",
        }
        ref_write = {
            "sidecar_contact_points", "keyspace", "table", "local_dc",
            "bulk_writer_cl", "data_transport",
            "data_transport_extension_class",
            "storage_client_endpoint_override", "coordinated_write_config",
        }
        assert ref_read <= CASSANDRA_READ_OPTIONS
        assert ref_write <= CASSANDRA_WRITE_OPTIONS
        # control keys and connector keys must never collide — a key in
        # both would be consumed by the registry and silently dropped
        from cassandra_analytics_example_spark.sources.options import (
            CONTROL_KEYS,
        )

        assert not (CONTROL_KEYS & CASSANDRA_READ_OPTIONS)
        assert not (CONTROL_KEYS & CASSANDRA_WRITE_OPTIONS)


def test_write_discipline_token_sort_plan(spark):
    """The bulk-writer discipline (reference library's token sort) must be
    an explicit hash repartition on the key + in-partition sort — on every
    backend, cassandra included."""
    df = gen_dataset_deterministic(spark, 1000, 4)
    out = apply_write_discipline(
        df, {"format": "cassandra", "partition_key": "id", "splits": "8"}
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" in plan and "id" in plan
    assert "Sort" in plan
    # no-op without the key
    same = apply_write_discipline(df, {"format": "cassandra"})
    assert same is df


class TestSnapshotIsolation:
    def test_snapshot_read_ignores_later_appends(self, spark, tmp_path):
        # fully-qualified URI: proves the Hadoop FS path, not os.* calls
        table = f"file://{tmp_path}/t"
        write(gen_dataset_deterministic(spark, 1000, 4), {"path": table})
        name = create_snapshot(spark, table)
        write(gen_dataset_deterministic(spark, 500, 2), {"path": table})
        assert read_snapshot(spark, table, name).count() == 1000
        assert spark.read.parquet(table).count() == 1500

    def test_registry_read_create_snapshot_option(self, spark, tmp_path):
        table = f"file://{tmp_path}/t2"
        write(gen_dataset_deterministic(spark, 800, 4), {"path": table})
        snap = read(
            spark,
            {"path": table, "createSnapshot": "true", "snapshotName": "snap-a"},
        )
        write(gen_dataset_deterministic(spark, 200, 2), {"path": table})
        # frozen manifest: the captured DataFrame and any re-read by name
        assert snap.count() == 800
        assert read(spark, {"path": table, "snapshotName": "snap-a"}).count() == 800
        assert read(spark, {"path": table}).count() == 1000

    def test_snapshot_requires_data(self, spark, tmp_path):
        with pytest.raises(Exception):
            create_snapshot(spark, f"file://{tmp_path}/empty")


class TestDataTransportRouting:
    def test_direct_write_fires_no_transport_callbacks(self, spark, tmp_path):
        listener = StorageTransportListener()
        n = write_job(
            spark,
            JobConfiguration(
                write_options={
                    "rows": "500",
                    "path": str(tmp_path / "direct"),
                    "data_transport": "DIRECT",
                }
            ),
            listener,
        )
        assert n == 500
        assert listener.events == []

    def test_s3_compat_routes_through_staged_path(self, spark, tmp_path):
        listener = StorageTransportListener()
        n = write_job(
            spark,
            JobConfiguration(
                write_options={
                    "rows": "500",
                    "path": str(tmp_path / "staged_target"),
                    "staging_dir": str(tmp_path / "staging"),
                    "data_transport": "S3_COMPAT",
                }
            ),
            listener,
        )
        assert n == 500
        assert spark.read.parquet(str(tmp_path / "staged_target")).count() == 500
        kinds = [e.kind for e in listener.events]
        assert kinds[0] == "transport_start"
        assert "object_persisted" in kinds
        assert "all_objects_persisted" in kinds
        assert kinds.count("stage_succeeded") == 1
        assert kinds.count("import_succeeded") == 1
        assert kinds[-1] == "job_succeeded"
        # stage strictly precedes import
        assert kinds.index("stage_succeeded") < kinds.index("import_succeeded")


class TestJobWrappers:
    def test_execute_returns_value(self):
        assert execute(lambda: 42) == 42

    def test_execute_logs_and_rethrows(self, caplog):
        with caplog.at_level("ERROR"):
            with pytest.raises(RuntimeError, match="boom"):
                execute(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
        assert any("job failed" in r.message for r in caplog.records)

    def test_execute_job_swallows_and_closes(self, caplog):
        class FakeSession:
            stopped = False

            def stop(self):
                self.stopped = True

        ok = FakeSession()
        execute_job(ok, lambda: 1)
        assert ok.stopped

        bad = FakeSession()
        with caplog.at_level("ERROR"):
            execute_job(bad, lambda: (_ for _ in ()).throw(RuntimeError("x")))
        assert bad.stopped  # session closed even on failure
        assert any("swallowed" in r.message for r in caplog.records)


def test_table_to_parquet_hadoop_fs_inventory(spark, tmp_path):
    """File inventory must work against a fully-qualified file:/ URI (the
    Hadoop FS path), not POSIX listdir."""
    src = f"file://{tmp_path}/src"
    write(gen_dataset_deterministic(spark, 1000, 2), {"path": src})
    rows, n_files = table_to_parquet(
        spark,
        JobConfiguration(
            read_options={"path": src},
            write_options={"maxRecordsPerFile": "300"},
        ),
        f"file://{tmp_path}/out",
    )
    assert rows == 1000
    assert n_files >= 4  # 1000 rows / ≤300 per file


class TestMalformedIngestion:
    """Dirty-input robustness through the source registry: a 100 TB crawl
    ALWAYS contains malformed records; the engine must route them, not
    die on them. Exercises the registry's option pass-through with the
    three Spark parse modes."""

    JSON_LINES = [
        '{"id": 1, "v": "ok"}',
        '{"id": 2, "v": "also ok"}',
        "{not json at all",
        '{"id": "not-a-number", "v": 3}',
    ]

    def _write(self, tmp_path):
        p = tmp_path / "dirty.json"
        p.write_text("\n".join(self.JSON_LINES) + "\n")
        return str(p)

    def test_permissive_mode_routes_corrupt_records(self, spark, tmp_path):
        from cassandra_analytics_example_spark.sources.registry import get_reader

        path = self._write(tmp_path)
        df = (
            get_reader(
                spark,
                {
                    "format": "json",
                    "mode_parse": "PERMISSIVE",  # registry passes unknown keys through
                    "columnNameOfCorruptRecord": "_bad",
                },
            )
            .schema("id bigint, v string, _bad string")
            .load(path)
        )
        rows = df.collect()
        assert len(rows) == 4
        bad = [r for r in rows if r._bad is not None]
        good = [r for r in rows if r._bad is None]
        assert len(good) == 2 and {r.id for r in good} == {1, 2}
        # both the unparseable line and the type-mismatched record routed
        assert len(bad) == 2

    def test_dropmalformed_keeps_only_clean_rows(self, spark, tmp_path):
        from cassandra_analytics_example_spark.sources.registry import get_reader

        path = self._write(tmp_path)
        df = (
            get_reader(spark, {"format": "json", "mode": "DROPMALFORMED"})
            .schema("id bigint, v string")
            .load(path)
        )
        # registry treats 'mode' as writer save-mode control; reader parse
        # mode must be set via option on the returned reader
        df2 = (
            spark.read.format("json")
            .option("mode", "DROPMALFORMED")
            .schema("id bigint, v string")
            .load(path)
        )
        # DROPMALFORMED's row count depends on which columns are PARSED:
        # materializing the full schema drops both the syntactically-bad
        # line and the type-mismatched record (2 survive), while a pruned
        # count() never attempts the id coercion, so the type-mismatched
        # record passes (3 survive). A malformed-rate monitor must
        # therefore count over the full schema, not count(*).
        rows = df2.collect()
        assert len(rows) == 2
        assert sorted(r.id for r in rows) == [1, 2]
        assert df2.count() == 3

    def test_failfast_raises_on_dirty_input(self, spark, tmp_path):
        path = self._write(tmp_path)
        df = (
            spark.read.format("json")
            .option("mode", "FAILFAST")
            .schema("id bigint, v string")
            .load(path)
        )
        with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
            df.collect()
