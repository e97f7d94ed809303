"""Real spark-cassandra-connector smoke, behind an availability guard.

Decision record (round 8): the connector jar CANNOT be vendored into this
environment — the sandbox has no network route to Maven Central (probed:
DNS resolution fails), no ivy/maven cache, and no connector jar anywhere
on disk.  The real-jar branch of ``sources/registry.py:cassandra_format``
therefore stays contract-tested (option-map vocabulary pinned in
``test_sources_control.py``) plus THIS guarded smoke, which activates
automatically on any deployment where the jar is present:

* drop the jar on the classpath (``spark.jars`` /
  ``SPARK_GRAFT_CASSANDRA_JAR``) and these tests run — asserting the
  selection branch prefers the real connector and that the pinned option
  maps reach DataSourceV2 resolution without analysis errors (no cluster
  needed: resolution happens before any connection attempt);
* without the jar they skip with the reason recorded, so CI output shows
  the gap as a deployment caveat instead of silent green.
"""

from __future__ import annotations

import os

import pytest

from cassandra_analytics_example_spark.sources.registry import (
    CASSANDRA_FORMAT,
    cassandra_format,
)


def _connector_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.cassandra.DefaultSource"
        )
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def connector_spark(spark):
    """The suite session, plus the optional jar injection point: if
    SPARK_GRAFT_CASSANDRA_JAR names a jar, a fresh session would be needed
    to add it (spark.jars is create-time) — document rather than restart
    mid-suite; classpath-provided jars are picked up as-is."""
    jar = os.environ.get("SPARK_GRAFT_CASSANDRA_JAR")
    if jar and not _connector_available(spark):
        pytest.skip(
            "SPARK_GRAFT_CASSANDRA_JAR is set but the suite session was "
            "built without it; run the smoke standalone with spark.jars"
        )
    return spark


def test_format_selection_prefers_real_connector(connector_spark):
    spark = connector_spark
    if not _connector_available(spark):
        pytest.skip(
            "spark-cassandra-connector not on classpath (cannot be "
            "vendored: sandbox has no network; decision recorded in "
            "module docstring) — stand-in branch covers the contract"
        )
    assert cassandra_format(spark) == CASSANDRA_FORMAT


def test_pinned_option_maps_resolve_through_real_connector(connector_spark):
    """Build a reader with the exact translated option vocabulary the
    contract tests pin and drive it into the connector.  The real
    DataSourceV2 resolves the table SCHEMA from live cluster metadata,
    so with no cluster listening ``load()`` fails at the CONNECTION
    stage — which still proves what this smoke is for: the option names
    were accepted and the connector proceeded to contact the configured
    hosts.  Only an option/analysis rejection fails the test; a
    connection-stage error passes (and a real cluster passes fully)."""
    spark = connector_spark
    if not _connector_available(spark):
        pytest.skip(
            "spark-cassandra-connector not on classpath (cannot be "
            "vendored: sandbox has no network; decision recorded in "
            "module docstring)"
        )
    from pyspark.errors.exceptions.captured import AnalysisException

    from cassandra_analytics_example_spark.sources.registry import (
        get_reader,
    )

    opts = {
        "format": "cassandra",
        "sidecar_contact_points": "h1,h2",
        "keyspace": "ks",
        "table": "t",
        "dc": "dc1",
        "consistencyLevel": "LOCAL_QUORUM",
    }
    reader = get_reader(spark, opts)
    try:
        df = reader.load()
        assert df.schema is not None  # live cluster: full resolution
    except AnalysisException as e:
        pytest.fail(
            f"connector rejected the pinned option map at analysis: {e}"
        )
    except Exception as e:  # noqa: BLE001 — connection-stage classes vary
        msg = str(e).lower()
        assert any(
            s in msg
            for s in ("connect", "contact", "host", "refused", "timeout")
        ), f"unexpected non-connection failure through the connector: {e}"
