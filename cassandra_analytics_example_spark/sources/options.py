"""Connector option translation — pure functions, no Spark session.

The registry's option maps mix two vocabularies: registry CONTROL keys
(``path``, ``partition_key``, ``splits``, ``staging_dir``, generator knobs)
that the registry itself consumes, and backend options that must reach the
underlying DataSource untouched. The Cassandra surface mirrors the
reference's maps verbatim (read: ``App.scala:107-115`` —
``sidecar_contact_points``/``keyspace``/``table``/``dc``/
``consistencyLevel``/``snapshotName``/``createSnapshot``/``sizing``;
write: ``App.scala:151-160`` — ``local_dc``/``bulk_writer_cl``/
``data_transport`` et al., bound in ``SparkUtils.scala:56-65``).

Kept as pure dict→dict functions so the translation is unit-testable
without the connector jar on the classpath.
"""

from __future__ import annotations

#: option-map keys consumed by the registry itself, never forwarded to the
#: underlying DataFrameReader/Writer.
CONTROL_KEYS = frozenset(
    {
        "format",
        "mode",
        "path",
        "partition_key",
        "splits",
        "staging_dir",
        "rows",
        "deterministic",
        "maxRecordsPerFile",
        "snapshot_root",
    }
)

#: reference read-side option names (App.scala:107-115) — documentation of
#: the known surface; unknown keys still pass through (the connector owns
#: its own vocabulary and validation).
CASSANDRA_READ_OPTIONS = frozenset(
    {
        "sidecar_contact_points",
        "keyspace",
        "table",
        "dc",
        "consistencyLevel",
        "snapshotName",
        "createSnapshot",
        "clearSnapshot",
        "sizing",
        "quote_identifiers",
    }
)

#: reference write-side option names (App.scala:151-160, 216-231).
CASSANDRA_WRITE_OPTIONS = frozenset(
    {
        "sidecar_contact_points",
        "keyspace",
        "table",
        "local_dc",
        "bulk_writer_cl",
        "number_splits",
        "data_transport",
        "data_transport_extension_class",
        "storage_client_endpoint_override",
        "coordinated_write_config",
        "job_timeout_seconds",
        "quote_identifiers",
    }
)


def cassandra_options(options: dict[str, str], side: str) -> dict[str, str]:
    """Translate a registry option map into the Cassandra connector's option
    map for ``side`` ("read" | "write").

    Registry control keys are stripped (forwarding ``path``/``splits``/
    ``rows`` to the connector would fail or silently misconfigure it);
    everything else passes through verbatim. ``keyspace`` and ``table`` are
    mandatory — the reference addresses whole tables only."""
    if side not in ("read", "write"):
        raise ValueError(f"side must be 'read' or 'write', got {side!r}")
    out = {k: v for k, v in options.items() if k not in CONTROL_KEYS}
    missing = {"keyspace", "table"} - out.keys()
    if missing:
        raise ValueError(
            f"cassandra {side} options require {sorted(missing)} "
            f"(got keys {sorted(options)})"
        )
    return out
