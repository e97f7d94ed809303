"""The five top-level jobs of the reference (SURVEY.md §2.7), as parameterized
DataFrame pipelines.

| here                               | reference                                   |
|------------------------------------|---------------------------------------------|
| ``write_job``                      | bulk write half of every job (App.scala:242-245) |
| ``write_read_same_table``          | oneClusterWriteReadSameTable (App.scala:88-116)  |
| ``copy_table``                     | oneClusterCopyTable (App.scala:123-161)          |
| ``two_clusters_copy_table``        | twoClustersCopyTable (App.scala:168-206)         |
| ``two_clusters_coordinated_write`` | twoClustersCoordinatedWrite (App.scala:208-235)  |
| ``table_to_parquet``               | sstableToParquet (App.scala:35-82)               |

Differences by design (Spark-first, 100 TB):

* One lineage, cached when two actions share it. The reference recomputes the
  whole pipeline for its follow-up ``count()`` (``App.scala:239,244``); we
  ``persist()`` across the write+count action pair and unpersist after.
* No driver-side ``collect()`` of file lists (the reference's
  ``App.scala:76``); output inventories are computed distributed and only
  small summaries come back.
* ``table_to_parquet`` needs no work-unit RDD: Spark's task model already
  parallelizes per input split, and ``maxRecordsPerFile`` bounds output files
  exactly like the transformer's ``maxRowsPerFile(100000)``.
"""

from __future__ import annotations

import logging
import tempfile
import uuid
from typing import Callable, TypeVar

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from cassandra_analytics_example_spark.config import DataTransport, JobConfiguration
from cassandra_analytics_example_spark.datagen import (
    gen_dataset,
    gen_dataset_deterministic,
)
from cassandra_analytics_example_spark.plans import fs
from cassandra_analytics_example_spark.plans.listeners import (
    CoordinatedStorageTransportListener,
    StorageTransportListener,
)
from cassandra_analytics_example_spark.sources import read, write

log = logging.getLogger(__name__)

T = TypeVar("T")


def execute(fn: Callable[[], T], on_failure: T | None = None) -> T:
    """O2 error-reporting executor (reference ``SparkUtils.execute``,
    ``SparkUtils.scala:34-47``): run, and on failure log it with the stack
    trace and rethrow. ``on_failure`` is kept for signature parity with the
    reference, whose rethrow makes the fallback unreachable on errors — it
    is never returned here either."""
    try:
        return fn()
    except Exception as exc:
        log.error("job failed: %s", exc, exc_info=True)
        raise


def execute_job(spark: SparkSession, fn: Callable[[], object]) -> None:
    """O1 job runner (reference ``App.executeJob``, ``App.scala:26-29``):
    run the job, swallow any failure (``Try.apply(r)`` discards the
    result), always close the session."""
    try:
        fn()
    except Exception:
        log.exception("job failed (swallowed by executeJob, session closing)")
    finally:
        spark.stop()


def _generate(spark: SparkSession, config: JobConfiguration):
    """Reference ``write()`` front half (SparkUtils.scala:76-92): generate
    ``rows`` across ``splits`` partitions."""
    splits = config.splits(spark.sparkContext.defaultParallelism)
    deterministic = config.write_options.get("deterministic", "true") == "true"
    gen = gen_dataset_deterministic if deterministic else gen_dataset
    return gen(spark, config.row_count, splits)


def staged_write(
    spark: SparkSession,
    df: DataFrame,
    write_options: dict[str, str],
    targets: dict[str, dict[str, str]],
    listener: StorageTransportListener,
    n_rows: int,
) -> None:
    """S3_COMPAT transport: two-phase stage→import with lifecycle callbacks
    (the reference's storage-transport extension path, App.scala:208-235).

    Phase 1 stages the dataset once into ``staging_dir`` and fires
    object-persisted/stage-succeeded per target; phase 2 imports into every
    target only after ALL targets staged (all-or-nothing when the listener
    is coordinated).

    Object-store staging is a CONFIG change, not a code change: every path
    here (``staging_dir``, targets) is resolved through Spark's Hadoop
    FileSystem API — the write/read legs by the parquet committers, the
    inventory by ``fs.list_data_files`` — so ``file://``, ``s3a://``,
    ``hdfs://`` and ``gs://`` URIs all take this exact path with the same
    listener lifecycle (gated by test_roundtrip's ``file://`` URI run;
    the bucket/region/credential plane of the reference's
    LocalStorageTransportExtension.scala:79-99 maps onto the scheme's
    Hadoop connector configuration)."""
    listener.on_transport_start()
    stage_dir = write_options.get(
        "staging_dir", f"{tempfile.gettempdir()}/staged-{uuid.uuid4().hex}"
    )
    write(df, {**write_options, "path": stage_dir, "mode": "overwrite"})
    staged_files = fs.list_data_files(spark, stage_dir, suffix=".parquet")
    for fpath, size in staged_files:
        listener.on_object_persisted("staging", fpath, size)
    listener.on_all_objects_persisted(len(staged_files), n_rows)
    for cluster in targets:
        listener.on_stage_succeeded(cluster)
    if isinstance(listener, CoordinatedStorageTransportListener):
        if not listener.all_staged:  # pragma: no cover - defensive
            raise RuntimeError("coordinated write: staging incomplete")
    staged = spark.read.parquet(stage_dir)
    for cluster, opts in targets.items():
        write(staged, opts)
        listener.on_import_succeeded(cluster)
    listener.on_job_succeeded(0.0)


def write_job(
    spark: SparkSession,
    config: JobConfiguration,
    listener: StorageTransportListener | None = None,
) -> int:
    """Generate N rows → bulk-write → count. Returns written row count
    (reference logs "Written rows", App.scala:244).

    ``data_transport`` steers the write path exactly as in the reference
    (``App.scala:98,229-231``): DIRECT writes straight to the sink;
    S3_COMPAT routes through the staged two-phase path, firing the
    storage-transport lifecycle callbacks."""
    transport = DataTransport(config.write_options.get("data_transport", "DIRECT"))
    df = _generate(spark, config)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if transport is DataTransport.S3_COMPAT:
            n_rows = df.count()
            staged_write(
                spark,
                df,
                config.write_options,
                {"default": config.write_options},
                listener or StorageTransportListener(),
                n_rows,
            )
            return n_rows
        write(df, config.write_options)
        return df.count()
    finally:
        df.unpersist()


def read_job(spark: SparkSession, config: JobConfiguration) -> int:
    """Snapshot-read a table → count (reference "Read rows", App.scala:249)."""
    return read(spark, config.read_options).count()


def write_read_same_table(spark: SparkSession, config: JobConfiguration) -> tuple[int, int]:
    """oneClusterWriteReadSameTable: write N rows, snapshot-read the same
    table back, return (written, read)."""
    written = write_job(spark, config)
    read_back = read_job(spark, config)
    return written, read_back


def copy_table(spark: SparkSession, config: JobConfiguration) -> int:
    """oneClusterCopyTable: read source → bulk-write into target → count
    (reference ``copyTable`` = ``writeExisting(read()).get.count()``,
    App.scala:237-240). One cached lineage serves both the write and the
    count instead of re-reading the source."""
    df = read(spark, config.read_options)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        write(df, config.write_options)
        return df.count()
    finally:
        df.unpersist()


def two_clusters_copy_table(
    spark: SparkSession, config: JobConfiguration, second_write_options: dict[str, str]
) -> tuple[int, int]:
    """twoClustersCopyTable: write on cluster 1 → read cluster 1 → write the
    same data into cluster 2. Returns (written_first, copied_to_second)."""
    written = write_job(spark, config)
    df = read(spark, config.read_options)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        write(df, second_write_options)
        copied = df.count()
    finally:
        df.unpersist()
    return written, copied


def two_clusters_coordinated_write(
    spark: SparkSession,
    config: JobConfiguration,
    targets: dict[str, dict[str, str]],
    listener: CoordinatedStorageTransportListener | None = None,
) -> int:
    """twoClustersCoordinatedWrite: all-or-nothing write into N targets via a
    staging area (reference S3_COMPAT transport + coordination signals,
    App.scala:208-235).

    Two-phase: (1) stage the dataset once into a staging directory, firing
    object-persisted/stage-succeeded callbacks per target; (2) only when every
    target staged successfully, import (rename/copy) into each target path.
    On any staging failure nothing is imported. Returns written rows.
    """
    listener = listener or CoordinatedStorageTransportListener(list(targets))
    df = _generate(spark, config).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n_rows = df.count()
        staged_write(
            spark,
            df,
            config.write_options,
            {c: {**opts, "mode": "overwrite"} for c, opts in targets.items()},
            listener,
            n_rows,
        )
        return n_rows
    finally:
        df.unpersist()


def table_to_parquet(
    spark: SparkSession, config: JobConfiguration, output_dir: str
) -> tuple[int, int]:
    """sstableToParquet: re-materialize a table into parquet files of at most
    100 000 rows each (reference App.scala:35-82).

    The reference resolves token partitions on the driver and maps an RDD of
    work units through an SSTableTransformer; Spark's native task-per-split
    read + ``maxRecordsPerFile`` write is the same physical shape with no
    driver-side work-unit bookkeeping and no ``collect()`` of file names.
    Returns (rows, files_produced).
    """
    df = read(spark, config.read_options)
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        write(
            df,
            {
                **config.write_options,
                "path": output_dir,
                "mode": "overwrite",
                "maxRecordsPerFile": config.write_options.get(
                    "maxRecordsPerFile", 100_000
                ),
            },
        )
        rows = df.count()
    finally:
        df.unpersist()
    n_files = len(fs.list_data_files(spark, output_dir, suffix=".parquet"))
    return rows, n_files
