"""Plan-truncation helper for iterative operators.

Iterative DataFrame algorithms (label propagation, Lloyd's iterations) must
truncate their lineage every round or the plan grows unboundedly and
re-optimization cost compounds. Two ways to truncate:

* ``localCheckpoint`` — executor-local block storage. Cheap (no FS round
  trip) and the right default on ``local[*]``, but the blocks die with an
  executor: on a real multi-executor cluster a lost executor aborts the job.
* reliable ``checkpoint`` — writes to a fault-tolerant checkpoint directory
  (HDFS/S3 on a cluster). Survives executor loss; costs one write+read of
  the intermediate per round.

Operators take ``checkpoint_dir: str | None``: a directory selects the
reliable path, ``None`` the local one — the knob the r3 review asked for in
place of a docstring caveat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


_CKPT_BASE_ATTR = "_cassandra_analytics_checkpoint_base"


def truncate_plan(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """Materialize ``df`` and return a lineage-free DataFrame over the
    materialized blocks (eager in both modes).

    ``setCheckpointDir`` is session-global and mints a fresh UUID subdir
    per call, so it runs only when this call's base dir differs from the
    last one THIS module set (tracked on the SparkContext) — repeated
    iterations reuse one subdir, and an operator that never passes a
    ``checkpoint_dir`` never perturbs the session's setting.
    """
    if checkpoint_dir:
        sc = df.sparkSession.sparkContext
        if getattr(sc, _CKPT_BASE_ATTR, None) != checkpoint_dir:
            sc.setCheckpointDir(checkpoint_dir)
            setattr(sc, _CKPT_BASE_ATTR, checkpoint_dir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
