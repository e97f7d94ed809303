"""Dataset-versioning operators: snapshot diff for incremental pipelines.

A 100 TB training corpus is rebuilt incrementally: each refresh must know
what changed since the last blessed snapshot — new documents enter the
dedup/quality gauntlet, removed ones propagate deletions, changed ones are
re-fingerprinted. Diffing two snapshots is ONE full-outer equi-join on the
document key comparing content hashes: a single co-partitioned shuffle on a
uniform key, no windows, no driver state. Pairs with the manifest-based
snapshot isolation in sources/snapshots.py (the reference's
``createSnapshot``/``snapshotName`` read discipline, App.scala:113-114) and
the incremental hash-inventory dedup (operators/dedup.py:dedup_against).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: unit-separator joint for multi-column content hashing; cannot collide
#: with readable text columns.
_SEP = chr(31)


def content_hash(cols: Sequence[str]) -> F.Column:
    """md5 over the ``_SEP``-joined column values (NULL → empty string, the
    ``concat_ws`` convention DuckDB shares). SQL twin:
    ``md5(concat_ws(chr(31), col1, col2, ...))``."""
    return F.md5(F.concat_ws(_SEP, *[F.col(c).cast("string") for c in cols]))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    payload_cols: Sequence[str],
    *,
    status_col: str = "status",
    keep_unchanged: bool = False,
) -> DataFrame:
    """Classify every document key across two snapshots as ``added``
    (key only in ``new``), ``removed`` (only in ``old``), ``changed``
    (both, different content hash) or — when ``keep_unchanged`` —
    ``unchanged``. Returns ``(id_col, status_col)``.

    Hashes are computed in a pre-join projection so the join carries one
    32-char hash per side instead of the full payload — at corpus scale
    that is the difference between shuffling 100 TB and shuffling the key
    inventory."""
    h = content_hash(payload_cols)
    o = old.select(F.col(id_col), h.alias("__h_old"))
    n = new.select(F.col(id_col), h.alias("__h_new"))
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(F.col(id_col), status.alias(status_col))
    if not keep_unchanged:
        out = out.filter(F.col(status_col) != "unchanged")
    return out


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    id_col: str,
    *,
    delete_col: str | None = None,
) -> DataFrame:
    """Batch MERGE: apply an updates batch onto a target snapshot —
    matched keys take the update's row, unmatched update keys insert,
    unmatched target keys survive, and (with ``delete_col``) updates
    flagged true delete their key. The write surface the reference's
    append-only bulk writer lacks; at scale this is ONE full-outer
    equi-join on the uniform key — the same shape (and cost) as
    :func:`snapshot_diff`, and the batch half of the streaming
    foreachBatch upsert sink.

    Column set of the result = column set of ``target``; ``updates``
    must carry the same columns (plus optionally ``delete_col``).
    """
    cols = [c for c in target.columns]
    upd_payload = [c for c in cols if c != id_col]
    u = updates.select(
        F.col(id_col),
        *[F.col(c) for c in upd_payload],
        (
            F.col(delete_col)
            if delete_col is not None
            else F.lit(False)
        ).alias("__del"),
    )
    t = target.select(
        F.col(id_col), *[F.col(c).alias(f"__t_{c}") for c in upd_payload]
    )
    joined = t.join(
        u, id_col, "full_outer"
    )
    matched_update = F.col("__del").isNotNull()
    keep = ~F.coalesce(F.col("__del"), F.lit(False))
    merged = joined.filter(keep).select(
        F.col(id_col),
        *[
            F.when(matched_update, F.col(c))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in upd_payload
        ],
    )
    return merged
