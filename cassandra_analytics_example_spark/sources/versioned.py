"""Versioned parquet tables: an ACID-lite transaction log with optimistic
concurrency and time travel.

The snapshot layer (sources/snapshot.py) freezes a READ set; this module
versions the WRITES: every ``append``/``overwrite`` commits a JSON log
entry (``_log/v000001.json`` …) listing the immutable data files it adds
and removes, and a read AT version v replays entries 1..v — the same
manifest-log design Delta/Iceberg use, at file-list scale:

* data files are immutable and uniquely named; only the log assigns them
  meaning, so a failed writer leaves garbage files but never a corrupt
  table;
* commit = exclusive-create of the next log file (``open(..., 'x')``) —
  two writers racing for version N+1 produce exactly one winner; the
  loser re-reads the log and retries on top (optimistic concurrency).
  On a local/NFS/HDFS filesystem exclusive-create is atomic; on S3-class
  object stores the equivalent is a conditional PUT (If-None-Match) —
  the log protocol is unchanged;
* time travel is a pure log replay: reading AS OF v touches only the
  files live at v — a 100 TB table's version read costs the same as a
  current read plus a few KB of log.

Log entries are metadata (KB per commit, file paths only) — the driver
never touches data; Spark reads the replayed file list directly.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"
_MAX_RETRIES = 20


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _entry_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"v{version:06d}.json")


def _versions(root: str) -> list[int]:
    d = _log_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def current_version(root: str) -> int:
    """Latest committed version; 0 for an empty/uninitialized table."""
    vs = _versions(root)
    return vs[-1] if vs else 0


def history(root: str) -> list[dict]:
    """All commit entries, oldest first — the table's audit trail."""
    return [
        json.load(open(_entry_path(root, v))) for v in _versions(root)
    ]


def files_at(root: str, version: int | None = None) -> list[str]:
    """Replay the log through ``version`` (default: latest) and return the
    live data-file paths."""
    target = current_version(root) if version is None else version
    live: set[str] = set()
    for v in _versions(root):
        if v > target:
            break
        entry = json.load(open(_entry_path(root, v)))
        live -= set(entry.get("remove", []))
        live |= set(entry.get("add", []))
    return sorted(os.path.join(root, _DATA, f) for f in live)


def _write_data_files(df: DataFrame, root: str) -> list[str]:
    """Materialize ``df`` as uniquely-named immutable parquet files under
    ``data/``; returns their names (relative to ``data/``). Files carry a
    commit-unique prefix, so concurrent writers never collide and an
    aborted write orphans files without corrupting anything."""
    token = uuid.uuid4().hex
    staging = os.path.join(root, _DATA, f".stage-{token}")
    df.write.mode("overwrite").parquet(staging)
    names = []
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            final = f"{token}-{f}"
            os.replace(
                os.path.join(staging, f), os.path.join(root, _DATA, final)
            )
            names.append(final)
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    return names


def _try_commit(root: str, entry: dict) -> bool:
    """Exclusive-create the next log entry; False on version conflict."""
    os.makedirs(_log_dir(root), exist_ok=True)
    try:
        with open(_entry_path(root, entry["version"]), "x") as fh:
            json.dump(entry, fh)
        return True
    except FileExistsError:
        return False


def append(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Commit ``df`` as an APPEND; returns the new version. Concurrent
    appends retry onto the next version — appends commute, so the retry
    is always safe."""
    os.makedirs(os.path.join(root, _DATA), exist_ok=True)
    names = _write_data_files(df, root)
    for _ in range(_MAX_RETRIES):
        v = current_version(root) + 1
        if _try_commit(root, {"version": v, "op": "append", "add": names}):
            return v
    raise RuntimeError(f"append: lost {_MAX_RETRIES} commit races on {root}")


def overwrite(spark: SparkSession, root: str, df: DataFrame) -> int:
    """Commit ``df`` as an OVERWRITE (remove everything live, add the new
    files) — one atomic version step; old versions stay readable (time
    travel) because removed files are only delisted, never deleted.
    Unlike append, an overwrite does NOT commute with concurrent commits:
    on a version conflict it raises rather than clobbering a state it
    never observed."""
    os.makedirs(os.path.join(root, _DATA), exist_ok=True)
    base = current_version(root)
    live = [os.path.basename(p) for p in files_at(root, base)]
    names = _write_data_files(df, root)
    entry = {
        "version": base + 1,
        "op": "overwrite",
        "add": names,
        "remove": live,
    }
    if not _try_commit(root, entry):
        raise RuntimeError(
            f"overwrite: version {base + 1} committed concurrently on "
            f"{root}; re-read and retry"
        )
    return base + 1


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the table AS OF ``version`` (default: latest). An empty table
    (version 0) raises — there is no schema to infer."""
    files = files_at(root, version)
    if not files:
        raise ValueError(
            f"versioned table {root} has no live files at version "
            f"{version if version is not None else current_version(root)}"
        )
    return spark.read.parquet(*files)
