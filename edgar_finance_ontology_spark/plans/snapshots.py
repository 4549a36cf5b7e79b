"""Minimal Iceberg-semantics snapshot tables over parquet.

The north-star deployment materializes the triple stream into
partitioned Iceberg tables; this container has no Iceberg runtime, so
this module implements the load-bearing subset of that table format
from scratch — enough that the maintenance pipeline gets real table
semantics instead of directory-overwrite semantics:

* **Immutable data files.** Every commit writes NEW parquet files under
  `data/`; no data file is ever modified or deleted by a commit. A
  patch that logically rewrites a partition adds files and stops
  referencing the replaced ones.
* **Atomic commits.** A snapshot is one JSON metadata file
  `_snapshots/v<NNNNNNNN>.json` listing exactly the data files (path,
  partition values, row count) visible in that version. The file is
  written to a temp name, fsync'd, then `os.link`ed to its final name
  — link fails if the version already exists, which is the optimistic-
  concurrency conflict check (same role as Iceberg's atomic swap of
  the table-metadata pointer). A writer that dies mid-commit leaves
  orphan data files and NO new metadata: readers stay on the previous
  snapshot, and `expire_snapshots` collects the orphans.
* **Time travel.** `read_snapshot(..., snapshot_id=k)` reads version k
  exactly as committed, concurrently with writers appending new
  versions (readers pin a file list, never a directory).
* **Metadata partition pruning.** Partition values live in the
  snapshot metadata; `read_snapshot(partition_filter=...)` prunes the
  FILE LIST before Spark ever lists or opens anything — the moral
  equivalent of Iceberg manifest pruning, and the reason a 1-bucket
  patch of a 10^12-triple table reads one bucket's files, not a
  directory tree listing of all of them.
* **Snapshot expiry.** `expire_snapshots(keep_last=k)` drops old
  metadata and deletes data files no surviving snapshot references
  (plus orphans from crashed commits).

Partition columns are kept IN the data files (the hive-style writer
path partitions on `__p_<col>` duplicates and drops only those), so a
pinned file list reads back with full schema and no directory-name
parsing on the read path.

Scale posture: metadata size is O(files-per-snapshot) JSON on the
driver — the same order as Iceberg's manifest lists. At 10^12 triples
with ~512 MB files that is ~10^5 entries per snapshot; listing and
pruning that on the driver is exactly what Iceberg's planner does.
Data-file moves are O(#new files) renames within one filesystem.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_META_DIR = "_snapshots"
_DATA_DIR = "data"
_TMP_DIR = "_tmp"


class CommitConflict(RuntimeError):
    """Another writer committed the same version first."""


def _meta_dir(root) -> pathlib.Path:
    return pathlib.Path(root) / _META_DIR


def _vname(snapshot_id: int) -> str:
    return f"v{snapshot_id:08d}.json"


def snapshot_ids(root) -> list[int]:
    """Committed snapshot ids, ascending. [] for a store never
    committed to."""
    md = _meta_dir(root)
    if not md.is_dir():
        return []
    return sorted(
        int(p.stem[1:]) for p in md.glob("v*.json")
    )


def latest_snapshot(root) -> int | None:
    ids = snapshot_ids(root)
    return ids[-1] if ids else None


def snapshot_meta(root, snapshot_id: int) -> dict:
    with open(_meta_dir(root) / _vname(snapshot_id)) as fh:
        return json.load(fh)


def table_exists(root) -> bool:
    return latest_snapshot(root) is not None


def _write_data_files(
    spark: SparkSession, root, df: DataFrame, partition_cols,
) -> list[dict]:
    """Write `df` as immutable parquet files under data/ and return
    their manifest entries. Partition columns stay in the files; the
    hive layout of the temp write only supplies file-splitting and the
    partition values (parsed once, from the temp dir names)."""
    import pyarrow.parquet as pq

    root = pathlib.Path(root)
    (root / _DATA_DIR).mkdir(parents=True, exist_ok=True)
    tmp = root / _TMP_DIR / uuid.uuid4().hex
    out = df
    for c in partition_cols:
        out = out.withColumn(f"__p_{c}", F.col(c))
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy([f"__p_{c}" for c in partition_cols])
    writer.parquet(str(tmp))

    entries = []
    for p in sorted(tmp.rglob("*.parquet")):
        part_vals = {}
        for piece in p.relative_to(tmp).parts[:-1]:
            if "=" in piece:
                k, v = piece.split("=", 1)
                if k.startswith("__p_"):
                    part_vals[k[4:]] = v
        dest_rel = f"{_DATA_DIR}/{uuid.uuid4().hex}.parquet"
        dest = root / dest_rel
        os.replace(p, dest)
        entries.append({
            "path": dest_rel,
            "partition": part_vals,
            "rows": pq.ParquetFile(dest).metadata.num_rows,
        })
    shutil.rmtree(tmp, ignore_errors=True)
    return entries


def _commit_meta(root, meta: dict) -> int:
    """Atomically publish `meta` as the next version. Retries version
    resolution once per conflict is NOT attempted — the caller decided
    what the snapshot means relative to a parent; a lost race must be
    re-planned, not blindly re-linked (Iceberg's validation-exception
    contract)."""
    md = _meta_dir(root)
    md.mkdir(parents=True, exist_ok=True)
    sid = meta["snapshot_id"]
    tmp = md / f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, md / _vname(sid))
    except FileExistsError:
        raise CommitConflict(
            f"snapshot {sid} already committed at {root}"
        ) from None
    finally:
        os.unlink(tmp)
    return sid


def _new_meta(root, operation: str, files: list[dict],
              schema_json: str, summary: dict) -> dict:
    parent = latest_snapshot(root)
    return {
        "snapshot_id": (parent or 0) + 1,
        "parent": parent,
        "operation": operation,
        "ts": time.time(),
        "schema": schema_json,
        "files": files,
        "summary": summary,
    }


def commit_overwrite(
    spark: SparkSession, root, df: DataFrame,
    partition_cols: tuple = (),
) -> int:
    """New snapshot containing exactly `df` (logical full overwrite —
    prior snapshots stay readable)."""
    files = _write_data_files(spark, root, df, partition_cols)
    meta = _new_meta(
        root, "overwrite", files, df.schema.json(),
        {"added_files": len(files),
         "added_rows": sum(f["rows"] for f in files)},
    )
    return _commit_meta(root, meta)


def commit_patch(
    spark: SparkSession, root, df: DataFrame,
    partition_cols: tuple, replaced,
) -> int:
    """New snapshot = parent files whose partition values do NOT match
    `replaced` (a dict->bool predicate over partition values, applied
    driver-side to metadata) + new files holding `df`. `df` must carry
    every row of the replaced partitions that should survive."""
    parent = latest_snapshot(root)
    if parent is None:
        return commit_overwrite(spark, root, df, partition_cols)
    kept = [
        f for f in snapshot_meta(root, parent)["files"]
        if not replaced(f["partition"])
    ]
    added = _write_data_files(spark, root, df, partition_cols)
    meta = _new_meta(
        root, "patch", kept + added, df.schema.json(),
        {"kept_files": len(kept), "added_files": len(added),
         "added_rows": sum(f["rows"] for f in added)},
    )
    return _commit_meta(root, meta)


def rollback(spark: SparkSession, root, snapshot_id: int) -> int:
    """Publish a NEW snapshot whose content is an old snapshot's file
    list (history stays linear and append-only, like Iceberg's
    rollback-as-new-snapshot)."""
    old = snapshot_meta(root, snapshot_id)
    meta = _new_meta(
        root, "rollback", old["files"], old["schema"],
        {"rolled_back_to": snapshot_id},
    )
    return _commit_meta(root, meta)


def read_snapshot(
    spark: SparkSession, root, snapshot_id: int | None = None,
    partition_filter=None,
) -> DataFrame:
    """DataFrame over one snapshot's (optionally metadata-pruned) file
    list. The plan holds explicit file paths — concurrent commits and
    expiry of OTHER snapshots cannot change what this reads."""
    sid = latest_snapshot(root) if snapshot_id is None else snapshot_id
    if sid is None:
        raise FileNotFoundError(f"no snapshots at {root}")
    meta = snapshot_meta(root, sid)
    files = meta["files"]
    if partition_filter is not None:
        files = [f for f in files if partition_filter(f["partition"])]
    schema = StructType.fromJson(json.loads(meta["schema"]))
    if not files:
        return spark.createDataFrame([], schema)
    root = pathlib.Path(root)
    return spark.read.schema(schema).parquet(
        *[str(root / f["path"]) for f in files]
    )


def expire_snapshots(root, keep_last: int = 2) -> dict:
    """Drop all but the newest `keep_last` snapshots' metadata, then
    delete every data file no surviving snapshot references — including
    orphans left by crashed commits. Returns counts. `keep_last` must
    be >= 1: expiry is a retention policy, not a table drop (Iceberg's
    expire_snapshots has the same floor)."""
    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1, got {keep_last} — expiring every "
            "snapshot would delete the table"
        )
    root = pathlib.Path(root)
    ids = snapshot_ids(root)
    expired = ids[:-keep_last]
    survivors = ids[len(expired):]
    live = set()
    for sid in survivors:
        live.update(f["path"] for f in snapshot_meta(root, sid)["files"])
    removed_files = 0
    data = root / _DATA_DIR
    if data.is_dir():
        for p in data.rglob("*.parquet"):
            if str(p.relative_to(root)) not in live:
                p.unlink()
                removed_files += 1
    for sid in expired:
        (_meta_dir(root) / _vname(sid)).unlink()
    shutil.rmtree(root / _TMP_DIR, ignore_errors=True)
    return {"expired_snapshots": len(expired),
            "removed_files": removed_files,
            "live_snapshots": len(survivors)}
