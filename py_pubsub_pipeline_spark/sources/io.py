"""Batch source/sink surface: format-pluggable reads and the two
write layouts that matter at 100 TB — partitioned (for pruning) and
bucketed (for shuffle-free joins).

The reference's only I/O is Pub/Sub messages in / messages out
(`/root/reference/pubsub_pipeline.py:190-200`); its codec layer is
pluggable (P:66-67). This module is the batch analog of that
pluggability: one entry point, format as data, schema explicit at the
boundary (SURVEY.md §1.2 engine policy — no silent inference in
production paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = {"parquet", "json", "csv", "orc", "text"}


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read `path` in any supported format.

    Schema policy: parquet/orc are self-describing; for json/csv/text
    an explicit schema is REQUIRED — inference re-scans the data
    (a full extra pass at 100 TB) and can drift between runs.
    """
    fmt = fmt.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(_FORMATS)}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in {"json", "csv", "text"}:
        raise ValueError(f"{fmt} read requires an explicit schema")
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    return reader.options(**options).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned layout: one directory per distinct
    partition-column tuple. Reads that filter on the partition column
    prune whole directories at planning time (PartitionFilters in the
    scan node) — the 100 TB table acts like its matching slice.
    Choose low-cardinality columns; a high-cardinality partition key
    degenerates into millions of tiny files."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_by).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) table: rows land in n_buckets files
    by hash of the bucket columns. Two tables bucketed the same way
    join WITHOUT a shuffle — each task zips bucket i with bucket i —
    which is how a 100 TB fact⋈fact join avoids re-shuffling both
    sides on every query. Requires saveAsTable (bucket metadata lives
    in the catalog)."""
    w = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def compact_files(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    fmt: str = "parquet",
) -> int:
    """Small-files compaction: rewrite a dataset into
    ceil(bytes / target_file_mb) files of ~target size. Streaming
    sinks and fine-grained partitioned writes accrete thousands of
    KB-sized files; at 100 TB that is planning-time death (file
    listing, footer reads, task-per-file scheduling). Returns the
    output file count.

    Repartition uses round-robin (no column) — compaction must not
    skew by any key — and writes to a staging dir then swaps, so a
    reader never sees a half-compacted dataset. The swap is the
    same stage-then-rename discipline as the pubsub sink commit."""
    import math
    import os
    import shutil

    df = spark.read.format(fmt).load(path)
    n_bytes = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(n_bytes / (target_file_mb * 1024 * 1024)))
    staging = path.rstrip("/") + ".compacting"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(staging)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    return n_files


# --- manifest-table write path ---------------------------------------------
# The executor side of the lakehouse metadata model the query surface
# reads (queries/formats.py: scan_manifest_snapshot / _diff / _orphans /
# _retention_plan / scan_commitlog_replay, and layout_compaction_plan
# which PLANS what to compact).  Conventions match that fixture:
# snapshot 1 lives in `_manifest.json`, snapshot N>1 in
# `_manifest_vN.json`, each `{"snapshot_id": N, "files": [rel, ...]}`;
# the optional Delta-style log is `_commitlog.jsonl` with
# `{"commit": N-1, "op": "add"|"remove", "file": rel}` actions.


def _manifest_path(base: str, snapshot_id: int) -> str:
    import os

    name = ("_manifest.json" if snapshot_id == 1
            else f"_manifest_v{snapshot_id}.json")
    return os.path.join(base, name)


def read_manifests(base: str) -> dict[int, list[str]]:
    """All committed snapshots: {snapshot_id: [rel file, ...]}."""
    import json
    import os

    out: dict[int, list[str]] = {}
    for d in os.listdir(base):
        if d == "_manifest.json" or (
            d.startswith("_manifest_v") and d.endswith(".json")
        ):
            with open(os.path.join(base, d)) as f:
                snap = json.load(f)
            out[int(snap["snapshot_id"])] = list(snap["files"])
    return out


def _append_commitlog(base: str, actions: list[dict]) -> None:
    """Atomic append (rewrite + rename — the log is bounded metadata;
    a real implementation appends a new log segment per commit)."""
    import json
    import os

    log = os.path.join(base, "_commitlog.jsonl")
    lines = []
    if os.path.exists(log):
        with open(log) as f:
            lines = f.readlines()
    tmp = log + ".tmp"
    with open(tmp, "w") as f:
        f.writelines(lines)
        for a in actions:
            f.write(json.dumps(a) + "\n")
    os.replace(tmp, log)


def compact_manifest(
    spark: SparkSession,
    base: str,
    files_to_compact: list[str],
    new_file: str,
    fmt: str = "parquet",
) -> dict:
    """EXECUTE a compaction against a manifest-snapshot table — the
    write path that closes the loop between layout_compaction_plan
    (which plans), scan_manifest_* (which read), and
    vacuum_manifest (which expires):

      1. stage: rewrite the named files of the LATEST snapshot into
         ONE new data file (plain parquet write — staging is free
         because nothing references `new_file` yet);
      2. commit: append snapshot N+1 whose file list is
         (latest - compacted) + [new_file], written tmp-then-rename
         (the same atomic-swap discipline as the pubsub sink);
      3. log: append the remove/add actions under commit id N (the
         fixture's commit = snapshot_id - 1 convention).

    The compacted files are NOT deleted: they become orphans of the
    new latest snapshot that remain referenced by older snapshots —
    exactly the state scan_manifest_retention_plan adjudicates, so
    time travel to every pre-compaction snapshot keeps resolving
    byte-identically until vacuum_manifest expires them.

    Scale: the data rewrite is one round-robin repartition write of
    the compacted slice (compact_files' shape); everything else is
    O(files) driver-side metadata.
    """
    import json
    import os

    snaps = read_manifests(base)
    if not snaps:
        raise ValueError(f"no committed snapshot under {base}")
    latest_id = max(snaps)
    latest = snaps[latest_id]
    missing = [f for f in files_to_compact if f not in latest]
    if missing:
        raise ValueError(
            f"not in latest snapshot {latest_id}: {missing}"
        )
    if new_file in latest or os.path.exists(os.path.join(base, new_file)):
        raise ValueError(f"target {new_file!r} already exists")
    df = spark.read.format(fmt).load(
        [os.path.join(base, f) for f in files_to_compact]
    )
    n_rows = df.count()
    df.coalesce(1).write.format(fmt).mode("errorifexists").save(
        os.path.join(base, new_file)
    )
    new_id = latest_id + 1
    new_files = [f for f in latest if f not in files_to_compact]
    new_files.append(new_file)
    mpath = _manifest_path(base, new_id)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"snapshot_id": new_id, "files": new_files}, f)
    os.replace(tmp, mpath)  # THE commit point
    _append_commitlog(
        base,
        [{"commit": new_id - 1, "op": "remove", "file": f}
         for f in files_to_compact]
        + [{"commit": new_id - 1, "op": "add", "file": new_file}],
    )
    return {"snapshot_id": new_id, "files": new_files, "n_rows": n_rows}


def vacuum_manifest(base: str, retain_from: int) -> list[str]:
    """Expire-snapshots + remove-orphan-files, enforcing the
    protection rule scan_manifest_retention_plan plans with: a data
    file is deletable iff NO snapshot with id >= retain_from (the
    retained time-travel window, latest always included) references
    it.  Deletes expired manifests and deletable data files; returns
    the deleted data files.  Vacuuming with retain_from <= the oldest
    snapshot you still query is the caller's contract — shrinking the
    window below a snapshot breaks time travel TO IT, never to any
    retained one."""
    import os
    import shutil

    snaps = read_manifests(base)
    if not snaps:
        return []
    latest_id = max(snaps)
    retain_from = min(retain_from, latest_id)
    protected: set[str] = set()
    for sid, files in snaps.items():
        if sid >= retain_from:
            protected |= set(files)
    deleted = []
    for d in sorted(os.listdir(base)):
        full = os.path.join(base, d)
        if (
            d.startswith("_manifest")
            and d.endswith(".json")
        ):
            with open(full) as f:
                import json

                sid = int(json.load(f)["snapshot_id"])
            if sid < retain_from:
                os.remove(full)
        elif os.path.isdir(full) and d not in protected and os.path.exists(
            os.path.join(full, "_SUCCESS")
        ):
            shutil.rmtree(full)
            deleted.append(d)
    return deleted
