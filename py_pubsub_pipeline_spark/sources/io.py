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
