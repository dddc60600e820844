"""Grouped as-of join over streaming state (streaming/asof.py) pinned
to the batch twin (queries/asof.py::join_asof) on a time-ordered
replay — the same harness discipline as the stateful sessionizer
(sequential time-sliced files -> maxFilesPerTrigger=1 micro-batches,
so per-user state genuinely carries across batches)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from py_pubsub_pipeline_spark.queries.asof import join_asof
from py_pubsub_pipeline_spark.streaming.asof import stateful_grouped_asof
from py_pubsub_pipeline_spark.tables import table

from conftest import SF_SMALL

N_FILES = 5


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_asof"))
    shutil.rmtree(d)
    ev = (
        table(spark, SF_SMALL, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id", "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
        )
    )
    ev.withColumn(
        "bucket", F.ntile(N_FILES).over(Window.orderBy("ts", "event_id"))
    ).write.partitionBy("bucket").mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_asof_matches_batch_twin(spark, split_events_dir):
    batch = spark.read.parquet(split_events_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_events_dir)
        .select("event_id", "user_id", "event_type", "ts")
    )
    name = "stream_asof_out"
    q = (
        stateful_grouped_asof(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_id, r.user_id, r.purchase_ts, r.view_ts)
        for r in spark.table(name).collect()
    }
    assert got, "no as-of rows emitted"
    want = {
        (r.event_id, r.user_id, r.purchase_ts, r.view_ts)
        for r in join_asof(spark, SF_SMALL)
        .select("event_id", "user_id", "purchase_ts", "view_ts")
        .collect()
    }
    assert got == want
    # state actually carried across micro-batches: some purchases
    # matched a view from an EARLIER time slice than their own
    bounds = (
        batch.groupBy("bucket")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()
    )
    slice_of = sorted([(r.lo, r.hi, r.bucket) for r in bounds])

    def which(ts):
        for lo, hi, b in slice_of:
            if lo <= ts <= hi:
                return b
        return None

    cross = [
        1 for (_, _, pts, vts) in got
        if vts is not None and which(vts) is not None
        and which(pts) is not None and which(vts) != which(pts)
    ]
    assert cross, "no cross-batch state carry observed"
