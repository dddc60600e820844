"""Custom stateful sessionizer (applyInPandasWithState) verified
against the engine's own `session_window` on the same bounded input.

Harness: events sorted by ts are split into K sequential parquet
files; maxFilesPerTrigger=1 + availableNow gives K micro-batches, so
the event-time watermark ratchets between batches and both close
paths run — in-batch closes (a key's next event arrives post-gap) and
event-time-timeout closes (watermark passes end+gap with the key
idle).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from py_pubsub_pipeline_spark.streaming import stateful_sessionize
from py_pubsub_pipeline_spark.tables import table

from conftest import SF_SMALL

GAP_S = 1800
N_FILES = 5


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_sorted"))
    shutil.rmtree(d)
    ev = (
        table(spark, SF_SMALL, "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "value")
        .orderBy("ts")
    )
    # Clean time-ordered split: file i holds the i-th time slice, so no
    # cross-file late data (in-batch closes then mirror session_window
    # exactly; cross-watermark lateness is covered by test_streaming).
    ev.withColumn(
        "bucket", F.ntile(N_FILES).over(Window.orderBy("ts"))
    ).write.partitionBy("bucket").mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_sessionizer_matches_session_window(spark, split_events_dir):
    batch = spark.read.parquet(split_events_dir)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_events_dir)
        .select("user_id", "ts", "value")
    )
    name = "stateful_sessions"
    q = (
        stateful_sessionize(stream, gap_seconds=GAP_S, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in spark.table(name).collect()
    }
    assert got, "no sessions emitted"

    expected_all = {
        (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
        for r in (
            batch.groupBy(
                "user_id", F.session_window("ts", f"{GAP_S} seconds")
            )
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                # session_window.end = last_ts + gap; the sessionizer
                # reports the last event time itself.
                (
                    F.col("session_window.end") - F.expr(f"INTERVAL {GAP_S} SECONDS")
                ).alias("session_end"),
                "n_events",
                "sum_value",
            )
            .collect()
        )
    }
    # Every emitted session must be a true session.
    assert got <= expected_all, f"spurious sessions: {sorted(got - expected_all)[:5]}"

    # Completeness: any session whose close-deadline (end+gap) falls
    # before the watermark of the final batch must have been emitted.
    max_ts = batch.agg(F.max("ts")).first()[0]
    wm_final = max_ts.timestamp() - 600  # 10-minute watermark delay
    must_emit = {
        s for s in expected_all if s[2].timestamp() + GAP_S < wm_final
    }
    missing = must_emit - got
    assert not missing, f"sessions past deadline not emitted: {sorted(missing)[:5]}"


# --- token-bucket admission (feedback variant) -------------------------------

RATE_US = 1              # 1 micro-token per microsecond
# The synthetic per-user inter-arrival median is ~2.8e10 us, so a
# 2e10-micro cost (20,000 s of refill per admission) with a 2-admission
# burst makes BOTH verdicts occur — the parameters must bind or the
# test proves nothing (asserted below).
BURST = 40_000_000_000   # 2 admissions
COST = 20_000_000_000    # 1 admission = 2e10 micro-tokens


def _twin_admission(rows):
    """Driver-side sequential ground truth: the textbook recursion the
    streaming operator must converge to across micro-batch splits."""
    out = {}
    state = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.ts)):
        t = int(r.ts.timestamp() * 1_000_000)
        last, tok = state.get(r.user_id, (-1, BURST))
        if last >= 0:
            tok = min(BURST, tok + (t - last) * RATE_US)
        ok = tok >= COST
        if ok:
            tok -= COST
        state[r.user_id] = (t, tok)
        out[(r.user_id, r.ts)] = ok
    return out


def test_token_bucket_admission_converges_to_sequential_twin(
    spark, split_events_dir
):
    from py_pubsub_pipeline_spark.streaming import stateful_token_bucket

    batch = spark.read.parquet(split_events_dir)
    # (user_id, ts) must be a key or per-event verdicts are ambiguous.
    dupes = (
        batch.groupBy("user_id", "ts").count().filter(F.col("count") > 1)
    ).count()
    assert dupes == 0
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_events_dir)
        .select("user_id", "ts")
    )
    name = "tb_admissions"
    q = (
        stateful_token_bucket(
            stream, rate_us=RATE_US, burst_micro=BURST, cost_micro=COST)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.ts): r.admitted for r in spark.table(name).collect()
    }
    assert got, "no verdicts emitted"
    expected = _twin_admission(batch.select("user_id", "ts").collect())
    # Every emitted verdict matches the sequential recursion; the
    # 5-file time-ordered split means cross-batch state carry is
    # genuinely exercised (a key's bucket drains across batches).
    assert set(got) == set(expected)
    diffs = {k for k in got if got[k] != expected[k]}
    assert not diffs, f"verdicts diverge from twin: {sorted(diffs)[:5]}"
    # Both verdicts must occur, or the parameters test nothing.
    vals = set(got.values())
    assert vals == {True, False}, vals


def test_token_bucket_in_watermark_disorder_is_clamped(
    spark, tmp_path_factory
):
    """ADVICE r11: an event arriving out of order ACROSS micro-batches
    but inside the watermark must not corrupt the bucket (negative
    refill / clock moving backward).  Contract after the fix: the
    refill term is clamped at 0 and last_us is monotone, so a
    disordered event sees the bucket as-of the latest time already
    processed.  Batch 1 carries t0 and t2; batch 2 carries t1 < t2
    (in-watermark disorder).  Expected = the clamped recursion applied
    in ARRIVAL order (t0, t2, t1)."""
    import datetime as dt
    import os
    import time

    from py_pubsub_pipeline_spark.streaming import stateful_token_bucket

    d = str(tmp_path_factory.mktemp("tb_disorder"))
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    sec = dt.timedelta(seconds=1)
    # rate 1 micro-token/us = 1e6/s; burst 2e6 (2 admissions at cost
    # 1e6).  t0 admits (burst full -> 1e6 left), t2 = t0+2s admits
    # (refill caps at burst), t1 = t0+1s arrives LAST: clamped refill 0
    # on a bucket holding 1e6 -> admits and drains to 0.  An unclamped
    # bucket would instead compute refill (t1-t2)*rate = -1e6 and go
    # negative — verdict flip is the corruption this test pins.
    b1 = spark.createDataFrame(
        [(1, base), (1, base + 2 * sec)], "user_id bigint, ts timestamp")
    b2 = spark.createDataFrame(
        [(1, base + sec)], "user_id bigint, ts timestamp")
    b1.coalesce(1).write.parquet(os.path.join(d, "f=1"))
    time.sleep(1.1)  # distinct mtimes => deterministic file order
    b2.coalesce(1).write.parquet(os.path.join(d, "f=2"))

    schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .select("user_id", "ts")
    )
    name = "tb_disorder"
    q = (
        stateful_token_bucket(
            stream, rate_us=1, burst_micro=2_000_000,
            cost_micro=1_000_000, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.ts: r.admitted for r in spark.table(name).collect()}
    assert got == {
        base: True, base + 2 * sec: True, base + sec: True,
    }, got
