#!/usr/bin/env python
"""Pipeline THROUGHPUT bench: reference-loop semantics vs this repo.

The reference (`/root/reference/pubsub_pipeline.py`) publishes no
numbers, so the baseline is measured here: a faithful re-creation of
its documented run loop — pull up to `bulk_limit=20` messages, then a
sequential per-message deserialize -> process -> serialize ->
publish, ack after publish (P:68, P:172-174, P:31-52) — implemented
from the documented semantics (not copied) over the same message
corpus on local disk.

Against it, the SAME corpus + the SAME Python processor through this
repo's SparkPipeline on two paths:

  * python path  — per-message opaque processor via Arrow-batched
    mapInPandas (the reference's PubSubPipeline shape)
  * column path  — from_json -> Column expressions -> to_json, fully
    JVM-side (the Spark-first fast path the reference cannot express)

Both Spark runs drain with per-trigger admission wide open: the
reference's 20-message pull is a latency knob, not a throughput one,
and pinning Spark to 20-row micro-batches would measure scheduler
floor, not pipeline speed (documented in the output note).

Run:  python scripts/bench_pipeline.py     # writes BENCH_pipeline.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from py_pubsub_pipeline_spark.pipeline import (  # noqa: E402
    DirectorySink,
    FileStreamSource,
    SparkPipeline,
)
from py_pubsub_pipeline_spark.session import get_spark  # noqa: E402

N_FILES = 400
MSGS_PER_FILE = 5000
N_MSGS = N_FILES * MSGS_PER_FILE
BULK_LIMIT = 20  # reference default pull size (P:68)


def make_corpus(in_dir: str) -> None:
    os.makedirs(in_dir, exist_ok=True)
    for f in range(N_FILES):
        with open(os.path.join(in_dir, f"msgs-{f:05d}.txt"), "w") as fh:
            for i in range(f * MSGS_PER_FILE, (f + 1) * MSGS_PER_FILE):
                fh.write(json.dumps(
                    {"id": i, "v": i * 0.5, "tag": f"t{i % 8}"}) + "\n")


def process_message(m: dict) -> dict:
    """The message transform, shared verbatim by every contender."""
    return {"id": m["id"], "v2": m["v"] * 2.0 + 1.0, "bucket": m["id"] % 16}


def run_reference_loop(in_dir: str, out_dir: str) -> float:
    """The reference's documented loop, re-created: pull up to 20,
    sequential per-message codec+process, publish, ack (= advance the
    offset; here the read cursor). Single process, single thread —
    the reference's intra-batch parallelism is 1 (P:172-174)."""
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    for name in sorted(os.listdir(in_dir)):
        with open(os.path.join(in_dir, name), "rb") as fh:
            lines = fh.read().splitlines()
        out_lines = []
        cursor = 0
        while cursor < len(lines):                   # one iteration = one pull
            pulled = lines[cursor:cursor + BULK_LIMIT]
            for raw in pulled:                       # sequential per message
                msg = json.loads(raw.decode("utf-8"))        # deserialize
                result = process_message(msg)                # process
                out_lines.append(
                    json.dumps(result).encode("utf-8"))      # serialize
            cursor += len(pulled)                    # ack after publish
        with open(os.path.join(out_dir, name), "wb") as fh:  # publish
            fh.write(b"\n".join(out_lines) + b"\n")
    return time.time() - t0


def run_spark(spark, in_dir: str, base: str, *, column: bool) -> float:
    out, ckpt = os.path.join(base, "out"), os.path.join(base, "ckpt")

    def column_processor(df):
        parsed = F.from_json(
            F.col("value").cast("string"), "id BIGINT, v DOUBLE, tag STRING")
        return df.select(parsed.alias("m")).select(
            F.to_json(F.struct(
                F.col("m.id").alias("id"),
                (F.col("m.v") * 2.0 + 1.0).alias("v2"),
                (F.col("m.id") % 16).alias("bucket"),
            )).cast("binary").alias("value"))

    pipe = SparkPipeline(
        spark=spark,
        source=FileStreamSource(in_dir, max_files_per_trigger=None),
        sink=DirectorySink(out),
        processor=None if column else process_message,
        column_processor=column_processor if column else None,
        checkpoint_dir=ckpt,
    )
    t0 = time.time()
    pipe.process(available_now=True, timeout=600.0)
    dt = time.time() - t0
    n = sum(1 for f in os.listdir(out) if f.endswith(".txt")
            for _ in open(os.path.join(out, f)))
    assert n == N_MSGS, f"spark pipeline published {n} != {N_MSGS}"
    return dt


def main() -> None:
    base = tempfile.mkdtemp(prefix="bench_pipeline_")
    try:
        in_dir = os.path.join(base, "in")
        make_corpus(in_dir)

        ref_sec = run_reference_loop(in_dir, os.path.join(base, "ref_out"))

        spark = get_spark("bench_pipeline")
        # warm the streaming machinery once (JVM/py4j/Arrow JIT), then
        # measure steady state — same discipline as bench.py.
        shutil.rmtree(os.path.join(base, "warm"), ignore_errors=True)
        run_spark(spark, in_dir, os.path.join(base, "warm"), column=True)

        col_sec = run_spark(spark, in_dir, os.path.join(base, "col"),
                            column=True)
        py_sec = run_spark(spark, in_dir, os.path.join(base, "py"),
                           column=False)

        result = {
            "metric": "pipeline_throughput_msgs_per_sec",
            "n_msgs": N_MSGS,
            "reference_loop": {
                "sec": round(ref_sec, 3),
                "msgs_per_sec": round(N_MSGS / ref_sec),
                "what": "documented reference semantics re-created: "
                        f"pull {BULK_LIMIT}, sequential per-message "
                        "json codec + process, publish, ack",
            },
            "spark_pipeline_python": {
                "sec": round(py_sec, 3),
                "msgs_per_sec": round(N_MSGS / py_sec),
                "what": "SparkPipeline, opaque per-message processor "
                        "via Arrow mapInPandas",
            },
            "spark_pipeline_column": {
                "sec": round(col_sec, 3),
                "msgs_per_sec": round(N_MSGS / col_sec),
                "what": "SparkPipeline, JVM column path "
                        "(from_json -> exprs -> to_json)",
            },
            "ratio_python_vs_reference": round(ref_sec / py_sec, 2),
            "ratio_column_vs_reference": round(ref_sec / col_sec, 2),
            "note": "same corpus, same transform, local disk; Spark "
                    "admission wide open (the 20-msg pull is a latency "
                    "knob; pinning Spark to 20-row micro-batches "
                    "measures scheduler floor, not throughput); one "
                    "warmup drain before timing. Crossover: at 200k "
                    "msgs the ~1.3s fixed micro-batch cost still "
                    "dominates (column path 0.56x); the ratios above "
                    "are steady state and keep growing with corpus "
                    "size and per-message work (the sequential loop "
                    "cannot use a second core)",
        }
        with open("BENCH_pipeline.json", "w") as fh:
            json.dump(result, fh, indent=2)
        print(json.dumps(result))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
