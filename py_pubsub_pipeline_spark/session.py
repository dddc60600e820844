"""SparkSession construction tuned for this engine.

Local testing runs on local[N] single-JVM; the same settings are the
ones we'd ship on a 1000-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow on (vectorized
Python interop), UTC session timezone (parity with the DuckDB oracle
and with naive parquet timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs that every entry point (re)applies, so the
# engine behaves identically whether it built the session or received
# one from the driver harness.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    # The corpus's events.ts is a parquet TIMESTAMP(NANOS) column, which
    # Spark's vectorized reader rejects; read it as raw int64 nanos and
    # convert in tables.table() (ns DIV 1000 -> microseconds, matching
    # DuckDB's ns->us truncation — verified exact on the corpus).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Recursive-CTE row guard: the default 1M aborts LEGITIMATE
    # linear-growth recursions (subq_bom_rollup's ancestor closure is
    # depth x |part| ~= 1.4M rows at sf1).  50M keeps the runaway
    # protection (a diverging recursion still dies) while covering
    # every corpus this harness runs; the level limit (100) stays at
    # its default.
    "spark.sql.cteRecursionRowLimit": "50000000",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI stays ON (Spark 4 default) — deliberately: the DuckDB
    # oracle ALSO errors on bad casts/overflow, so ANSI matches the
    # correctness contract, and erroring early beats silently nulling
    # data at 100 TB. The reference's permissive no-schema posture is
    # honored per-EXPRESSION via the try_* family (fn_try) and the
    # pipeline's dead-letter quarantine, not by a global silent mode.
    # (Measured: ANSI on is also ~3% faster on the headline bench —
    # the non-ANSI null-wrapping costs more than the overflow checks.)
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (the driver
    hands us its own session; these are all safe to set post-start)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable at runtime on this build — skip
    return spark


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to executor Python workers.

    Anything crossing the driver->worker boundary by module reference
    (the custom DataSource class, the default codecs in pipeline.py)
    needs `py_pubsub_pipeline_spark` importable inside the worker. When
    the driver program doesn't run from the repo root (any real
    deployment), that's not a given — so zip the package once per
    session and addPyFile it."""
    if spark.conf.get("spark.py_pubsub_pipeline.pkg_shipped", None) == "true":
        return
    import tempfile
    import zipfile

    import py_pubsub_pipeline_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"py_pubsub_pipeline_spark_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(dirpath, fn)
                        z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    spark.conf.set("spark.py_pubsub_pipeline.pkg_shipped", "true")


def get_spark(app_name: str = "py_pubsub_pipeline_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or get) a local session.

    shuffle_partitions defaults to the local core count: at local scale
    the 200-partition default just adds scheduling overhead; on a real
    cluster you size it to ~2-3x total cores and let AQE coalesce.
    """
    # The python-streaming-source runner is spawned by the driver JVM
    # with the JVM's env: it needs this package on PYTHONPATH (addPyFile
    # reaches executor workers only). Must happen before the JVM starts.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    n_shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
