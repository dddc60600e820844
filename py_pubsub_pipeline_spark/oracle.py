"""Local replica of the driver's DuckDB-oracle comparison.

The driver runs each queries()[name] on Spark and oracle_sql()[name]
on DuckDB over the same parquet tables, then compares row-count +
schema + order-insensitive value-hash. This module reproduces that
check locally so every operator is verified before it ships.

Canonicalization: columns sorted by name, rows sorted by their string
representation, values normalized (timestamps -> isoformat, floats kept
exact — queries are responsible for deterministic float output, see
registry.py contract).
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from typing import Any

import duckdb
from pyspark.sql import SparkSession

from .registry import QuerySpec
from .tables import TABLE_NAMES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Guard the box: an oracle whose plan degenerates (e.g. a
    # multi-referenced CTE evaluated by inlining) can otherwise spill
    # unbounded temp — one did >78 GB at sf1 and took the machine's
    # /tmp (and the Spark JVM's spill dirs) down with it.  20 GB is
    # two orders of magnitude above any legitimate oracle at the
    # scales this harness runs.
    # Isolate each connection's spill space: DuckDB's default temp
    # dir is .tmp under the CWD, so two concurrent oracle processes
    # share it and DELETE EACH OTHER'S spill files — observed at sf10
    # as cross-process IO aborts ("could not remove file") and native
    # segfaults mid-sweep.
    try:
        tmpdir = f"/tmp/duckdb_oracle_{os.getpid()}"
        os.makedirs(tmpdir, exist_ok=True)
        con.execute(f"SET temp_directory='{tmpdir}'")
    except Exception:
        pass
    try:
        con.execute("SET max_temp_directory_size='%s'"
                    % os.environ.get("SPARK_GRAFT_ORACLE_TEMP_CAP", "20GB"))
    except Exception:
        pass  # older DuckDB without the setting
    # Same guard, RAM side: DuckDB's default limit (80% of the box)
    # ignores the Spark JVM sharing it — at sf10 one degenerate
    # oracle allocation got the whole parity PROCESS OS-OOM-killed
    # (round 7), losing every later key's result.  24 GB fails the
    # one oracle loudly instead; anything legitimate spills to the
    # capped temp dir.
    try:
        con.execute("SET memory_limit='%s'"
                    % os.environ.get("SPARK_GRAFT_ORACLE_MEM_CAP", "24GB"))
    except Exception:
        pass
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.isdir(path):  # Spark-written dataset dir, not a file
            path = os.path.join(path, "*.parquet")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_value(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact double repr — both engines must agree bitwise
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    if type(v).__name__ in ("int64", "int32", "int16", "int8"):
        return int(v)
    if type(v).__name__ in ("float64", "float32"):
        return _canon_value(float(v))
    if type(v).__name__ == "Decimal":
        return str(v)
    if type(v).__name__ == "Timestamp":
        return v.isoformat()
    return v


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(spark: SparkSession, spec: QuerySpec, sf_dir: str,
            con: duckdb.DuckDBPyConnection | None = None) -> dict:
    """Run spec on Spark and its oracle on DuckDB; return a report dict."""
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    report: dict[str, Any] = {"name": spec.name, "spark_rows": len(srows),
                              "spark_cols": sorted(scols)}
    if spec.oracle is None:
        report["mode"] = "rows-only"
        report["ok"] = True
        return report
    own = con is None
    if own:
        con = duckdb_connect(sf_dir)
    try:
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        if own:
            con.close()
    report["mode"] = "oracle"
    report["oracle_rows"] = len(orows)
    report["oracle_cols"] = sorted(ocols)
    if sorted(scols) != sorted(ocols):
        report["ok"] = False
        report["why"] = f"column mismatch: {sorted(scols)} vs {sorted(ocols)}"
        return report
    if len(srows) != len(orows):
        report["ok"] = False
        report["why"] = f"row count: spark={len(srows)} oracle={len(orows)}"
        return report
    cs, co = _canon_rows(scols, srows), _canon_rows(ocols, orows)
    if cs != co:
        diffs = [(a, b) for a, b in zip(cs, co) if a != b][:3]
        report["ok"] = False
        report["why"] = f"value mismatch; first diffs: {diffs}"
        return report
    report["ok"] = True
    return report
