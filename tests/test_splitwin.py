"""split_window (functions/splitwin.py): the scale-safe rewrite of
``Window.orderBy(...)``-with-no-partition must return EXACTLY what the
built-in single-task window returns, while actually running the window
across >1 task — plus plan gates for the seven exact-statistics
queries that route through it (round-4 verdict items 2/4).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from py_pubsub_pipeline_spark.functions.splitwin import (
    split_window,
    str_bucket,
)
from py_pubsub_pipeline_spark.registry import load_all

from conftest import SF_SMALL

REG = load_all()

SPLITWIN_QUERIES = [
    # the round-4 verdict's seven
    "dq_sequence_gaps",
    "ml_auc_roc",
    "ml_average_precision",
    "agg_mann_whitney",
    "agg_ks_test",
    "agg_revenue_concentration",
    "dedup_sorted_neighborhood",
    # found by the same audit in round 5
    "agg_abc_classification",
    "agg_sprt_sequential",
    "sort_multi",
    "ml_woe_binning",
    "text_vocab_coverage",
]


@pytest.fixture(scope="module")
def tied_df(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.random() * 100)
            for i in range(10_007)]
    return spark.createDataFrame(rows, "id long, v long, x double")


def _by_id(df, *cols):
    return {r["id"]: tuple(r[c] for c in cols)
            for r in df.select("id", *cols).collect()}


# --- property: equality with the built-in window for ALL inputs ------
try:
    from hypothesis import given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    _prop_rows = st.lists(
        st.tuples(
            st.one_of(st.none(),
                      st.integers(min_value=-1000, max_value=1000)),
            st.integers(min_value=-100, max_value=100),
        ),
        min_size=1,
        max_size=30,
    )

    @given(data=_prop_rows,
           shards=st.integers(min_value=1, max_value=5),
           descending=st.booleans())
    @settings(max_examples=12, deadline=None)
    def test_property_matches_builtin_any_input(spark, data, shards,
                                                descending):
        rows = [(i, k, v) for i, (k, v) in enumerate(data)]
        df = spark.createDataFrame(rows, "id long, k long, v long")
        key = F.col("k").desc() if descending else F.col("k")
        order = [key, F.col("id")]
        got = _by_id(
            split_window(
                df, order, bucket=F.col("k"), descending=descending,
                running_sums={"cs": "v"}, row_number="rn", rank="rk",
                lead={"nx": "v"}, shards=shards,
            ),
            "cs", "rn", "rk", "nx",
        )
        w = Window.orderBy(*order)
        wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        want = _by_id(
            df.withColumn("cs", F.sum("v").over(wcum))
            .withColumn("rn", F.row_number().over(w))
            .withColumn("rk", F.rank().over(w))
            .withColumn("nx", F.lead("v").over(w)),
            "cs", "rn", "rk", "nx",
        )
        assert got == want


def test_matches_builtin_rank_rownumber_cumsum_lead(tied_df):
    naive = tied_df.select(
        "id",
        F.rank().over(Window.orderBy("v")).alias("rk"),
        F.row_number().over(Window.orderBy("v", "id")).alias("rn"),
        F.sum("x").over(
            Window.orderBy("v", "id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow)).alias("cs"),
        F.lead("v").over(Window.orderBy("v", "id")).alias("nx"),
    )
    got = split_window(
        tied_df, ["v", "id"], bucket="v",
        running_sums={"cs": "x"}, row_number="rn", lead={"nx": "v"},
        shards=8,
    )
    got_rank = split_window(tied_df, ["v"], rank="rk", shards=8)
    n = _by_id(naive, "rk", "rn", "cs", "nx")
    g = _by_id(got, "rn", "cs", "nx")
    gr = _by_id(got_rank, "rk")
    for i, (rk, rn, cs, nx) in n.items():
        assert gr[i][0] == rk, f"rank mismatch id={i}"
        grn, gcs, gnx = g[i]
        assert grn == rn, f"row_number mismatch id={i}"
        assert abs(gcs - cs) < 1e-6, f"cumsum mismatch id={i}"
        assert gnx == nx, f"lead mismatch id={i}"


def test_matches_builtin_descending_decimal(tied_df):
    df = tied_df.withColumn(
        "rev", (F.col("x") * 100).cast("decimal(28,2)"))
    naive = df.select(
        "id",
        F.sum("rev").over(
            Window.orderBy(F.col("rev").desc(), "id").rowsBetween(
                Window.unboundedPreceding, Window.currentRow)).alias("cum"),
        F.row_number().over(
            Window.orderBy(F.col("rev").desc(), "id")).alias("rn"),
    )
    got = split_window(
        df, [F.col("rev").desc(), "id"], bucket="rev", descending=True,
        running_sums={"cum": "rev"}, row_number="rn", shards=8,
    )
    n = _by_id(naive, "cum", "rn")
    g = _by_id(got, "cum", "rn")
    for i, (cum, rn) in n.items():
        assert g[i][1] == rn
        assert g[i][0] == cum, f"decimal cumsum mismatch id={i}"


def test_matches_builtin_string_order(spark):
    words = ["b", "aa", "abc", "zebra", "zeb", "antelope", "ant", "a",
             "Z", "0x", "ß-sharp", "日本語", "nihon",
             "aaaaaaaaaaab", "aaaaaaaaaaaa", "", "aaaaaaaa"]
    sdf = spark.createDataFrame(
        list(enumerate(words)), "id long, name string")
    naive = sdf.select(
        "id",
        F.row_number().over(Window.orderBy("name", "id")).alias("rn"),
        F.lead("name").over(Window.orderBy("name", "id")).alias("nx"),
    )
    got = split_window(
        sdf, ["name", "id"], bucket=str_bucket("name"),
        row_number="rn", lead={"nx": "name"}, shards=4,
    )
    assert _by_id(naive, "rn", "nx") == _by_id(got, "rn", "nx")


def test_null_keys_follow_spark_default_placement(spark):
    # Regression: F.least SKIPS nulls, so an unguarded
    # least(floor(null/w), shards-1) bucketed null keys into the
    # FIRST shard under descending order — caught by sort_multi's
    # NULLS LAST oracle going red.
    rows = [(i, None if i % 7 == 0 else (i * 37) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, sz int")
    for order, desc in (
        ([F.col("sz").desc_nulls_last(), "id"], True),
        ([F.col("sz").asc_nulls_first(), "id"], False),
    ):
        naive = df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rn"))
        got = split_window(
            df, order, bucket="sz", descending=desc,
            row_number="rn", shards=8)
        assert _by_id(naive, "rn") == _by_id(got, "rn"), (
            f"null placement broken for descending={desc}")


def test_degenerate_single_value_and_empty(spark):
    one = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0)], "id long, x double")
    got = {r["id"]: (r["cs"], r["rn"]) for r in split_window(
        one, ["id"], running_sums={"cs": "x"}, row_number="rn",
        shards=8).collect()}
    assert got == {1: (5.0, 1), 2: (10.0, 2), 3: (15.0, 3)}
    empty = spark.createDataFrame([], "id long, x double")
    assert split_window(
        empty, ["id"], running_sums={"cs": "x"}).count() == 0


def test_window_runs_parallel_not_single_task(tied_df):
    # The whole point: the big window must execute across >1 task.
    # split_window's output keeps the hash(shard) partitioning through
    # the broadcast joins, so distinct spark_partition_id() > 1 proves
    # the window stage was parallel (a global window would collapse
    # everything into one partition).
    out = split_window(
        tied_df, ["v", "id"], bucket="v", running_sums={"cs": "x"},
        shards=8)
    npart = out.select(
        F.spark_partition_id().alias("p")).distinct().count()
    assert npart > 1, "split window collapsed to a single task"


@pytest.mark.parametrize("name", SPLITWIN_QUERIES)
def test_query_routes_through_split_window(spark, name):
    # Plan gate: each exact-statistics query must shard its global
    # window (hashpartitioning on the splitwin shard column), i.e. no
    # single-task window over a data-sized domain survives.
    df = REG[name].fn(spark, SF_SMALL)
    df.collect()
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "hashpartitioning(__sw_shard" in plan, (
        f"{name} does not shard its global window")
