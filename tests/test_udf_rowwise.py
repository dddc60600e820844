"""Row-at-a-time F.udf — the documented slow path (queries/udfs.py):
correct, but plans as BatchEvalPython (pickled rows, no Arrow, no
codegen), which is why no hot path in the engine uses it. This test
pins both facts: semantics match the Column-expression fast path, and
the plan marker that reviews grep for is really there.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from py_pubsub_pipeline_spark.tables import table

from conftest import SF_SMALL


def test_rowwise_udf_matches_column_expr_and_plans_python(spark):
    d = table(spark, SF_SMALL, "documents").select("doc_id", "text")

    @F.udf(returnType=IntegerType())
    def n_tokens_py(text):  # noqa: ANN001
        return len(text.split(" "))

    slow = d.select("doc_id", n_tokens_py("text").alias("n"))
    fast = d.select("doc_id", F.size(F.split("text", " ")).alias("n"))
    assert sorted(slow.collect()) == sorted(fast.collect())

    slow.collect()
    plan = slow._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" in plan  # the row-at-a-time marker
