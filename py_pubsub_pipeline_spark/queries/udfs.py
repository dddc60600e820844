"""The UDF/UDAF/UDTF surface — the engine's escape hatches, mirroring
the reference's pluggable `processor` (SURVEY.md §2B: reference P:62
scalar, P:216 bulk).

Engine rule (SURVEY.md §4.2): express transforms as Column expressions
first; Python only when semantics genuinely need it. Each query here
computes something *also* expressible in SQL precisely so the DuckDB
oracle can verify the Python path end-to-end:

- pandas_udf scalar     -> Arrow-vectorized, one Python call per batch
- applyInPandas (UDAF)  -> grouped map: per-group pandas frame in/out
- mapInPandas           -> the R7 bulk shape (iterator of batches)

Plain row-at-a-time F.udf is exercised in tests, not benchmarks — it
is the documented slow path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..tables import table


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens_py,
           UPPER(substr(text, 1, 10)) AS head_up_py
    FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDFs (SQL-checkable logic so the
    oracle validates the Python/Arrow roundtrip, not just plumbing)."""

    @pandas_udf("int")
    def n_tokens(s):  # type: ignore[no-untyped-def]
        return s.str.split(" ").str.len().astype("int32")

    @pandas_udf("string")
    def head_up(s):  # type: ignore[no-untyped-def]
        return s.str.slice(0, 10).str.upper()

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        n_tokens("text").alias("n_tokens_py"),
        head_up("text").alias("head_up_py"),
    )


@query(
    "udaf_grouped_pandas",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) - MIN(n_chars) AS BIGINT) AS char_range
    FROM documents GROUP BY lang
    """,
)
def udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregation via applyInPandas: each language group
    arrives as one pandas DataFrame; returns a one-row summary. (The
    UDAF story for logic native aggregates can't express.)"""

    def summarize(pdf):  # type: ignore[no-untyped-def]
        import pandas as pd

        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_chars": [int(pdf["n_chars"].sum())],
                "char_range": [int(pdf["n_chars"].max() - pdf["n_chars"].min())],
            }
        )

    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").applyInPandas(
        summarize, "lang string, n_docs long, total_chars long, char_range long"
    )


@query(
    "udtf_map_batches",
    oracle="""
    SELECT doc_id, token, CAST(LENGTH(token) AS INTEGER) AS tok_len
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id < 50)
    """,
)
def udtf_map_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many enrichment in Python (the UDTF shape) via
    mapInPandas: each input doc yields one row per token."""

    def tokenize(batches):  # type: ignore[no-untyped-def]
        import pandas as pd

        for pdf in batches:
            out_ids, out_toks = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                for tok in text.split(" "):
                    out_ids.append(doc_id)
                    out_toks.append(tok)
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "token": out_toks,
                    "tok_len": [len(t) for t in out_toks],
                }
            )

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", "text").mapInPandas(
        tokenize, "doc_id long, token string, tok_len int"
    )


@query(
    "udtf_lateral",
    oracle="""
    SELECT doc_id,
           array_to_string(w[(c.i * 10 + 1):(c.i * 10 + 10)], ' ') AS chunk,
           CAST(len(w[(c.i * 10 + 1):(c.i * 10 + 10)]) AS INTEGER) AS n_words,
           CAST(c.i AS INTEGER) AS idx
    FROM (SELECT doc_id, string_split(text, ' ') AS w
          FROM documents WHERE doc_id < 30),
         UNNEST(generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1))
           c(i)
    """,
)
def udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark 4 @udtf): one input row -> N output
    rows via a class-based table function applied with a LATERAL join
    — here, fixed-10-word chunking (the context-window prep step of a
    training-data pipeline). This is the reference's one-to-many
    enrichment shape as a first-class catalog object (vs
    udtf_map_batches, which is the same dataflow hand-built on Arrow
    batches — the UDTF trades some batching for SQL composability)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk string, n_words int, idx int")
    class ChunkWords:
        def eval(self, text: str):  # noqa: ANN001
            words = text.split(" ")
            for i in range(0, len(words), 10):
                piece = words[i : i + 10]
                yield " ".join(piece), len(piece), i // 10

    spark.udtf.register("chunk_words", ChunkWords)
    table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30).select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_head")
    return spark.sql(
        """
        SELECT doc_id, c.chunk, c.n_words, c.idx
        FROM docs_head, LATERAL chunk_words(text) c
        """
    )
