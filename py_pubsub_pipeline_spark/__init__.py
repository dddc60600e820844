"""py_pubsub_pipeline_spark — a PySpark-native analytics + pipeline engine.

A from-scratch engine with the streaming-ETL capabilities of
``hypefactors/py-pubsub-pipeline`` (reference: a Google Cloud Pub/Sub
enrichment loop, /root/reference/pubsub_pipeline.py:61-130) rebuilt on
Spark Structured Streaming, plus a full relational / LLM-data-pipeline
operator surface expressed Spark-first (DataFrame API, Catalyst
optimized).

Layout:
  session.py    - SparkSession builder tuned for the engine
  tables.py     - table catalog over the parquet test corpus
  registry.py   - query registry (name -> DataFrame builder + SQL oracle)
  queries/      - the operator inventory (SURVEY.md §2B), one module per family
  pipeline.py   - the streaming pipeline core (reference parity surface)
  sources/      - custom Python DataSource: Pub/Sub-style queue source/sink
  functions/    - reusable column-expression libraries (vector math, text)
  streaming/    - watermark/window/stateful helpers
"""

__version__ = "0.1.0"
