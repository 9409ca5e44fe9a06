"""capstone_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference ETL pipeline (jbohanon/capstone-etl, surveyed in SURVEY.md),
re-expressed as idiomatic Spark DataFrame/SQL plans plus an extension
layer for LLM-training-data pipelines (dedup, similarity search,
text analysis, multimodal columns, streaming).

Layout:
  session      SparkSession factory tuned for local and cluster runs
  sources/     parquet/text/jdbc readers, literal side tables, sinks
  functions/   column-level building blocks (text cleaning, vectors)
  operators/   relational + text + index + dedup + similarity operators
  streaming/   Structured Streaming operators over the events table
  plans/       plan-inspection helpers (explain, broadcast assertions)
"""

__version__ = "0.1.0"
