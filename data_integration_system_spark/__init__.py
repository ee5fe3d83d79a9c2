"""data_integration_system_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference data-integration system
(mahmutefedara/data_integration_system: crawl -> extract -> dedup -> store
-> query; see SURVEY.md) as idiomatic Spark DataFrame pipelines, extended
with LLM-training-data operators (near-dedup, similarity search, text
analysis, multimodal plumbing) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory (UTC, AQE, broadcast threshold)
  catalog.py    parquet table registry for the synthetic star schema
  functions/    scalar expression helpers (hashing, urls, text, vectors)
  operators/    query builders — each registers into the query registry
  pipeline/     ingestion pipeline library (fetch/extract/BFS/writer)
  streaming/    Structured Streaming analogs of the worker/poll loops
  sources/      connectors: backfill reader, HTTP Python DataSource
  plans/        physical-plan introspection for scale regression tests
  registry.py   name -> (spark_fn, oracle_sql) registry driving
                __spark_entry__.queries() / oracle_sql()
"""

from data_integration_system_spark.registry import QUERIES, get_queries, get_oracle_sql

__all__ = ["QUERIES", "get_queries", "get_oracle_sql"]
