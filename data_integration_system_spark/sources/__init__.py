"""Source connectors (SURVEY §2A S-family).

  backfill.py     S13 — JSON index + text-blob directory -> documents
                  DataFrame (workers/raw_to_postgres.py:5-30 re-expressed
                  as a join of two scans)
  http_source.py  S1/S2 — a Spark 4 Python DataSource that fetches URLs
                  partition-parallel with per-domain politeness

Parquet/text/json scans need no wrapper — `catalog.table` and
`spark.read.*` are the connectors for everything at rest.
"""
