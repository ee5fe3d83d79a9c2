"""Ingestion pipeline library (SURVEY.md §7 Phase 4).

The reference's crawl→extract→dedup→store dataflow
(/root/reference/crawler/crawler_core.py:149-248) re-expressed as
DataFrame stages:

  fetch.py    HTTP fetch stage with per-domain politeness (S1/S2)
  extract.py  charset cascade, HTML→text+links, format extractors
              (P5/P7/P8, S4-S9) as Arrow-batched pandas UDFs
  crawl.py    the BFS driver loop over frontier generations (§3.2),
              with depth caps, scope filters, visited-set maintenance,
              and an enforced max_pages_total budget
  writer.py   keep-latest / changed-rows-only upsert writers (D4/D5,
              T4/T5 incremental-idempotent contract)
"""
