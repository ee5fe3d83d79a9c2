"""Structured Streaming layer (SURVEY §2A T-family).

The reference hand-rolled streaming: a 2 s poll loop
(workers/worker_daemon.py:24-28), an asyncio work queue
(crawler_core.py:263-271), a timeout-based stale reaper
(db/postgres_store.py:58-68), and idempotent at-least-once upserts
(db/postgres_store.py:126-184).  Here each is a declarative streaming
construct: triggers, watermarked windows, dropDuplicates-within-watermark,
and foreachBatch MERGE.
"""
