"""Structured Streaming layer: the CDC heart of the engine.

- ``replay``: file-replayed streams from static parquet (test harness for
  what is Kafka/change-stream input in production).
- ``apply``: foreachBatch idempotent upsert (the MySQL ON DUPLICATE KEY
  UPDATE equivalent) over parquet state.
- ``windows``: tumbling/sliding/session event-time windows + watermarks.
"""
