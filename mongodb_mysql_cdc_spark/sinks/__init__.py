"""Sink adapters: where the maintained CDC state leaves the engine.

The harness-testable sink is partitioned parquet (``streaming.apply.
CdcParquetSink``); ``sinks.jdbc`` is the reference's literal MySQL target,
shipped flag-gated because no MySQL exists in this harness.
"""
