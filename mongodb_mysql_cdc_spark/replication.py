"""End-to-end replication pipeline — the user-facing composition of the
three SURVEY §3 entry points (A: snapshot, B: change-stream tail,
C: apply), i.e. what the reference exposes as its CLI: "replicate this
MongoDB database into MySQL, then keep it in sync".

    pipe = ReplicationPipeline(spark, source_dir="/data/sf0.01",
                               sink_dir="/tmp/replica")
    state = pipe.run()          # snapshot + tail-to-current, returns the
                                # queryable current-state table
    pipe.status()               # committed batches, state rows, resume pos

Harness mapping: the ``events`` table is the designated stream table; its
time-ordered replay stands in for the oplog/change-stream cursor, and the
partitioned-parquet ``CdcParquetSink`` stands in for MySQL (SURVEY §1.2).
Everything here reuses the checked suite operators — the pipeline is
composition, not new semantics; ``tests/test_replication.py`` pins
pipeline-end-state == ``cdc_apply_batch`` over the full event history
(snapshot/tail factoring must be invisible — reconcile is associative).

100 TB: the snapshot phase is one batch write partitioned by key-bucket;
the tail phase is Structured Streaming with checkpointed offsets (restart
= resume, §2.9), micro-batches folded per key before touching the sink.
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.sources.cdc import envelopes_from_events
from mongodb_mysql_cdc_spark.streaming.apply import CdcParquetSink, reconcile
from mongodb_mysql_cdc_spark.streaming.replay import (
    read_event_stream,
    run_to_completion,
    stage_event_chunks,
)


@dataclass
class ReplicationPipeline:
    """Snapshot + tail one source stream table into a keyed sink state."""

    spark: SparkSession
    source_dir: str
    sink_dir: str = field(default_factory=lambda: tempfile.mkdtemp(prefix="sparkcdc_replica_"))
    n_chunks: int = 4
    snapshot_chunks: int = 1  # chunks folded into the initial bulk load

    def __post_init__(self) -> None:
        self._sink = CdcParquetSink(self.spark, self.sink_dir)
        self._staged: str | None = None

    # -- entry point A: initial snapshot -----------------------------------
    def snapshot(self) -> "ReplicationPipeline":
        """Bulk-load the consistent starting state: the first
        ``snapshot_chunks`` of the time-ordered feed applied as ONE batch
        (batch id -1, guarded like any other epoch)."""
        staged = self._stage()
        parts = [
            os.path.join(staged, f"chunk={i:04d}")
            for i in range(1, self.snapshot_chunks + 1)
        ]
        snap = self.spark.read.parquet(*parts)
        self._sink.apply_batch(envelopes_from_events(snap), batch_id=-1)
        return self

    # -- entry point B+C: change-stream tail + apply ------------------------
    def tail(self) -> "ReplicationPipeline":
        """Open the remaining chunks as a real file stream (one chunk per
        micro-batch, offsets checkpointed) and fold each micro-batch into
        the sink idempotently."""
        staged = self._stage()
        stream = read_event_stream(self.spark, staged)
        # Chunks already folded by the snapshot are re-delivered by the
        # stream from offset zero — the batch-id guard plus LWW
        # idempotence make the overlap harmless (same replay argument as
        # a resume-token restart).
        env = envelopes_from_events(stream)
        q = (
            env.writeStream.foreachBatch(self._sink.apply_batch)
            .option(
                "checkpointLocation",
                os.path.join(self.sink_dir, "_checkpoint"),
            )
            .start()
        )
        run_to_completion(q)
        return self

    def run(self) -> DataFrame:
        """snapshot → tail → current queryable state."""
        return self.snapshot().tail().current()

    # -- observability ------------------------------------------------------
    def current(self) -> DataFrame:
        return self._sink.current()

    def status(self) -> dict:
        state = self._sink.state()
        return {
            "sink_dir": self.sink_dir,
            "committed_batches": sorted(self._sink._load_commits()),
            "state_rows": 0 if state is None else state.count(),
            "live_rows": 0 if state is None else self.current().count(),
        }

    def _stage(self) -> str:
        if self._staged is None:
            self._staged = stage_event_chunks(
                self.spark, self.source_dir, n_chunks=self.n_chunks,
                dir_prefix="replica",
            )
        return self._staged


def expected_state(spark: SparkSession, source_dir: str) -> DataFrame:
    """The batch ground truth the pipeline must converge to: LWW fold of
    the ENTIRE event history (tombstones filtered) — used by tests and the
    CLI's --verify flag."""
    from mongodb_mysql_cdc_spark.streaming.apply import cdc_apply_batch
    from mongodb_mysql_cdc_spark.sources.cdc import events_as_envelopes

    return cdc_apply_batch(events_as_envelopes(spark, source_dir))
