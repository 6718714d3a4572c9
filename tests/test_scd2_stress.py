"""MERGE-semantics stress for Scd2ParquetSink under randomized replay.

The round-5 delete-only fix showed this class of sink has corner cases
at micro-batch boundaries. This stress randomizes WHERE the boundaries
fall: the full envelope feed is split at random points of its global
(ts, seq) order — per-key order is preserved, which is the replay's
oplog guarantee — including degenerate chunks (empty, single-row,
all-delete slices land wherever the dice put them). Whatever the
chunking, the folded history must equal the one-shot batch window, and
redelivering any already-committed batch (Structured Streaming replays
the last batch after a crash; the commit log must make ALL of them
no-ops) must change nothing.
"""

from __future__ import annotations

import random
import tempfile

import pytest
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.sources.cdc import envelopes_from_events
from mongodb_mysql_cdc_spark.streaming.apply import (
    CdcParquetSink,
    Scd2ParquetSink,
    cdc_apply_batch,
    scd2_versions,
)


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


COLS = ["key", "seq", "value", "valid_from", "valid_to", "is_current"]


@pytest.mark.parametrize("seed", [7, 1913])
def test_scd2_fold_invariant_under_random_chunk_boundaries(spark, sf_dir, seed):
    env = envelopes_from_events(load(spark, sf_dir, "events"))
    lo, hi = env.agg(F.min("seq"), F.max("seq")).collect()[0]
    want = _rows(scd2_versions(env), COLS)

    rng = random.Random(seed)
    # random interior cut points; duplicates allowed → empty chunks happen
    cuts = sorted(rng.randint(lo, hi) for _ in range(rng.randint(4, 7)))
    bounds = list(zip([lo - 1] + cuts, cuts + [hi]))

    sink = Scd2ParquetSink(
        spark, tempfile.mkdtemp(prefix=f"scd2_stress_{seed}_"), n_buckets=4
    )
    chunks = []
    for batch_id, (a, b) in enumerate(bounds):
        chunk = env.filter((F.col("seq") > a) & (F.col("seq") <= b))
        chunks.append(chunk)
        sink.apply_batch(chunk, batch_id)
        # mid-stream redelivery of a random committed batch: must no-op
        replay_id = rng.randint(0, batch_id)
        sink.apply_batch(chunks[replay_id], replay_id)

    assert _rows(sink.history(), COLS) == want

    # full replay of every batch after completion: still a no-op
    for batch_id, chunk in enumerate(chunks):
        sink.apply_batch(chunk, batch_id)
    assert _rows(sink.history(), COLS) == want


STATE_COLS = ["key", "last_ts", "last_event_type", "last_value", "last_k"]


@pytest.mark.parametrize("seed", [23, 4099])
def test_upsert_sink_invariant_under_random_chunk_boundaries(spark, sf_dir, seed):
    """Same stress, LWW-upsert twin: CdcParquetSink's folded current
    state must equal the one-shot batch apply for any random chunking of
    the feed, with committed-batch redelivery a no-op throughout."""
    env = envelopes_from_events(load(spark, sf_dir, "events"))
    lo, hi = env.agg(F.min("seq"), F.max("seq")).collect()[0]
    want = _rows(cdc_apply_batch(env), STATE_COLS)

    rng = random.Random(seed)
    cuts = sorted(rng.randint(lo, hi) for _ in range(rng.randint(4, 7)))
    bounds = list(zip([lo - 1] + cuts, cuts + [hi]))

    sink = CdcParquetSink(
        spark, tempfile.mkdtemp(prefix=f"cdc_stress_{seed}_"), n_buckets=4
    )
    chunks = []
    for batch_id, (a, b) in enumerate(bounds):
        chunk = env.filter((F.col("seq") > a) & (F.col("seq") <= b))
        chunks.append(chunk)
        sink.apply_batch(chunk, batch_id)
        replay_id = rng.randint(0, batch_id)
        sink.apply_batch(chunks[replay_id], replay_id)

    assert _rows(sink.current(), STATE_COLS) == want
