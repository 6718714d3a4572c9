"""cdc_apply — fold a CDC envelope stream into a current-state table.

This is the engine's flagship stateful operator: the Structured-Streaming
re-expression of "apply the oplog to MySQL with INSERT … ON DUPLICATE KEY
UPDATE / DELETE" (SURVEY.md §2.9, §3-C).

Design:
- ``reconcile``: pure batch algebra — per key keep the image with the
  greatest (ts, seq); associative, so it can fold micro-batches in any
  grouping: reconcile(reconcile(a,b),c) == reconcile(a, b ∪ c). That
  associativity IS the exactly-once argument under micro-batch replay.
- Tombstones STAY in the state table (op='d' rows are retained with their
  (ts, seq)): dropping them physically would let a late, older event
  resurrect a deleted key. ``current_state`` filters them at read time.
- ``CdcParquetSink``: foreachBatch writer with a batch-id guard — replaying
  an already-committed epoch is a no-op (idempotent sink = exactly-once).

Scale (100 TB): state is partitioned parquet keyed by hash(key); each
micro-batch rewrites only the key-buckets it touches (partition-overwrite),
never the whole table. Deletes compact away on rewrite once older than the
watermark horizon.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mongodb_mysql_cdc_spark.sources.cdc import OP_DELETE

STATE_COLS = ("key", "op", "ts", "seq", "after")


def reconcile(envelopes: DataFrame) -> DataFrame:
    """Collapse an envelope bag to one image per key: last-writer-wins by
    (ts, seq) — seq (the resume-token stand-in) breaks ts ties exactly the
    way the oplog's total order would.

    r14 (guide §1.2 per-task work): ONE ``max(struct(ts, seq, op,
    after))`` instead of four struct-buffer aggregates (two max_by + two
    max-of-struct). All four were declarative aggregates with struct
    buffers — ineligible for HashAggregate/ObjectHashAggregate, so the
    plan is a SortAggregate either way — but each row paid four struct
    comparisons where one suffices. Winner identity: (ts, seq) leads the
    struct, and seq is the globally-unique oplog position, so within a
    key the comparison never reaches op/after except for byte-identical
    replayed rows (idempotent re-delivery), where either pick is the
    same row. Measured 0.41 → 0.27 s noop on cdc_apply_batch at sf0.1,
    hash-identical; per-event comparison count drops 4× at any scale."""
    m = envelopes.groupBy("key").agg(
        F.max(F.struct("ts", "seq", "op", "after")).alias("_m")
    )
    return m.select(
        "key",
        F.col("_m.op").alias("op"),
        F.col("_m.ts").alias("ts"),
        F.col("_m.seq").alias("seq"),
        F.col("_m.after").alias("after"),
    )


def merge_states(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a reconciled delta onto an existing state — same LWW rule, so
    it is just reconcile(state ∪ delta). Both sides carry STATE_COLS."""
    return reconcile(state.select(*STATE_COLS).unionByName(delta.select(*STATE_COLS)))


def current_state(state: DataFrame) -> DataFrame:
    """The queryable sink table: tombstones filtered, document flattened —
    what the MySQL table would contain."""
    return state.filter(F.col("op") != OP_DELETE).select(
        F.col("key"),
        F.col("ts").alias("last_ts"),
        F.col("after.event_type").alias("last_event_type"),
        F.col("after.value").alias("last_value"),
        F.col("after.k").alias("last_k"),
    )


def cdc_apply_batch(envelopes: DataFrame) -> DataFrame:
    """Batch form of the whole apply: reconcile + tombstone filter."""
    return current_state(reconcile(envelopes))


# --- applyInPandasWithState form (SURVEY.md §2.9: "at scale
# applyInPandasWithState for in-flight state") -------------------------------
#
# The foreachBatch sink above re-reads and rewrites the state TABLE per
# micro-batch — correct, but the state round-trips through the filesystem.
# This form keeps the per-key LWW image in the Spark StateStore instead:
# executor-local, versioned, checkpointed incrementally — the shape that
# holds at 100 TB where the hot state must never be a full-table rewrite.

STATEFUL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("k", T.LongType()),
    ]
)

STATEFUL_OUTPUT_SCHEMA = T.StructType(
    [T.StructField("key", T.LongType())] + list(STATEFUL_STATE_SCHEMA.fields)
)


def cdc_apply_stateful_stream(env: DataFrame) -> DataFrame:
    """Streaming LWW apply via applyInPandasWithState over a flattened
    envelope stream (key, op, ts, seq, event_type, value, k)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    # NB: the kernel is a NESTED function on purpose — cloudpickle ships
    # nested functions by value, while a module-level function is pickled
    # by reference and the executor's Python worker would have to import
    # this package (which is only importable when the driver happens to run
    # from the repo root). Same rule as every other kernel in operators/.
    def lww_update_kernel(key, pdf_iter, state):
        """Per-key LWW fold over Arrow batches + GroupState. Emits the
        post-merge image whenever the key appears in a batch (update
        mode)."""
        import pandas as pd

        if state.exists:
            op, ts, seq, event_type, value, k = state.get
            ts = pd.Timestamp(ts)
        else:
            op = ts = seq = event_type = value = k = None

        for pdf in pdf_iter:
            best = pdf.sort_values(["ts", "seq"]).iloc[-1]
            if seq is None or (best["ts"], best["seq"]) > (ts, seq):
                # every nullable field gets the pd.isna guard — a bare
                # str(None)/float(None) would store the literal "None"/NaN
                # instead of NULL and diverge from the SQL oracle
                op = None if pd.isna(best["op"]) else str(best["op"])
                ts = best["ts"]
                seq = int(best["seq"])
                event_type = (
                    None if pd.isna(best["event_type"]) else str(best["event_type"])
                )
                value = None if pd.isna(best["value"]) else float(best["value"])
                k = None if pd.isna(best["k"]) else int(best["k"])

        state.update((op, ts.to_pydatetime(), seq, event_type, value, k))
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "op": op,
                    "ts": ts,
                    "seq": seq,
                    "event_type": event_type,
                    "value": value,
                    "k": k,
                }
            ]
        )

    flat = env.select(
        "key",
        "op",
        "ts",
        "seq",
        F.col("after.event_type").alias("event_type"),
        F.col("after.value").alias("value"),
        F.col("after.k").alias("k"),
    )
    return flat.groupBy("key").applyInPandasWithState(
        lww_update_kernel,
        STATEFUL_OUTPUT_SCHEMA,
        STATEFUL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


@dataclass
class CdcParquetSink:
    """foreachBatch sink maintaining a parquet state table with batch-id
    idempotency (SURVEY.md §3-C step 3).

    Plain parquet has no MERGE, so a commit folds the delta into state with
    merge_states(old, delta) — but BOUNDED: the state table is partitioned
    on ``bucket = pmod(xxhash64(key), n_buckets)`` and each micro-batch

    1. reconciles the delta and computes its touched bucket set (≤
       n_buckets values — a driver-side collect of bucket ids, never keys),
    2. reads ONLY those state partitions back (partition pruning on the
       bucket directory column),
    3. writes the merged buckets with dynamic partition overwrite, so
       parquet files in untouched buckets are never rewritten.

    Per-batch I/O is therefore O(touched state) not O(total state); at
    100 TB with n_buckets sized so a bucket fits an executor, a micro-batch
    touching k keys rewrites at most k buckets. ``tests/test_streaming.py::
    test_sink_rewrites_only_touched_buckets`` pins the behavior via file
    mtimes. (The StateStore form ``cdc_apply_stateful_stream`` above remains
    the no-filesystem-round-trip alternative.)
    """

    spark: SparkSession
    state_dir: str
    n_buckets: int = 16
    _committed: set[int] = field(default_factory=set)

    @property
    def _commit_log(self) -> str:
        return os.path.join(self.state_dir, "_commits.json")

    def _load_commits(self) -> set[int]:
        if os.path.exists(self._commit_log):
            with open(self._commit_log) as f:
                return set(json.load(f))
        return set()

    def _save_commits(self) -> None:
        # the parquet write normally creates state_dir, but a committed
        # NO-OP batch (empty feed) reaches here first — create the dir
        # (round-10 EMPTY-fixture catch, found by the CLI-on-empty run)
        os.makedirs(self.state_dir, exist_ok=True)
        with open(self._commit_log, "w") as f:
            json.dump(sorted(self._committed), f)

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("key"), F.lit(self.n_buckets))
        )

    def state(self) -> DataFrame | None:
        path = os.path.join(self.state_dir, "state")
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return None  # first batch: no state yet

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._committed = self._load_commits()
        if batch_id in self._committed:
            return  # replayed epoch — idempotent no-op
        delta = self._bucket(reconcile(batch_df))
        old = self.state()
        path = os.path.join(self.state_dir, "state")
        tmp = os.path.join(self.state_dir, f"state_tmp_{batch_id}")
        # The state-write → commit-log sequence is not atomic; a crash
        # between the two replays the batch, which is safe only because
        # merge_states is last-writer-wins idempotent per key.
        try:
            if old is None:
                new = delta
            else:
                # ≤ n_buckets small ints — the only driver-side collect.
                touched = [
                    r["bucket"] for r in delta.select("bucket").distinct().collect()
                ]
                # .filter on the partition column prunes to the touched
                # bucket directories; unread buckets cost zero I/O.
                new = self._bucket(
                    merge_states(old.filter(F.col("bucket").isin(touched)), delta)
                )
            if new.isEmpty():
                # an EMPTY micro-batch (zero envelopes after filters —
                # e.g. a heartbeat-only feed) folds to no state change;
                # writing an empty tmp dir would fail on read-back
                # (round-10 EMPTY-fixture catch, same guard as the SCD2
                # sink) — commit the no-op instead
                self._committed.add(batch_id)
                self._save_commits()
                return
            # Two-phase: materialize the merged buckets to tmp first (the
            # merge READS path, so overwriting path in the same job would
            # clobber its own input), then dynamic-partition-overwrite into
            # the state table — only directories present in tmp (= touched
            # buckets) are replaced; all other bucket files stay untouched.
            new.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
            (
                self.spark.read.parquet(tmp)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(path)
            )
            self._committed.add(batch_id)
            self._save_commits()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def current(self) -> DataFrame:
        st = self.state()
        if st is None:
            # EMPTY feed (round-10 EMPTY-fixture catch): a replay that
            # carried zero envelopes writes no state files — the correct
            # sink table is EMPTY, not an error. Schema is static for
            # this feed (current_state's projection of the envelope).
            return self.spark.createDataFrame(
                [],
                "key long, last_ts timestamp, last_event_type string,"
                " last_value double, last_k long",
            )
        return current_state(st)


def scd2_versions(envelopes: DataFrame) -> DataFrame:
    """SCD2 version rows from one envelope bag: every non-delete envelope
    opens an interval; the key's next envelope (delete included) closes
    it. Same (key)-partitioned window the apply path shuffles by."""
    w = Window.partitionBy("key").orderBy("ts", "seq")
    versioned = envelopes.select(
        "key", "ts", "seq", "op", F.col("after.value").alias("value")
    ).withColumn("next_ts", F.lead("ts").over(w))
    return versioned.filter(F.col("op") != OP_DELETE).select(
        "key",
        "seq",
        "value",
        F.col("ts").alias("valid_from"),
        F.col("next_ts").alias("valid_to"),
        F.col("next_ts").isNull().alias("is_current"),
    )


@dataclass
class Scd2ParquetSink:
    """foreachBatch sink maintaining the SCD2 HISTORY table incrementally
    — the streaming twin of the batch ``cdc_scd2`` window (same oracle:
    micro-batch folding must be invisible). Reuses CdcParquetSink's
    bounded-commit protocol verbatim: hash(key) bucket partitioning,
    touched-bucket partition pruning on read, two-phase dynamic partition
    overwrite on write, batch-id commit log for idempotent replay.

    Per batch: (1) the delta's own envelopes become version rows via the
    same window the batch form uses; (2) each touched key's still-open
    row in state is CLOSED with the key's first delta timestamp (delete
    envelopes close without opening). Correct under the replay's
    guarantee that per-key (ts, seq) never decreases across micro-batches
    — the oplog's total order (SURVEY §1.1).

    Crash-replay idempotency (round 9): the state-write → commit-log
    sequence is not atomic, so a crash between the two replays a batch
    whose rows are already (even PARTIALLY — the dynamic partition
    overwrite is per-bucket-directory, not atomic across buckets) in
    state. CdcParquetSink survives that window because LWW merge is
    idempotent; the SCD2 fold is made idempotent explicitly, per row:
    (a) an open row is closed only when the delta's first (ts, seq) is
    STRICTLY GREATER than the row's own (valid_from, seq) — a replayed
    batch's first envelope never out-orders the open row it itself
    created, so re-closing (which would corrupt the interval with an
    older timestamp) cannot happen; (b) delta version rows are added via
    a (key, seq) anti-join against the touched state, so rows already
    folded are not duplicated. Both guards are no-ops on the happy path
    (per-key monotone (ts, seq) makes the strict comparison true and the
    anti-join empty for genuinely new batches).
    tests/test_streaming.py::test_scd2_sink_failure_replay_* pin both
    interleavings deterministically."""

    spark: SparkSession
    state_dir: str
    n_buckets: int = 16
    _committed: set[int] = field(default_factory=set)

    # -- identical commit/bucket plumbing to CdcParquetSink ---------------
    @property
    def _commit_log(self) -> str:
        return os.path.join(self.state_dir, "_commits.json")

    def _load_commits(self) -> set[int]:
        if os.path.exists(self._commit_log):
            with open(self._commit_log) as f:
                return set(json.load(f))
        return set()

    def _save_commits(self) -> None:
        # the parquet write normally creates state_dir, but a committed
        # NO-OP batch (empty feed) reaches here first — create the dir
        # (round-10 EMPTY-fixture catch, found by the CLI-on-empty run)
        os.makedirs(self.state_dir, exist_ok=True)
        with open(self._commit_log, "w") as f:
            json.dump(sorted(self._committed), f)

    def _bucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64("key"), F.lit(self.n_buckets))
        )

    def state(self) -> DataFrame | None:
        path = os.path.join(self.state_dir, "state")
        try:
            return self.spark.read.parquet(path)
        except Exception:
            return None

    # -- the SCD2 fold -----------------------------------------------------
    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self._committed = self._load_commits()
        if batch_id in self._committed:
            return
        delta_rows = self._bucket(scd2_versions(batch_df))
        first_ts = batch_df.groupBy("key").agg(
            F.min(F.struct("ts", "seq")).alias("_first_delta")
        )
        old = self.state()
        path = os.path.join(self.state_dir, "state")
        tmp = os.path.join(self.state_dir, f"state_tmp_{batch_id}")
        try:
            if old is None:
                new = delta_rows
            else:
                # Touched buckets come from ALL batch keys — scd2_versions
                # drops delete envelopes, so deriving buckets from
                # delta_rows would skip a bucket whose micro-batch slice is
                # all-deletes and leave its keys' open rows unclosed,
                # breaking the stream==batch invariant the oracle asserts.
                touched = [
                    r["bucket"]
                    for r in self._bucket(batch_df.select("key").distinct())
                    .select("bucket")
                    .distinct()
                    .collect()
                ]
                old_t = old.filter(F.col("bucket").isin(touched))
                # close-guard: strictly-greater (ts, seq) — replay-safe
                # (see class docstring). Field names aliased to match the
                # aggregated struct so the comparison is well-typed. The
                # key joins are NULL-SAFE: a NULL document key is a real
                # CDC key group (the window oracle partitions it as one),
                # and a plain equi-join left the NULL key's open rows
                # unclosed forever (round-9 NULL-fixture catch).
                row_pos = F.struct(
                    F.col("valid_from").alias("ts"), F.col("seq").alias("seq")
                )
                ft = first_ts.select(F.col("key").alias("_ft_key"), "_first_delta")
                closed = (
                    old_t.join(
                        F.broadcast(ft),
                        F.col("key").eqNullSafe(F.col("_ft_key")),
                        "left",
                    )
                    .drop("_ft_key")
                    .withColumn(
                        "valid_to",
                        F.when(
                            F.col("is_current")
                            & F.col("_first_delta").isNotNull()
                            & (row_pos < F.col("_first_delta")),
                            F.col("_first_delta.ts"),
                        ).otherwise(F.col("valid_to")),
                    )
                    .withColumn("is_current", F.col("valid_to").isNull())
                    .drop("_first_delta")
                )
                # add-guard: only version rows not already folded (replay /
                # partial-overwrite safe); (key, seq) is the version PK —
                # null-safe on key for the same reason as the close-guard.
                ex = old_t.select(
                    F.col("key").alias("_ex_key"), F.col("seq").alias("_ex_seq")
                )
                fresh = delta_rows.join(
                    ex,
                    F.col("key").eqNullSafe(F.col("_ex_key"))
                    & (F.col("seq") == F.col("_ex_seq")),
                    "left_anti",
                )
                new = closed.unionByName(fresh)
            if new.isEmpty():
                # nothing to fold (e.g. an all-delete batch for keys the
                # state never saw) — writing an empty tmp dir would fail on
                # read-back; the batch is a committed no-op instead
                self._committed.add(batch_id)
                self._save_commits()
                return
            new.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
            (
                self.spark.read.parquet(tmp)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(path)
            )
            self._committed.add(batch_id)
            self._save_commits()
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def history(self) -> DataFrame:
        st = self.state()
        if st is None:
            # EMPTY feed: zero envelopes → empty SCD2 history, not an
            # error (round-10 EMPTY-fixture catch; schema is static).
            return self.spark.createDataFrame(
                [],
                "key long, seq long, value double, valid_from timestamp,"
                " valid_to timestamp, is_current boolean",
            )
        return st.select(
            "key", "seq", "value", "valid_from", "valid_to", "is_current"
        )
