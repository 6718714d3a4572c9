"""Event-time windows + watermarks (§2.9) — shared by the batch-equivalent
suite queries and the live streaming tests, so stream/batch parity is
enforced by construction (same column algebra on both sides)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(ev: DataFrame, width: str = "1 hour") -> DataFrame:
    """Fixed windows: events per (window, type)."""
    return (
        ev.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
        )
    )


def sliding_counts(ev: DataFrame, width: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        ev.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n",
        )
    )


def session_counts(ev: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based sessions per user: a session ends after `gap` of silence;
    session end = last event + gap (Spark session_window semantics)."""
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def with_watermark(ev: DataFrame, delay: str = "1 hour") -> DataFrame:
    return ev.withWatermark("ts", delay)


# --- custom stateful sessionization (applyInPandasWithState) ----------------


def stateful_session_stream(ev: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Session windows as a CUSTOM stateful operator — the
    applyInPandasWithState counterpart to the built-in
    ``session_window`` (§2.9's "custom stateful operator" row; pairs with
    ``session_counts`` the way ``cdc_apply_stateful_stream`` pairs with
    the batch apply).

    Per key the StateStore holds the OPEN session (start, last_ts, n).
    Each micro-batch folds its events in (ts, event_id) order: a gap
    >= ``gap_seconds`` closes the session (emit final row) and opens a
    new one; otherwise the session extends. After folding, the open
    session's current snapshot is ALSO emitted, so the stream needs no
    timeout/watermark machinery to flush the tail — emissions are
    monotone per (key, session_start) and the consumer keeps the last
    (update-mode fold: groupBy max, exactly like cdc_apply_stateful).

    ORDERING CONTRACT: events for one key must arrive in nondecreasing ts
    order ACROSS micro-batches — true for the harness replay (time-ordered
    chunks) and for any per-key-ordered feed (a keyed Kafka partition, the
    oplog's resume-token order). Late stragglers would need the
    session_window/watermark form instead (``stream_session``); this form
    trades that tolerance for never buffering more than the open session.

    At 100 TB: state per key is three scalars — the smallest possible
    session state; no window buffering, no watermark lag, emissions
    shuffle only (key, session) rows.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    state_schema = T.StructType(
        [
            T.StructField("session_start", T.TimestampType()),
            T.StructField("last_ts", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )

    # Nested kernel: cloudpickle ships it by value (module-level would
    # pickle by reference and break when executors can't import the repo).
    def session_kernel(key, pdf_iter, state):
        import pandas as pd

        gap = pd.Timedelta(seconds=gap_seconds)
        user = key[0]
        if state.exists:
            start, last, n = state.get
            start, last = pd.Timestamp(start), pd.Timestamp(last)
        else:
            start = last = None
            n = 0

        closed = []
        for pdf in pdf_iter:
            for _, ev in pdf.sort_values(["ts", "event_id"]).iterrows():
                ts = ev["ts"]
                if start is None:
                    start, last, n = ts, ts, 1
                elif ts - last >= gap:
                    closed.append((start, last + gap, user, n))
                    start, last, n = ts, ts, 1
                else:
                    last = ts
                    n += 1

        state.update((start.to_pydatetime(), last.to_pydatetime(), int(n)))
        # closed sessions are final; the open session's snapshot supersedes
        # any earlier snapshot of the same (user, session_start)
        rows = closed + [(start, last + gap, user, n)]
        yield pd.DataFrame(
            rows, columns=["session_start", "session_end", "user_id", "n_events"]
        )

    return ev.select("user_id", "ts", "event_id").groupBy("user_id").applyInPandasWithState(
        session_kernel,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def fold_session_updates(emissions: DataFrame) -> DataFrame:
    """Collapse update-mode session emissions to final sessions: per
    (user, session_start) the last snapshot wins — emissions grow
    monotonically in (session_end, n_events), so max() IS last."""
    return (
        emissions.groupBy("user_id", "session_start")
        .agg(
            F.max("session_end").alias("session_end"),
            F.max("n_events").alias("n_events"),
        )
        .select("session_start", "session_end", "user_id", "n_events")
    )
