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
