"""Invariant + plan-shape tests for the hypertable-style time-series ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.suite.timeseries import (
    anomaly_zscore,
    ts_gapfill,
    ts_ohlc_downsample,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gapfill_grid_is_dense_and_ffilled(spark, sf_dir):
    out = ts_gapfill(spark, sf_dir).cache()
    try:
        # Dense grid: per user, row count == hours spanned inclusive.
        bad = (
            out.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                (
                    (F.unix_timestamp(F.max("bucket")) - F.unix_timestamp(F.min("bucket")))
                    / 3600
                    + 1
                ).cast("long").alias("expected"),
            )
            .filter(F.col("n") != F.col("expected"))
            .count()
        )
        assert bad == 0
        # Gap rows carry zero events; observed rows carry >=1.
        assert out.filter(F.col("is_gap") & (F.col("n_events") != 0)).count() == 0
        assert out.filter(~F.col("is_gap") & (F.col("n_events") < 1)).count() == 0
        # Forward fill: the first bucket per user is observed (span starts
        # at an observation), so value_ffill is never null.
        assert out.filter(F.col("value_ffill").isNull()).count() == 0
    finally:
        out.unpersist()


def test_ohlc_invariants_and_single_exchange(spark, sf_dir):
    out = ts_ohlc_downsample(spark, sf_dir)
    rows = out.filter(
        (F.col("high") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("n_ticks") < 1)
    ).count()
    assert rows == 0
    # Window partition keys == groupBy keys on a materialized column →
    # the aggregate must reuse the window's exchange (one shuffle total).
    assert _plan(out).count("Exchange hashpartitioning") == 1


def test_anomaly_zscore_threshold_and_broadcast(spark, sf_dir):
    out = ts_anomaly = anomaly_zscore(spark, sf_dir)
    assert ts_anomaly.filter(F.abs(F.col("zscore")) <= 2.5).count() == 0
    # The per-event-type stats join must broadcast — the scan side never
    # shuffles.
    p = _plan(out)
    assert "BroadcastHashJoin" in p
    assert p.count("Exchange hashpartitioning") <= 1
