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


def test_interpolate_matches_locf_on_observed_rows(spark, sf_dir):
    from mongodb_mysql_cdc_spark.suite.timeseries import ts_interpolate_linear

    out = ts_interpolate_linear(spark, sf_dir).cache()
    try:
        # Interpolated values must lie within [min(prev,next), max(prev,next)]
        # — linear interpolation never overshoots its anchors. Cheap proxy:
        # every value lies within the user's observed min/max envelope.
        env = (
            out.filter(~F.col("interpolated"))
            .groupBy("user_id")
            .agg(F.min("value_interp").alias("vlo"), F.max("value_interp").alias("vhi"))
        )
        bad = (
            out.join(env, "user_id")
            .filter(
                (F.col("value_interp") < F.col("vlo") - 1e-9)
                | (F.col("value_interp") > F.col("vhi") + 1e-9)
            )
            .count()
        )
        assert bad == 0
        assert out.filter(F.col("value_interp").isNull()).count() == 0
    finally:
        out.unpersist()


def test_scan_partition_pruned_plan(spark, sf_dir):
    from mongodb_mysql_cdc_spark.suite.io import scan_partition_pruned

    out = scan_partition_pruned(spark, sf_dir)
    p = _plan(out)
    # The day predicate must land in the scan's PartitionFilters (directory
    # pruning at planning time), not a post-scan Filter.
    assert "PartitionFilters: [" in p
    assert "day" in p.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert out.count() > 0
