"""Anchor for cdc_replication_lag's bucketed percentiles.

The query reads p50/p95 off a fixed 1-second histogram (bounded agg
state — the 100 TB requirement). Because the synthesized lags are
integer-valued, the bucketed inverse-CDF percentile must EQUAL the
exact type-1 (nearest-rank) percentile computed from the raw rows —
this test pins that, plus exact n/max, for every hour.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.suite.cdc import cdc_replication_lag, events_as_envelopes


def test_bucketed_percentiles_equal_exact_nearest_rank(spark, sf_dir):
    got = {r["hr"]: r for r in cdc_replication_lag(spark, sf_dir).collect()}
    env = events_as_envelopes(spark, sf_dir)
    lag = env.select(
        F.date_trunc("hour", "ts").alias("hr"),
        ((F.col("seq") * 37) % 300).cast("double").alias("lag_s"),
    )
    w = Window.partitionBy("hr").orderBy("lag_s")
    ranked = lag.select(
        "hr",
        "lag_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("hr")).alias("n"),
    )
    # type-1 / nearest-rank: smallest value whose rank covers q·n,
    # in integer arithmetic (rn·k ≥ n·m ⟺ rn ≥ ceil(n·m/k))
    exact = ranked.groupBy("hr").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("rn") * 2 >= F.col("n"), F.col("lag_s"))).alias("p50"),
        F.min(F.when(F.col("rn") * 20 >= F.col("n") * 19, F.col("lag_s"))).alias("p95"),
        F.max("lag_s").alias("mx"),
    ).collect()
    assert len(exact) == len(got) and len(got) > 0
    for r in exact:
        g = got[r["hr"]]
        assert g["n_applied"] == r["n"]
        assert g["p50_lag_s"] == r["p50"], (g, r)
        assert g["p95_lag_s"] == r["p95"], (g, r)
        assert g["max_lag_s"] == r["mx"]
