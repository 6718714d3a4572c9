"""§2.6 sort / limit / top-k.

Scale notes: global ORDER BY is a range-partitioned sort (sampled
boundaries) — fine at 100 TB; ORDER BY + LIMIT k fuses into
TakeOrderedAndProject (per-partition heap of k, then k·p merge on the
driver) — no full sort ever materializes. Top-k per group is a window
rank over a single hash shuffle. Every LIMIT here is preceded by a
total order with a unique tiebreak key, otherwise the result set is
nondeterministic and un-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.registry import register


@register(
    "sort_multi",
    oracle="""
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer
ORDER BY c_acctbal DESC NULLS LAST, c_nationkey ASC, c_custkey
""",
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with null placement. (The hash gate is
    order-insensitive; the sort is still exercised in the plan.)"""
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_nationkey").asc(), "c_custkey"
    )


@register(
    "limit",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 100
""",
)
def limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT after a total order on a unique key — the only deterministic
    form of LIMIT."""
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(100)


@register(
    "topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT fused by Spark into TakeOrderedAndProject — no full
    sort at any scale. o_orderkey breaks ties deterministically."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
SELECT event_type, event_id, user_id, value, rk
FROM (
  SELECT event_type, event_id, user_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
  FROM events
)
WHERE rk <= 3
""",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k within each group: one hash shuffle on the group key, then a
    per-partition sort — the scalable form of per-group ranking."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), "event_id")
    return (
        ev.select("event_type", "event_id", "user_id", "value")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )
