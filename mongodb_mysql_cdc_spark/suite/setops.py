"""§2.7 set operations — the CDC merge/validation primitives.

``union_all`` is the snapshot+delta merge; ``except`` is the drift check
between a snapshot and the applied sink state. All are shuffle-on-all-
columns ops in their DISTINCT forms — at 100 TB prefer keyed variants
(anti-join on the PK) where a key exists; shown here in both forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.registry import register


@register(
    "union_all",
    oracle="""
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
""",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by name — the snapshot ∪ delta merge step."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return o.filter(F.col("o_orderstatus") == "F").unionByName(
        o.filter(F.col("o_orderstatus") == "O")
    )


@register(
    "union_distinct",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'signup'
""",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.union(b).distinct()


@register(
    "intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "except_distinct",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
""",
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-vs-applied drift check: keys present on one side only."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)


@register(
    "except_all",
    oracle="""
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
EXCEPT ALL
SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
""",
)
def except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference — multiplicity-preserving EXCEPT ALL."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.exceptAll(r)


@register(
    "union_schema_evolve",
    oracle="""
SELECT o_orderkey AS id, o_totalprice AS amount,
       o_orderpriority AS priority, CAST(NULL AS VARCHAR) AS segment
FROM orders WHERE o_orderkey % 100 = 0
UNION ALL BY NAME
SELECT c_custkey AS id, c_acctbal AS amount,
       CAST(NULL AS VARCHAR) AS priority, c_mktsegment AS segment
FROM customer WHERE c_custkey % 50 = 0
""",
)
def union_schema_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolving union (unionByName with allowMissingColumns) — how
    two producer generations' outputs stack when one added a column: the
    missing side null-fills BY NAME, never by position (the silent-
    corruption mode of plain UNION when column orders drift). DuckDB
    spells the same contract UNION ALL BY NAME. Narrow, no shuffle."""
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 100 == 0)
        .select(
            F.col("o_orderkey").alias("id"),
            F.col("o_totalprice").alias("amount"),
            F.col("o_orderpriority").alias("priority"),
        )
    )
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_acctbal").alias("amount"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return o.unionByName(c, allowMissingColumns=True)
