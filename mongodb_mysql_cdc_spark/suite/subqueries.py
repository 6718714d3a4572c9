"""SQL subquery surface — EXISTS / NOT EXISTS / IN / scalar subqueries,
expressed through ``spark.sql`` so Catalyst's subquery rewrites
(RewritePredicateSubquery → semi/anti join, scalar-subquery broadcast)
are what actually run. The DataFrame spellings of the same algebra live
in suite/joins.py (join_semi/join_anti); this module proves the *SQL
dialect* surface a MySQL-side user would write.

100 TB notes: correlated EXISTS/IN rewrite to hash semi-joins (shuffle on
the correlation key — same cost model as join_semi); an uncorrelated
scalar subquery executes once and broadcasts as a literal, never a
per-row lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.functions.compat import hround, sql_round
from mongodb_mysql_cdc_spark.registry import register


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load(spark, sf_dir, t).createOrReplaceTempView(f"_sq_{t}")


@register(
    "subquery_exists",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
)
""",
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → Catalyst rewrites to a left-semi hash join."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM _sq_orders o
        WHERE EXISTS (
          SELECT 1 FROM _sq_lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
        )
        """
    )


@register(
    "subquery_not_exists",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
)
""",
)
def subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS → left-anti hash join (customers with no
    order above the threshold — chosen so the result is non-trivially
    between 0 and |customer| at every SF)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _sq_customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM _sq_orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@register(
    "subquery_in",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey IN (
  SELECT n_nationkey FROM nation WHERE n_regionkey <= 1
)
""",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (subquery) → semi join against the (tiny, broadcastable) key
    set."""
    _views(spark, sf_dir, "supplier", "nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM _sq_supplier
        WHERE s_nationkey IN (
          SELECT n_nationkey FROM _sq_nation WHERE n_regionkey <= 1
        )
        """
    )


@register(
    "subquery_scalar",
    oracle="""
SELECT o_orderkey, o_totalprice,
       CAST(floor((o_totalprice - (SELECT avg(o_totalprice) FROM orders)) * 100.0 + 0.5)
            / 100.0 AS DOUBLE) AS price_vs_avg
FROM orders
WHERE o_totalprice > (SELECT max(o_totalprice) FROM orders) * 0.5
""",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subqueries in SELECT and WHERE — each executes
    once and is broadcast as a literal (never a per-row lookup).

    Determinism: the WHERE scalar is max()*0.5 — exact fp on both engines,
    so the row set cannot flap at the boundary; the SELECT uses avg(),
    whose fp summation ORDER differs across engines (ulp-level), so the
    derived column is hround-ed to 2dp on both sides."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               CAST(floor((o_totalprice - (SELECT avg(o_totalprice) FROM _sq_orders)) * 100.0 + 0.5)
                    / 100.0 AS DOUBLE) AS price_vs_avg
        FROM _sq_orders
        WHERE o_totalprice > (SELECT max(o_totalprice) FROM _sq_orders) * 0.5
        """
    )


@register(
    "join_lateral",
    oracle="""
SELECT r.r_name, t.n_name, t.n_suppliers
FROM region r
CROSS JOIN LATERAL (
  SELECT n.n_name, count(*) AS n_suppliers
  FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name
  ORDER BY n_suppliers DESC, n.n_name
  LIMIT 2
) t
""",
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    nations by supplier count per region) — the 'for each row, run a
    parameterized query' surface. Catalyst decorrelates it into a join +
    per-group rank prune, i.e. the same physical shape as topk_per_group
    — proof the lateral dialect costs nothing over the window spelling.
    Ties break on n_name so the LIMIT is deterministic on both engines."""
    _views(spark, sf_dir, "region", "nation", "supplier")
    return spark.sql(
        """
        SELECT r.r_name, t.n_name, t.n_suppliers
        FROM _sq_region r
        JOIN LATERAL (
          SELECT n.n_name, count(*) AS n_suppliers
          FROM _sq_nation n JOIN _sq_supplier s ON s.s_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_suppliers DESC, n.n_name
          LIMIT 2
        ) t
        """
    )


@register(
    "subquery_not_in_null",
    oracle="""
WITH bulk AS (
  SELECT CASE WHEN l_quantity >= 49 THEN NULL ELSE l_partkey END AS pk
  FROM lineitem WHERE l_quantity >= 48
)
SELECT p_partkey, p_name,
       (SELECT count(*) FROM part p2
        WHERE p2.p_partkey NOT IN (SELECT pk FROM bulk)) AS naive_not_in_rows
FROM part
WHERE p_partkey NOT IN (SELECT pk FROM bulk WHERE pk IS NOT NULL)
"""
)
def subquery_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware NOT IN — SQL's three-valued-logic trap, exhibited and
    checked on BOTH engines: the subquery list contains NULLs, so the
    naive ``NOT IN`` matches zero rows (scalar column pins that 0), while
    the correct formulation filters NULLs first and Spark plans it as the
    cheap hash anti join. Spark plans the naive form as a null-aware anti
    join (BroadcastNestedLoop) — the reason SURVEY §2.11 recommends
    NOT EXISTS / explicit null filtering at scale."""
    li = load(spark, sf_dir, "lineitem")
    bulk = li.filter(F.col("l_quantity") >= 48).select(
        F.when(F.col("l_quantity") >= 49, F.lit(None).cast("long"))
        .otherwise(F.col("l_partkey"))
        .alias("pk")
    )
    bulk.createOrReplaceTempView("_sq_bulk_nullable")
    load(spark, sf_dir, "part").createOrReplaceTempView("_sq_part_nn")
    return spark.sql(
        """
        SELECT p_partkey, p_name,
               (SELECT count(*) FROM _sq_part_nn p2
                WHERE p2.p_partkey NOT IN (SELECT pk FROM _sq_bulk_nullable)) AS naive_not_in_rows
        FROM _sq_part_nn
        WHERE p_partkey NOT IN (SELECT pk FROM _sq_bulk_nullable WHERE pk IS NOT NULL)
        """
    )


@register(
    "subquery_any_all",
    oracle=f"""
SELECT o_orderkey, o_custkey, {sql_round('o_totalprice')} AS o_totalprice
FROM orders
WHERE o_totalprice > ALL (SELECT avg(o_totalprice) FROM orders GROUP BY o_orderpriority)
   OR o_totalprice < ANY (SELECT min(o_totalprice) * 1.1 FROM orders GROUP BY o_orderstatus)
""",
)
def subquery_any_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparisons (> ALL / < ANY) — the subquery dialect
    Spark SQL does NOT parse: rewritten to their scalar-aggregate
    equivalents (x > ALL(S) ⇔ x > max(S); x < ANY(S) ⇔ x < max(S)),
    which is also exactly what a quantifier-aware optimizer lowers them
    to. The oracle runs DuckDB's NATIVE ALL/ANY — a genuine two-dialect
    semantics check, and the Spark plan is two broadcast scalar
    subqueries instead of a quantified nested loop."""
    o = load(spark, sf_dir, "orders")
    all_max = o.groupBy("o_orderpriority").agg(
        F.avg("o_totalprice").alias("a")
    ).agg(F.max("a").alias("all_max"))
    any_max = o.groupBy("o_orderstatus").agg(
        (F.min("o_totalprice") * 1.1).alias("m")
    ).agg(F.max("m").alias("any_max"))
    return (
        o.crossJoin(F.broadcast(all_max))
        .crossJoin(F.broadcast(any_max))
        .where(
            (F.col("o_totalprice") > F.col("all_max"))
            | (F.col("o_totalprice") < F.col("any_max"))
        )
        .select("o_orderkey", "o_custkey", hround(F.col("o_totalprice")).alias("o_totalprice"))
    )
