"""Distributed global ranking: ntile / row_number without the
single-partition WindowExec.

``Window.orderBy(...)`` with no partitionBy moves EVERY row to one task —
the plan works at any SF locally and is serial at cluster scale. The
distributed spelling here keeps the exact same output:

1. ``repartitionByRange`` on the order key (parallel range sort — the
   same machinery as a global ``orderBy``, minus the final single-task
   window);
2. per-partition ``row_number`` (parallel: each partition numbers its own
   rows);
3. per-partition counts → cumulative offsets via a tiny theta-join
   cumsum (|partitions|² rows, thousands at most — no window, no
   collect);
4. global position = local row_number + broadcast offset, and ntile's
   bucket arithmetic computed from the broadcast total row count.

Output is deterministic and boundary-independent: the order key must be
a TOTAL order (callers append a unique tiebreak column), so each row's
global position is well-defined no matter where the range sampler cuts
partitions.

SQL-standard ntile(k) over n rows: q = n div k, r = n mod k — the first
r buckets take q+1 rows, the rest take q.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def with_global_position(df: DataFrame, order_cols: list[str], out: str) -> DataFrame:
    """Append 1-based global position under ORDER BY order_cols.

    ``order_cols`` must form a total order (include a unique key last).
    Adds only the ``out`` column; `_gp_*` intermediates are dropped.
    """
    d = df.repartitionByRange(*[F.col(c) for c in order_cols]).withColumn(
        "_gp_pid", F.spark_partition_id()
    )
    local = Window.partitionBy("_gp_pid").orderBy(*order_cols)
    d = d.withColumn("_gp_rn", F.row_number().over(local))
    counts = d.groupBy("_gp_pid").agg(F.count(F.lit(1)).alias("_gp_cnt"))
    lower = counts.select(
        F.col("_gp_pid").alias("_gp_pid2"), F.col("_gp_cnt").alias("_gp_cnt2")
    )
    offsets = (
        counts.join(F.broadcast(lower), F.col("_gp_pid2") < F.col("_gp_pid"), "left")
        .groupBy("_gp_pid")
        .agg(F.coalesce(F.sum("_gp_cnt2"), F.lit(0)).alias("_gp_off"))
    )
    return (
        d.join(F.broadcast(offsets), "_gp_pid")
        .withColumn(out, F.col("_gp_off") + F.col("_gp_rn"))
        .drop("_gp_pid", "_gp_rn", "_gp_off")
    )


def ntile_expr(pos: Column, n: Column, k: int) -> Column:
    """SQL-standard ntile(k) bucket for global position ``pos`` of ``n``
    rows: the first n%k buckets hold n//k+1 rows, the rest n//k."""
    q = F.floor(n / k)
    r = n - q * k
    big = r * (q + 1)  # rows covered by the first r (larger) buckets
    return (
        F.when(pos <= big, F.ceil(pos / (q + 1)))
        .otherwise(r + F.ceil((pos - big) / q))
        .cast("long")
    )


def distributed_ntile(
    df: DataFrame, order_cols: list[str], k: int, out: str
) -> DataFrame:
    """Append ``out`` = ntile(k) OVER (ORDER BY order_cols) — computed
    with range partitioning + broadcast offsets instead of a
    single-partition window. ``order_cols`` must include a unique
    tiebreak so the order is total."""
    pos = with_global_position(df, order_cols, "_nt_pos")
    total = pos.agg(F.count(F.lit(1)).alias("_nt_n"))
    return (
        pos.crossJoin(F.broadcast(total))
        .withColumn(out, ntile_expr(F.col("_nt_pos"), F.col("_nt_n"), k))
        .drop("_nt_pos", "_nt_n")
    )


def with_global_cumsum(
    df: DataFrame, order_cols: list[str], val: str, out: str
) -> DataFrame:
    """Append ``out`` = sum(val) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING) — the global running total, distributed the same way as
    :func:`with_global_position`: range-partition on the order key,
    per-partition running sum (parallel), per-partition totals →
    broadcast cumulative offsets (|partitions|² tiny theta-join, no
    window, no collect). ``order_cols`` must form a total order.

    Precondition: ``val`` must be non-null (coalesce first). A window's
    running sum SKIPS nulls (a null-prefix row still sees the earlier
    partitions' total), but here a null local running sum would null the
    offset addition — the two spellings diverge exactly on null values,
    so the operator refuses the ambiguity rather than silently picking
    one."""
    d = df.repartitionByRange(*[F.col(c) for c in order_cols]).withColumn(
        "_gc_pid", F.spark_partition_id()
    )
    local = (
        Window.partitionBy("_gc_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = d.withColumn("_gc_run", F.sum(val).over(local))
    sums = d.groupBy("_gc_pid").agg(F.sum(val).alias("_gc_sum"))
    lower = sums.select(
        F.col("_gc_pid").alias("_gc_pid2"), F.col("_gc_sum").alias("_gc_sum2")
    )
    offsets = (
        sums.join(F.broadcast(lower), F.col("_gc_pid2") < F.col("_gc_pid"), "left")
        .groupBy("_gc_pid")
        .agg(F.coalesce(F.sum("_gc_sum2"), F.lit(0)).alias("_gc_off"))
    )
    return (
        d.join(F.broadcast(offsets), "_gc_pid")
        .withColumn(out, F.col("_gc_off") + F.col("_gc_run"))
        .drop("_gc_pid", "_gc_run", "_gc_off")
    )
