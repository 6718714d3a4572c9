"""Cross-engine determinism helpers.

Spark's ``round()`` converts the double through Java BigDecimal (HALF_UP on
the shortest decimal string); DuckDB rounds the scaled double. They disagree
on values like 2.675. ``hround`` instead uses only IEEE-754 double ops
(multiply, add, floor, divide), which are bit-identical across engines:

    Spark : F.floor(col * 10^n + 0.5) / 10^n
    DuckDB: floor(expr * 10^n + 0.5) / 10^n     (same string via SQL_ROUND)

Use ``hround`` + the matching ``sql_round`` snippet in every oracle-checked
query that emits a floating aggregate. (Half-up-toward-+inf for negatives —
consistent on both sides, which is all the hash needs.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hround(col: Column, n: int = 2) -> Column:
    """Hash-stable round to n decimals (see module docstring)."""
    scale = float(10**n)
    return F.floor(col * scale + 0.5) / scale


def sql_round(expr: str, n: int = 2) -> str:
    """The DuckDB-side spelling of ``hround`` for oracle SQL strings.

    Also valid Spark SQL: the CAST keeps the result DOUBLE in both parsers
    (a bare ``/ 100.0`` literal would be DECIMAL division in Spark SQL).
    """
    scale = float(10**n)
    return f"CAST(floor(({expr}) * {scale} + 0.5) / {scale} AS DOUBLE)"


# --- exact decimal accumulators (round 8) -----------------------------------
#
# ``hround(sum(double))`` is a comparison contract that TIGHTENS with corpus
# size: the sum's magnitude grows linearly while the fixed-decimal rounding
# granularity doesn't, so a one-ulp merge-order difference eventually lands
# on a round-half boundary (the sf1 strict sweep caught exactly this in
# agg_product and analytics_pareto). For columns on a fixed-point grid
# (FIXTURES.md: every money-like column is a 2-decimal grid), the
# scale-stable contract is an EXACT decimal accumulator: decimal partials
# merge exactly in any order at any corpus size, and casting the exact
# decimal to DOUBLE at the end gives the bit-identical value on both
# engines — no tolerance at all. Use ``dec_sum``/``sql_dec_sum`` (and the
# avg pair) for every corpus-group sum of a grid column.
#
# The decimal→double conversion goes VIA STRING on both engines: a direct
# cast is engine-specific once the scaled integer exceeds 2^53 (DuckDB
# computes (double)int128 / (double)10^scale — two roundings; Java's
# BigDecimal.doubleValue is correctly rounded — the sf10x sweep caught
# them disagreeing by one ulp on pricing_summary's 6-decimal charge sum).
# Decimal→string is exact on both engines and string→double is correctly
# rounded on both (strtod / Double.parseDouble), so the via-string double
# is bit-identical at ANY magnitude.


def dec_to_double(col: Column) -> Column:
    """Exact-decimal → DOUBLE via string (correctly rounded, any magnitude)."""
    return col.cast("string").cast("double")


def sql_dec_to_double(expr: str) -> str:
    """Oracle-side ``dec_to_double`` (STRING is valid in both dialects)."""
    return f"CAST(CAST(({expr}) AS STRING) AS DOUBLE)"


def dec_sum(col: Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact sum of a fixed-point-grid double via decimal partials → DOUBLE."""
    return dec_to_double(F.sum(col.cast(f"decimal({prec},{scale})")))


def sql_dec_sum(expr: str, prec: int = 18, scale: int = 2) -> str:
    """The oracle-side spelling of ``dec_sum`` (valid in both SQL dialects)."""
    return sql_dec_to_double(f"sum(CAST(({expr}) AS DECIMAL({prec},{scale})))")


def dec_avg(col: Column, prec: int = 18, scale: int = 2) -> Column:
    """Mean from the exact decimal sum: identical doubles divided by
    identical counts on both engines (null-aware via count(col))."""
    return dec_to_double(F.sum(col.cast(f"decimal({prec},{scale})"))) / F.count(
        col
    ).cast("double")


def sql_dec_avg(expr: str, prec: int = 18, scale: int = 2) -> str:
    """The oracle-side spelling of ``dec_avg``."""
    return (
        f"{sql_dec_to_double(f'sum(CAST(({expr}) AS DECIMAL({prec},{scale})))')}"
        f" / CAST(count({expr}) AS DOUBLE)"
    )


# TPC-H discounted revenue Σ extprice·(1−disc): both factors live on
# 2-decimal grids, so the decimal product is an exact 4-decimal value and
# the sum merges exactly. ``{p}`` is the table alias prefix in SQL.
DISC_REV_SQL = (
    "CAST(CAST(sum(CAST({p}l_extendedprice AS DECIMAL(18,2))"
    " * CAST((1 - {p}l_discount) AS DECIMAL(4,2))) AS STRING) AS DOUBLE)"
)


def disc_rev_dec() -> Column:
    """Spark-side exact decimal Σ l_extendedprice·(1−l_discount) → DOUBLE."""
    return dec_to_double(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (1 - F.col("l_discount")).cast("decimal(4,2)")
        )
    )
