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


# --- grid accumulation: exactness at (near) double-sum speed ----------------
#
# The first exact-decimal spelling cast the DOUBLE column to decimal and
# summed wide decimals. Correct, but 2.6× slower on aggregate-dense queries:
# Spark's double→decimal cast routes through BigDecimal.valueOf (a
# Double.toString parse per row) and the wide-precision products leave the
# long-compact Decimal fast path. The grid spelling recovers the column's
# fixed-point integer with PURE DOUBLE arithmetic, casts long (cheap), and
# sums decimal(18,0) (long-compact adds; 28-digit exact merge). Measured on
# pricing_summary's three money sums at sf0.1: double 0.21 s / grid-decimal
# 0.34 s / cast-decimal 0.62 s — exactness at ~1.5× instead of ~3×.
#
# Exactness precondition (every call site's column satisfies it, FIXTURES.md):
# the value is on the 10^-k grid and |value|·10^k < 2^52. Then
# fl(fl(x)·10^k + 0.5) sits within ~n·2^-51 ≪ 0.5 of the true integer n and
# FLOOR recovers n exactly — for either sign (floor is monotone; the error
# band never crosses the half-way line). Products of grid columns stay on
# the product grid (2-grid × 2-grid = 4-grid) and the same bound applies to
# the computed double product (k accumulates; rel-err stays a few ulp).
#
# Cross-engine: Spark sums decimal(18,0) (exact 28-digit result); DuckDB
# sums BIGINT into HUGEINT (exact int128). Identical integers → identical
# strings → identical correctly-rounded doubles → identical final division
# by 10^k on both engines (one IEEE op on identical inputs). This holds at
# ANY magnitude — above 2^53 the via-string double is still bit-identical
# on both sides (both compute fl(fl(S)/10^k)), which is all the comparison
# contract needs. DuckDB-side FLOOR output is integral, so its
# round-to-nearest double→BIGINT cast agrees with Spark's truncating cast.


def grid_sum(expr: Column, k: int = 2) -> Column:
    """Exact sum of a 10^-k-grid double (see grid-accumulation notes) → DOUBLE."""
    cents = F.floor(expr * float(10**k) + 0.5).cast("long").cast("decimal(18,0)")
    return dec_to_double(F.sum(cents)) / float(10**k)


def sql_grid_sum(expr: str, k: int = 2) -> str:
    """The SQL spelling of ``grid_sum``. Valid AND exact in both dialects —
    some query texts execute in Spark SQL too (sql_parameterized /
    sql_pipe_syntax), where sum(BIGINT) would wrap on overflow at scale;
    summing DECIMAL(18,0) is exact in Spark (→ decimal(28,0)) and DuckDB
    (→ wider decimal), and the cast of the integral floor() output is
    exact in both."""
    s = float(10**k)
    inner = f"sum(CAST(floor(({expr}) * {s} + 0.5) AS DECIMAL(18,0)))"
    return f"{sql_dec_to_double(inner)} / {s}"


def dec_sum(col: Column, prec: int = 18, scale: int = 2) -> Column:
    """Exact sum of a fixed-point-grid double → DOUBLE (grid accumulator).

    ``prec`` is kept for API stability; the grid spelling only needs the
    scale. Callers' oracles use ``sql_dec_sum`` so both sides move in
    lockstep."""
    del prec
    return grid_sum(col, scale)


def sql_dec_sum(expr: str, prec: int = 18, scale: int = 2) -> str:
    """The oracle-side spelling of ``dec_sum`` (valid in both SQL dialects)."""
    del prec
    return sql_grid_sum(expr, scale)


def dec_avg(col: Column, prec: int = 18, scale: int = 2) -> Column:
    """Mean from the exact grid sum: identical doubles divided by identical
    counts on both engines (null-aware via count(col))."""
    del prec
    return grid_sum(col, scale) / F.count(col).cast("double")


def sql_dec_avg(expr: str, prec: int = 18, scale: int = 2) -> str:
    """The oracle-side spelling of ``dec_avg``."""
    del prec
    return f"({sql_grid_sum(expr, scale)}) / CAST(count({expr}) AS DOUBLE)"


# TPC-H discounted revenue Σ extprice·(1−disc): both factors live on
# 2-decimal grids, so the product is an exact 4-decimal grid value and the
# grid accumulator sums it exactly. ``{p}`` is the table alias prefix in SQL.
DISC_REV_SQL = (
    "CAST(CAST(sum(CAST(floor(({p}l_extendedprice * (1 - {p}l_discount))"
    " * 10000.0 + 0.5) AS DECIMAL(18,0))) AS STRING) AS DOUBLE) / 10000.0"
)


def disc_rev_dec() -> Column:
    """Spark-side exact Σ l_extendedprice·(1−l_discount) → DOUBLE."""
    return grid_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
