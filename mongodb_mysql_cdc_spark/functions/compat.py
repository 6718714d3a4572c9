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
