"""Join operators Spark lacks natively, composed from DataFrame algebra.

``asof_join`` is the CDC temporal-alignment primitive ("latest right-side
row at-or-before each left row"). A naive range join explodes |L|·|R|
pairs per key; ``pd.merge_asof`` per group drags data through Python.
This implementation is the union+window composition:

    union(left, right) → window(partitionBy keys, orderBy ts)
    → last(right_value, ignorenulls=True) → filter left rows

Cost at any scale: ONE hash shuffle on the key + per-partition sort —
the same cost as a sort-merge join, with no pair explosion and no Python.
Watch-list item from SURVEY.md §7 (partition-boundary correctness): the
window partitions by the join key, so key boundaries can never split a
timeline across tasks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (backward as-of; '<' if inclusive=False),
    matching on the equi-key ``on``. Right side must be unique per
    (key, ts) — pre-aggregate it if not, or results are nondeterministic.

    Returns all left columns plus ``value_cols`` (null when no match).
    """
    on = list(on)
    value_cols = list(value_cols)

    # Tag sides; at equal ts the right row sorts before (inclusive) or
    # after (exclusive) the left row, which realizes <= vs < exactly.
    r_side, l_side = (0, 1) if inclusive else (1, 0)
    left_cols = left.columns

    l = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(l_side).alias("_side"),
        F.col(left_ts).alias("_ats"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c) for c in left_cols],
        F.lit(r_side).alias("_side"),
        F.col(right_ts).alias("_ats"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l.unionByName(r)
    filled = unioned.select(
        *left_cols,
        F.col("_side"),
        *[F.last(f"_v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col("_side") == l_side).drop("_side")
