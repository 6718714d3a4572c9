"""Exact interpolated percentiles with bounded aggregation state.

Spark's exact ``percentile``/``median`` aggregate buffers EVERY group
member in its state — an event-type or hot-table-hour group grows with
the corpus, so the buffer is unbounded memory at 100 TB. But exactness
does not require buffering rows: a percentile is a functional of the
value HISTOGRAM, and when the value domain is discrete (2-decimal
measurements, integer lags, prices in cents — every numeric column in
FIXTURES.md), the distinct-value histogram is both EXACT and bounded by
the domain, not the corpus:

1. ``groupBy(group, value).count()`` — map-side-combined, skew-immune
   (a hot value pre-aggregates inside each task before the shuffle);
2. cumulative counts over the histogram — the window input per group is
   |distinct values in the group| ≤ |value domain|, a constant w.r.t.
   corpus size (the cdc_replication_lag bound, generalized);
3. inverse-CDF with linear interpolation read off the cumulative counts:
   with n values sorted ascending and r = (n-1)·q, the continuous
   percentile interpolates between v[⌊r⌋] and v[⌈r⌉], where v[k]
   (0-based) = the smallest value whose cumulative count ≥ k+1.

The interpolation reproduces Spark's ``Percentile.getPercentile``
BIT-FOR-BIT: (⌈r⌉−r)·v[⌊r⌋] + (r−⌊r⌋)·v[⌈r⌉], with v[⌊r⌋] returned
directly when ⌊r⌋ = ⌈r⌉ (the weighted-average lerp — NOT the
algebraically-equal-but-float-different lo + frac·(hi−lo);
tests/test_percentile.py's hypothesis sweep found the one-ulp splits).
The ⌊r⌋/⌈r⌉ ranks come from the same IEEE product (n-1)·q both engines
compute, so the selected order statistics — integer rank comparisons
from there on — cannot disagree; values are carried through as grouping
keys, never re-derived.

Nulls are excluded (SQL aggregate semantics); a group whose values are
all null is absent from the output — callers left-join if they need the
group row with a NULL percentile.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    val: str,
    qs: Mapping[str, float],
) -> DataFrame:
    """One row per group with column ``name`` = percentile(val, q) for
    each (name, q) in ``qs`` — exact continuous (interpolated)
    percentile, computed with per-group state bounded by |distinct
    values|, not group size. ``group_cols=[]`` gives one global row."""
    gcols = list(group_cols)
    hist = (
        df.where(F.col(val).isNotNull())
        .groupBy(*gcols, val)
        .agg(F.count(F.lit(1)).alias("_q_c"))
    )
    w_cdf = (
        Window.partitionBy(*gcols)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*gcols)
    cum = hist.select(
        *gcols,
        F.col(val),
        F.sum("_q_c").over(w_cdf).alias("_q_cum"),
        F.sum("_q_c").over(w_tot).alias("_q_n"),
    )
    aggs = [F.max("_q_n").alias("_q_n")]
    for name, q in qs.items():
        r = (F.col("_q_n") - 1).cast("double") * F.lit(float(q))
        lo_rank = F.floor(r).cast("long")
        hi_rank = F.ceil(r).cast("long")
        aggs.append(
            F.min(F.when(F.col("_q_cum") >= lo_rank + 1, F.col(val))).alias(
                f"_q_lo_{name}"
            )
        )
        aggs.append(
            F.min(F.when(F.col("_q_cum") >= hi_rank + 1, F.col(val))).alias(
                f"_q_hi_{name}"
            )
        )
    per_group = cum.groupBy(*gcols).agg(*aggs)
    outs = list(gcols)
    for name, q in qs.items():
        r = (F.col("_q_n") - 1).cast("double") * F.lit(float(q))
        lo, hi = F.col(f"_q_lo_{name}"), F.col(f"_q_hi_{name}")
        lerp = (F.ceil(r) - r) * lo + (r - F.floor(r)) * hi
        outs.append(
            F.when(F.floor(r) == F.ceil(r), lo).otherwise(lerp).alias(name)
        )
    return per_group.select(*outs)


def group_quantiles_disc(
    df: DataFrame,
    group_cols: Sequence[str],
    val: str,
    qs: Mapping[str, float],
) -> DataFrame:
    """Discrete (non-interpolating) percentiles with the same bounded
    histogram state: SQL-standard percentile_disc(q) = the smallest
    group element whose cume_dist ≥ q, i.e. the smallest histogram value
    with cum ≥ q·n — both Spark's PercentileDisc and DuckDB's
    quantile_disc implement exactly this rule (probed on even-n edge
    splits), and since the result is an actual element, it is
    hash-identical across engines with no rounding guard."""
    gcols = list(group_cols)
    hist = (
        df.where(F.col(val).isNotNull())
        .groupBy(*gcols, val)
        .agg(F.count(F.lit(1)).alias("_q_c"))
    )
    w_cdf = (
        Window.partitionBy(*gcols)
        .orderBy(val)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(*gcols)
    cum = hist.select(
        *gcols,
        F.col(val),
        F.sum("_q_c").over(w_cdf).alias("_q_cum"),
        F.sum("_q_c").over(w_tot).alias("_q_n"),
    )
    aggs = []
    for name, q in qs.items():
        thresh = F.col("_q_n").cast("double") * F.lit(float(q))
        aggs.append(
            F.min(
                F.when(F.col("_q_cum").cast("double") >= thresh, F.col(val))
            ).alias(name)
        )
    return cum.groupBy(*gcols).agg(*aggs)
