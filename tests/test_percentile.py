"""Property tests for operators/percentile.py — the distinct-value
histogram percentile kernel that replaced Spark's unbounded-state exact
``percentile`` in agg_stats / quality_winsorize / anomaly_mad (round 7).

The claim under test is strong: the kernel is EXACT, not approximate —
for any multiset it must reproduce numpy's linear-interpolation
percentile (the same definition as Spark ``percentile`` and DuckDB
``quantile_cont``) to float equality, including n=1 groups, all-equal
values, heavy ties, and null exclusion. Hypothesis hunts the
counterexample instead of us picking value sets.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.operators.percentile import group_quantiles

QS = {"p05": 0.05, "p50": 0.5, "p95": 0.95}


def _numpy_expected(vals: list[float], q: float) -> float:
    return float(np.percentile(np.array(vals, dtype="float64"), q * 100.0,
                               method="linear"))


@st.composite
def grouped_values(draw):
    """2-3 groups, each 1-40 values on a 2-decimal grid (the FIXTURES.md
    value domain shape), with deliberate tie mass."""
    groups = {}
    for g in range(draw(st.integers(2, 3))):
        n = draw(st.integers(1, 40))
        # small grid => many exact ties, the histogram's interesting case
        cents = draw(
            st.lists(st.integers(-500, 500), min_size=n, max_size=n)
        )
        groups[f"g{g}"] = [c / 100.0 for c in cents]
    return groups


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(grouped_values())
def test_kernel_matches_exact_percentile(spark, groups):
    """BIT-EXACT against Spark's own ``percentile`` aggregate — the
    definition the kernel replaces (same lo + frac·(hi−lo) lerp as
    DuckDB quantile_cont). numpy is cross-checked at 1e-12: its _lerp
    flips to b − (b−a)·(1−t) for t ≥ 0.5 (better rounding, different
    last ulp), so float equality against numpy is NOT the contract."""
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r.asDict()
        for r in group_quantiles(df, ["g"], "v", QS).collect()
    }
    want = {
        r["g"]: r.asDict()
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(f"percentile(v, {q})").alias(name)
                for name, q in QS.items()
            ]
        )
        .collect()
    }
    assert set(got) == set(groups)
    for g, vals in groups.items():
        for name, q in QS.items():
            assert got[g][name] == want[g][name], (
                g, name, sorted(vals), got[g][name], want[g][name]
            )
            exp = _numpy_expected(vals, q)
            assert math.isclose(got[g][name], exp, rel_tol=1e-12, abs_tol=1e-12), (
                g, name, sorted(vals), got[g][name], exp
            )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(grouped_values())
def test_disc_kernel_matches_percentile_disc(spark, groups):
    """group_quantiles_disc must be BIT-EXACT against Spark's own
    percentile_disc WITHIN GROUP — the smallest-element-with-
    cume_dist ≥ q rule (no interpolation, so no lerp subtleties; the
    selected value is an actual group element)."""
    from mongodb_mysql_cdc_spark.operators.percentile import group_quantiles_disc

    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r["g"]: r.asDict()
        for r in group_quantiles_disc(df, ["g"], "v", QS).collect()
    }
    want = {
        r["g"]: r.asDict()
        for r in df.groupBy("g")
        .agg(
            *[
                F.expr(
                    f"percentile_disc({q}) WITHIN GROUP (ORDER BY v)"
                ).alias(name)
                for name, q in QS.items()
            ]
        )
        .collect()
    }
    for g in groups:
        for name in QS:
            assert got[g][name] == want[g][name], (
                g, name, sorted(groups[g]), got[g][name], want[g][name]
            )


def test_kernel_edge_cases(spark):
    df = spark.createDataFrame(
        [
            ("single", 7.25),
            ("equal", 3.0), ("equal", 3.0), ("equal", 3.0),
            ("withnull", 1.0), ("withnull", None), ("withnull", 2.0),
            ("allnull", None),
        ],
        "g string, v double",
    )
    got = {r["g"]: r.asDict() for r in group_quantiles(df, ["g"], "v", QS).collect()}
    assert got["single"] == {"g": "single", "p05": 7.25, "p50": 7.25, "p95": 7.25}
    assert got["equal"]["p50"] == 3.0 and got["equal"]["p95"] == 3.0
    # nulls excluded: median of {1, 2} interpolates, n=2 not 3
    assert got["withnull"]["p50"] == 1.5
    # an all-null group is absent (SQL aggregate semantics: callers
    # left-join if they need the row)
    assert "allnull" not in got


def test_kernel_matches_spark_exact_percentile_on_events(spark, sf_dir):
    """End-to-end cross-check on the real table the rewrites run on:
    kernel == Spark's own exact percentile for every event_type."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: (r["p05"], r["p50"], r["p95"])
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.05)").alias("p05"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    got = {
        r["event_type"]: (r["p05"], r["p50"], r["p95"])
        for r in group_quantiles(ev, ["event_type"], "value", QS).collect()
    }
    assert got == exact


def test_kernel_aggregation_state_is_bounded(spark):
    """The physical plan must contain NO exact percentile aggregate —
    the whole point of the kernel — and its windows must run over the
    histogram (partitioned by the group key), never a global spec."""
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    plan = (
        group_quantiles(df, ["g"], "v", {"p50": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "percentile(" not in plan
    assert "median(" not in plan
