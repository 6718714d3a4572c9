"""operators/ranking.py: distributed ntile must be bit-identical to the
single-partition window ntile it replaces (the round-5 plan-lint fix)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.operators.ranking import (
    distributed_ntile,
    with_global_position,
)


def _frame(spark, n, partitions=7):
    # adversarial value distribution: heavy ties (v), unique tiebreak (id)
    return (
        spark.range(n)
        .repartition(partitions)
        .select(F.col("id"), (F.col("id") % 13).alias("v"))
    )


def test_global_position_matches_row_number(spark):
    df = _frame(spark, 1000)
    got = {
        r["id"]: r["pos"]
        for r in with_global_position(df, ["v", "id"], "pos").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


def test_distributed_ntile_matches_window_ntile(spark):
    # sizes straddling bucket-remainder edge cases: n % k == 0, 1, k-1
    for n, k in [(1000, 5), (1001, 5), (999, 5), (7, 5), (3, 5), (16, 4)]:
        df = _frame(spark, n)
        got = {
            r["id"]: r["b"]
            for r in distributed_ntile(df, ["v", "id"], k, "b").collect()
        }
        want = {
            r["id"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want, (n, k)


def test_distributed_ntile_plan_has_no_global_window(spark):
    import re

    df = distributed_ntile(_frame(spark, 100), ["v", "id"], 5, "b")
    plan = df._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"\bWindow \[.*?\], \[(.*?)\](, \[.*?\])?$", plan, re.M):
        # every Window node must carry a partition spec (3 bracket groups)
        assert m.group(2) is not None, plan


def test_global_cumsum_matches_window_sum(spark):
    from mongodb_mysql_cdc_spark.operators.ranking import with_global_cumsum

    df = _frame(spark, 1000).withColumn("w", (F.col("id") % 7) + 1)
    got = {
        r["id"]: r["cum"]
        for r in with_global_cumsum(df, ["v", "id"], "w", "cum").collect()
    }
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == want


def test_global_cumsum_plan_has_no_global_window(spark):
    from mongodb_mysql_cdc_spark.operators.ranking import with_global_cumsum

    df = with_global_cumsum(_frame(spark, 100).withColumn("w", F.lit(1)), ["v", "id"], "w", "cum")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan must be partitioned (no SinglePartition window)
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "_gc_pid" in line, line


def test_ntile_expr_formula_exhaustive_small():
    """Pure-arithmetic check of the SQL-standard ntile bucketing for every
    (n, k) with n ≤ 24, k ≤ 8 — including k > n (one row per bucket) and
    r = 0 (even split). The reference is the definition itself: deal the
    first n%k buckets n//k+1 rows, the rest n//k."""
    import pyspark.sql.functions as F

    from mongodb_mysql_cdc_spark.operators.ranking import ntile_expr

    # evaluate the Column expression via a tiny local DataFrame per (n,k)
    from mongodb_mysql_cdc_spark.session import get_session

    spark = get_session("tests")
    cases = [(n, k) for n in range(1, 25) for k in range(1, 9)]
    rows = [(n, k, pos) for n, k in cases for pos in range(1, n + 1)]
    df = spark.createDataFrame(rows, "n long, k long, pos long")
    # ntile_expr takes a literal k; evaluate per distinct k
    got = {}
    for k in range(1, 9):
        part = df.filter(F.col("k") == k).withColumn(
            "b", ntile_expr(F.col("pos"), F.col("n"), k)
        )
        for r in part.collect():
            got[(r["n"], k, r["pos"])] = r["b"]
    for n, k in cases:
        q, r = divmod(n, k)
        expect_buckets = []
        for b in range(1, k + 1):
            size = q + 1 if b <= r else q
            expect_buckets += [b] * size
        for pos in range(1, n + 1):
            assert got[(n, k, pos)] == expect_buckets[pos - 1], (n, k, pos)


# --- round 7: per-group generalization --------------------------------------


def _grouped_frame(spark, n, n_groups=4, partitions=7):
    # groups of uneven size (g skewed by mod-square), ties in v, unique id
    return (
        spark.range(n)
        .repartition(partitions)
        .select(
            F.col("id"),
            ((F.col("id") * F.col("id")) % n_groups).alias("g"),
            (F.col("id") % 13).alias("v"),
        )
    )


def test_group_position_matches_partitioned_row_number(spark):
    from mongodb_mysql_cdc_spark.operators.ranking import with_group_position

    df = _grouped_frame(spark, 1000)
    got = {
        r["id"]: r["pos"]
        for r in with_group_position(df, ["g"], ["v", "id"], "pos").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("g").orderBy("v", "id")),
        ).collect()
    }
    assert got == want


def test_group_ntile_matches_partitioned_ntile(spark):
    for n, k in [(1000, 10), (37, 10), (4, 10)]:
        df = _grouped_frame(spark, n)
        got = {
            r["id"]: r["b"]
            for r in distributed_ntile(
                df, ["v", "id"], k, "b", group_cols=["g"]
            ).collect()
        }
        want = {
            r["id"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.partitionBy("g").orderBy("v", "id"))
            ).collect()
        }
        assert got == want, (n, k)


def test_group_cumsum_matches_partitioned_window_sum(spark):
    from mongodb_mysql_cdc_spark.operators.ranking import with_group_cumsum

    df = _grouped_frame(spark, 1000).withColumn("w", (F.col("id") % 7) + 1)
    got = {
        r["id"]: r["cum"]
        for r in with_group_cumsum(df, ["g"], ["v", "id"], "w", "cum").collect()
    }
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.partitionBy("g")
                .orderBy("v", "id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got == want


def test_group_machinery_windows_are_pid_partitioned(spark):
    """The scale contract itself: every Window the machinery plans must
    be partitioned by the physical partition id — corpus rows never
    funnel into one task per group key."""
    from mongodb_mysql_cdc_spark.operators.ranking import (
        with_group_cumsum,
        with_group_position,
    )

    df = _grouped_frame(spark, 100).withColumn("w", F.lit(1))
    for out in (
        with_group_position(df, ["g"], ["v", "id"], "pos"),
        with_group_cumsum(df, ["g"], ["v", "id"], "w", "cum"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line:
                assert "_gp_pid" in line or "_gc_pid" in line, line


def test_group_cumsum_rejects_null_values(spark):
    import pytest
    from py4j.protocol import Py4JJavaError

    from mongodb_mysql_cdc_spark.operators.ranking import with_group_cumsum

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("b", 3, 2.0)], "g string, id long, w double"
    )
    with pytest.raises(Exception) as ei:
        with_group_cumsum(df, ["g"], ["id"], "w", "cum").collect()
    assert "null" in str(ei.value)


def test_machinery_is_branch_consistent_at_sf01(spark):
    """Regression for the round-7 silent row-loss: the machinery's
    bucket id used to come from repartitionByRange + spark_partition_id,
    and the offsets branch could re-execute the exchange under a
    DIFFERENT AQE layout — the ids disagreed across branches and the
    offset join dropped whole groups at sf0.1 (agg_weighted_median lost
    l_returnflag='R'; every sf0.01 gate stayed green). The bucket id is
    now a pure expression over the row's values against literal
    boundaries, identical in every branch by construction. Pin the
    observed failure at the scale that exposed it."""
    from mongodb_mysql_cdc_spark.catalog import load
    from mongodb_mysql_cdc_spark.registry import queries

    sf = "/root/testdata/sf0.1"
    qs = queries()
    wm = qs["agg_weighted_median"](spark, sf)
    flags = sorted(r["l_returnflag"] for r in wm.collect())
    assert flags == ["A", "N", "R"]

    n_cust = (
        load(spark, sf, "customer")
        .join(
            load(spark, sf, "orders"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .count()
    )
    assert qs["win_rank_dense"](spark, sf).count() == n_cust


# --- hypothesis: machinery vs window reference on random frames -------------


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def ranked_frames(draw):
    """Random grouped frames with heavy order-key ties, negative values,
    uneven groups, and NULL group keys (round 8: PARTITION BY keeps a
    null group — the null-safe join-backs must too) — a unique id makes
    the order total (the machinery's precondition)."""
    n = draw(st.integers(2, 120))
    rows = []
    for i in range(n):
        g = draw(st.sampled_from(["a", "b", "c", None]))
        v = draw(st.integers(-5, 5))  # heavy ties
        w = draw(st.integers(1, 9))
        rows.append((g, v, i, w))
    return rows


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ranked_frames())
def test_machinery_matches_windows_on_random_frames(spark, rows):
    from mongodb_mysql_cdc_spark.operators.ranking import (
        with_group_cumsum,
        with_group_position,
    )

    df = spark.createDataFrame(rows, "g string, v long, id long, w long")
    got_pos = {
        r["id"]: r["pos"]
        for r in with_group_position(df, ["g"], ["v", "id"], "pos").collect()
    }
    want_pos = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("v", "id"))
        ).collect()
    }
    assert got_pos == want_pos
    got_cum = {
        r["id"]: r["cum"]
        for r in with_group_cumsum(df, ["g"], ["v", "id"], "w", "cum").collect()
    }
    from mongodb_mysql_cdc_spark.operators.ranking import (
        with_group_position_and_cumsum,
    )

    fused = {
        r["id"]: (r["pos"], r["cum"])
        for r in with_group_position_and_cumsum(
            df, ["g"], ["v", "id"], "w", "pos", "cum"
        ).collect()
    }
    want_cum = {
        r["id"]: r["cum"]
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.partitionBy("g")
                .orderBy("v", "id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).collect()
    }
    assert got_cum == want_cum
    assert {k: v[0] for k, v in fused.items()} == want_pos
    assert {k: v[1] for k, v in fused.items()} == want_cum


def test_machinery_handles_timestamp_order_keys(spark):
    """Boundary literals are built with F.lit(value).cast(keytype); the
    timestamp path (python datetime → TimestampType literal) is the one
    no registered query exercises yet — pin it before a future round
    relies on it."""
    import datetime

    from mongodb_mysql_cdc_spark.operators.ranking import with_group_position

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("g%d" % (i % 3), base + datetime.timedelta(seconds=(i * 37) % 500), i)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, id long")
    got = {
        r["id"]: r["pos"]
        for r in with_group_position(df, ["g"], ["ts", "id"], "pos").collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.partitionBy("g").orderBy("ts", "id"))
        ).collect()
    }
    assert got == want


def test_group_machinery_keeps_null_group_keys(spark):
    """Window PARTITION BY treats a NULL group key as a real partition;
    the machinery's join-backs must too (round-7 ADVICE medium: the old
    name-based equi-joins silently dropped null-group rows)."""
    from mongodb_mysql_cdc_spark.operators.ranking import (
        distributed_ntile,
        with_group_cumsum,
        with_group_position,
        with_group_position_and_cumsum,
    )

    df = (
        spark.range(600)
        .repartition(7)
        .select(
            F.col("id"),
            F.when(F.col("id") % 3 == 0, None)
            .otherwise((F.col("id") % 3).cast("string"))
            .alias("g"),
            ((F.col("id") * 37) % 101).alias("v"),
            (F.col("id") % 7 + 1).alias("w"),
        )
    )
    wpos = Window.partitionBy("g").orderBy("v", "id")
    wrun = wpos.rowsBetween(Window.unboundedPreceding, 0)

    got = {r["id"]: r["p"] for r in with_group_position(df, ["g"], ["v", "id"], "p").collect()}
    want = {r["id"]: r["p"] for r in df.withColumn("p", F.row_number().over(wpos)).collect()}
    assert len(got) == 600 and got == want

    got = {r["id"]: r["c"] for r in with_group_cumsum(df, ["g"], ["v", "id"], "w", "c").collect()}
    want = {r["id"]: r["c"] for r in df.withColumn("c", F.sum("w").over(wrun)).collect()}
    assert len(got) == 600 and got == want

    both = {
        r["id"]: (r["p"], r["c"])
        for r in with_group_position_and_cumsum(
            df, ["g"], ["v", "id"], "w", "p", "c"
        ).collect()
    }
    wantb = {
        r["id"]: (r["p"], r["c"])
        for r in df.withColumn("p", F.row_number().over(wpos))
        .withColumn("c", F.sum("w").over(wrun))
        .collect()
    }
    assert len(both) == 600 and both == wantb

    got = {r["id"]: r["b"] for r in distributed_ntile(df, ["v", "id"], 4, "b", ["g"]).collect()}
    want = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(4).over(wpos)).collect()
    }
    assert len(got) == 600 and got == want


def test_bucket_expr_bounded_at_cluster_partition_counts(spark):
    """Round-7 verdict item 3: at a real cluster's shuffle-partition
    count (4096) the bucket id must (a) cap its boundary count at
    _MAX_BUCKETS, (b) keep a constant-depth expression (two-level HOF
    scans over literal arrays, no O(n_buckets) nested when-chain), and
    (c) still match the window spelling bit-for-bit."""
    from mongodb_mysql_cdc_spark.operators import ranking as rk

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4096")
    try:
        df = (
            spark.range(30_000)
            .repartition(13)
            .select(F.col("id"), ((F.col("id") * 2654435761) % 30011).alias("v"))
        )
        assert rk._n_range_partitions(df) == rk._MAX_BUCKETS
        bounds = rk._boundary_tuples(df, ["v", "id"], rk._MAX_BUCKETS)
        assert 2 * rk._CHUNK < len(bounds) <= rk._MAX_BUCKETS - 1  # two-level path
        out = rk.with_global_position(df, ["v", "id"], "pos")
        # constant-depth: the analyzed plan tree must not nest per-boundary
        depth = out._jdf.queryExecution().analyzed().treeString().count("\n")
        assert depth < 200, depth
        got = {r["id"]: r["pos"] for r in out.collect()}
        want = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy("v", "id"))
            ).collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize(
    "aqe,parts",
    [("true", "3"), ("false", "3"), ("true", "64"), ("false", "64")],
)
def test_machinery_stable_under_config_matrix(spark, aqe, parts):
    """The round-7 silent-row-loss bug was CONFIG-dependent: AQE laid the
    two consuming plan branches out differently and the old pid-based
    bucket ids disagreed. The literal-boundary rework is branch-consistent
    by construction — pin that across the AQE × shuffle-partition matrix
    (including a partition count below the group count and one above the
    row count per partition), with NULL group keys in play."""
    from mongodb_mysql_cdc_spark.operators.ranking import (
        with_group_position_and_cumsum,
    )

    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", aqe)
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try:
        df = (
            spark.range(6000)
            .repartition(11)
            .select(
                F.col("id"),
                F.when(F.col("id") % 7 == 0, F.lit(None))
                .otherwise((F.col("id") % 5).cast("string"))
                .alias("g"),
                ((F.col("id") * 37) % 41).alias("v"),  # heavy ties
                (F.col("id") % 9 + 1).alias("w"),
            )
        )
        out = with_group_position_and_cumsum(
            df, ["g"], ["v", "id"], "w", "pos", "cum"
        )
        got = {r["id"]: (r["pos"], r["cum"]) for r in out.collect()}
        w = Window.partitionBy("g").orderBy("v", "id")
        want = {
            r["id"]: (r["rn"], r["cs"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .withColumn(
                "cs",
                F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .collect()
        }
        assert len(got) == 6000
        assert got == want
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_boundary_sample_is_bounded_on_hot_key(spark):
    """Round-7 ADVICE: the old mod-m sample collected EVERY duplicate of
    a hot key that hashed to 0 (heavy driver tail). The stratified
    min-hash sample is hard-bounded: one row per stratum, so a key with
    100k duplicates occupies exactly one slot."""
    from mongodb_mysql_cdc_spark.operators import ranking as rk

    hot = spark.range(100_000).select(F.lit(7).alias("v"), (F.col("id") % 50).alias("t"))
    bounds = rk._boundary_tuples(hot, ["v", "t"], 32)
    # 50 distinct (v, t) tuples → at most 49 interior cut points
    assert len(bounds) < 50


def test_null_safe_join_backs_still_broadcast_hash(spark):
    """The round-8 eqNullSafe join-backs must keep planning as
    BroadcastHashJoin (EqualNullSafe is a supported hash-join key) — a
    silent fall to BroadcastNestedLoopJoin would be O(rows × buckets)."""
    from mongodb_mysql_cdc_spark.operators.ranking import (
        distributed_ntile,
        with_group_position,
    )

    df = (
        spark.range(5000)
        .repartition(7)
        .select(
            F.col("id"),
            (F.col("id") % 5).cast("string").alias("g"),
            ((F.col("id") * 37) % 101).alias("v"),
        )
    )
    for out in (
        with_group_position(df, ["g"], ["v", "id"], "p"),
        distributed_ntile(df, ["v", "id"], 4, "b", ["g"]),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_order_key_determinism_gate(spark):
    """r11 (verdict item 3): the analytics_rfm PERMUTE-axis lesson —
    a ranking/bucketing order key must be bit-deterministic in the
    data — promoted from a docstring precondition to an enforced
    machinery gate. Raw float-aggregate keys (sum over doubles, any
    avg) are REJECTED; grid-summed, integer-aggregate, and raw per-row
    keys pass, and the passing spelling still runs end-to-end."""
    from mongodb_mysql_cdc_spark.functions.compat import grid_sum
    from mongodb_mysql_cdc_spark.operators.ranking import (
        assert_deterministic_order_keys,
        with_group_cumsum,
        with_group_position,
        with_group_position_and_cumsum,
    )

    base = spark.createDataFrame(
        [("a", 1, 1.25), ("a", 2, 2.5), ("b", 3, 3.75)],
        "g string, id long, amt double",
    )

    # the bug spelling: double sum — layout-dependent by an ulp
    raw = base.groupBy("g").agg(F.sum("amt").alias("m"))
    with pytest.raises(ValueError, match="raw float aggregate"):
        with_group_position(raw, [], ["m", "g"], "pos")
    with pytest.raises(ValueError, match="raw float aggregate"):
        with_group_cumsum(
            raw.withColumn("one", F.lit(1.0)), [], ["m", "g"], "one", "cum"
        )
    with pytest.raises(ValueError, match="raw float aggregate"):
        with_group_position_and_cumsum(
            raw.withColumn("one", F.lit(1.0)), [], ["m", "g"], "one", "p", "c"
        )

    # avg is float-typed whatever the input — equally layout-dependent
    avgd = base.groupBy("g").agg(F.avg("id").alias("m"))
    with pytest.raises(ValueError, match="raw float aggregate"):
        assert_deterministic_order_keys(avgd, ["m"])

    # the cures: grid accumulator, integer aggregate, raw per-row column
    grid = base.groupBy("g").agg(grid_sum(F.col("amt")).alias("m"))
    assert_deterministic_order_keys(grid, ["m"])
    ints = base.groupBy("g").agg(F.sum("id").alias("m"))
    assert_deterministic_order_keys(ints, ["m"])
    assert_deterministic_order_keys(base, ["amt", "id"])

    out = with_group_position(grid, [], ["m", "g"], "pos").collect()
    assert sorted(r["pos"] for r in out) == [1, 2]


def test_order_key_determinism_gate_lineage(spark):
    """r12 (ADVICE r11): the gate resolves the order column's ACTUAL
    exprId from the analyzed output, so a stale same-name alias in
    lineage no longer fail-closes a correct query, and a one-hop
    attribute-alias chase stops a rename from smuggling the
    analytics_rfm bug class back in."""
    from mongodb_mysql_cdc_spark.operators.ranking import (
        assert_deterministic_order_keys,
    )

    base = spark.createDataFrame(
        [("a", 1, 1.25), ("a", 2, 2.5), ("b", 3, 3.75)],
        "g string, id long, amt double",
    )

    # OVERWRITE pattern (the ADVICE-r11 medium repro): a raw float sum
    # later replaced with a grid-safe spelling via withColumn. The old
    # `sum(amt) AS m#old` is still in lineage, but the OUTPUT m is the
    # grid expression — the exprId-precise gate must accept it.
    raw = base.groupBy("g").agg(
        F.sum("amt").alias("m"), F.sum(F.lit(1)).alias("cnt")
    )
    overwritten = raw.withColumn(
        "m", F.col("m") * 0.0 + 1.0  # any deterministic re-definition
    )
    assert_deterministic_order_keys(overwritten, ["m"])

    # RENAME pattern (the ADVICE-r11 low bypass): withColumnRenamed
    # yields `total#1 AS m#2` — a bare attribute, one hop from the raw
    # float aggregate. The gate must chase the hop and reject.
    renamed = (
        base.groupBy("g")
        .agg(F.sum("amt").alias("total"))
        .withColumnRenamed("total", "m")
    )
    with pytest.raises(ValueError, match="raw float aggregate"):
        assert_deterministic_order_keys(renamed, ["m"])

    # WRAPPER blind spot — documented fail-open, pinned so the gap is
    # known: round(avg(x), 2) defines m as a `round` call, which the
    # lint cannot classify (wrapping does NOT make the key
    # deterministic; this is the gate's stated limitation, not a
    # guarantee of safety).
    wrapped = base.groupBy("g").agg(F.round(F.avg("amt"), 2).alias("m"))
    assert_deterministic_order_keys(wrapped, ["m"])  # passes BY DESIGN

    # Two-hop alias chains are beyond the single documented hop —
    # fail-open, pinned for the same reason.
    two_hops = (
        base.groupBy("g")
        .agg(F.sum("amt").alias("t0"))
        .withColumnRenamed("t0", "t1")
        .withColumnRenamed("t1", "m")
    )
    assert_deterministic_order_keys(two_hops, ["m"])  # passes BY DESIGN
