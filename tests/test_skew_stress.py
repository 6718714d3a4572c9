"""Skew stress for operators/skew.salted_equi_join at an engineered
100:1 hot key.

Three claims, each checked mechanically:
1. identity — the salted join equals the plain join row-for-row;
2. plan — the fact-side shuffle key INCLUDES the salt column (that is
   the whole mechanism: hashpartitioning on (key, salt) is what spreads
   the hot key across reducers);
3. distribution — with AQE's size-based coalescing parked, no output
   partition holds more than ~1/n_salts of the hot key's rows. A plain
   join necessarily lands every hot row in ONE partition.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.operators.skew import SALT_COL, salted_equi_join


@contextmanager
def _confs(spark, kv: dict):
    prev = {k: spark.conf.get(k, None) for k in kv}
    try:
        for k, v in kv.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _no_broadcast(spark):
    return _confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"})


@pytest.fixture()
def skewed(spark):
    # 100:1 skew: ~99% of fact rows carry key 0, remainder uniform over 1..100
    fact = spark.range(0, 200_000, 1, 16).select(
        F.when(F.col("id") % 101 <= 98, F.lit(0))
        .otherwise(F.col("id") % 101)
        .alias("k"),
        (F.col("id") * 7).alias("payload"),
    )
    dim = spark.range(0, 101).select(
        F.col("id").alias("dk"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    return fact, dim


def test_salted_join_equals_plain_join(spark, skewed):
    fact, dim = skewed
    got = salted_equi_join(fact, dim, "k", "dk", n_salts=8)
    want = fact.join(dim, fact.k == dim.dk)
    cols = ["k", "payload", "dk", "name"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_salted_left_join_keeps_unmatched_fact_rows_once(spark, skewed):
    """Left-join identity: fact rows with keys absent from the dim (here:
    a dim missing keys 50..100) must surface exactly once with null dim
    columns — the salted fact row matches at most the one replica
    carrying its salt, and an unmatched row is emitted by the left join
    itself, never duplicated per replica."""
    fact, dim = skewed
    part_dim = dim.filter(F.col("dk") < 50)
    got = salted_equi_join(fact, part_dim, "k", "dk", n_salts=8, how="left")
    want = fact.join(part_dim, fact.k == part_dim.dk, "left")
    cols = ["k", "payload", "dk", "name"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, want.select(*cols).collect())
    )


def test_salted_join_shuffles_on_key_and_salt(spark, skewed):
    """At test scale the 808-row dim auto-broadcasts and no shuffle
    exists at all — but salting exists precisely for the dim that CANNOT
    broadcast (that case has no AQE skew rescue for the fact exchange).
    Park auto-broadcast to expose the shuffled plan and pin its key."""
    fact, dim = skewed
    with _no_broadcast(spark):
        plan = (
            salted_equi_join(fact, dim, "k", "dk", n_salts=8)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "extended"
                )
            )
        )
    assert SALT_COL in plan
    # the exchange that places fact rows must hash on BOTH key and salt
    assert any(
        "hashpartitioning" in line and SALT_COL in line and "k#" in line
        for line in plan.splitlines()
    ), plan


def test_hot_key_spreads_across_partitions(spark, skewed):
    """The 100:1 hot key's rows must land in >1 reducer partition, with
    the largest holding ≲ 2/n_salts of them (xxhash64 spreads salts
    unevenly at small n, hence the slack). This is the assertion that
    caught the key-derived-salt bug (constant salt within a key = no
    spread at all). Auto-broadcast and AQE's small-partition coalescing
    are parked for the measurement — at test scale (a few MB) the dim
    would broadcast and AQE would legally merge ALL partitions into one,
    hiding the spread that matters at 100 TB."""
    fact, dim = skewed
    with _confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ):
        per_part = (
            salted_equi_join(fact, dim, "k", "dk", n_salts=8)
            .filter(F.col("k") == 0)
            .withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
    sizes = [r["count"] for r in per_part]
    hot_total = sum(sizes)
    assert len(sizes) > 1, "hot key still on a single reducer"
    assert max(sizes) <= hot_total * 2 / 8, (sorted(sizes), hot_total)


def test_salt_cols_parameter_surface(spark, skewed):
    """Round-7 advice fix: salt_cols picks which fact columns feed the
    salt hash. (a) MAP-typed columns are skipped by the default (hash on
    maps is disallowed by Spark — the full-column default used to fail
    analysis on such facts); (b) salting on the join key alone is
    rejected (constant within a hot key = no spread — the r6 bug class);
    (c) an explicit varied column still equals the plain join."""
    import pytest

    fact, dim = skewed
    # (a) a MAP column must not break the default salt derivation
    fact_m = fact.withColumn("m", F.create_map(F.lit("a"), F.col("payload")))
    got = salted_equi_join(fact_m, dim, "k", "dk", n_salts=4)
    want = fact_m.join(dim, fact_m.k == dim.dk)
    assert got.count() == want.count()
    # (b) join-key-only salt rejected
    with pytest.raises(ValueError, match="join key alone"):
        salted_equi_join(fact, dim, "k", "dk", salt_cols=["k"])
    # (c) explicit salt column preserves the plain-join identity
    got2 = salted_equi_join(fact, dim, "k", "dk", n_salts=8, salt_cols=["payload"])
    assert got2.count() == fact.join(dim, fact.k == dim.dk).count()


def test_salt_cols_nested_map_and_degenerate_inputs(spark, skewed):
    """Round-7 ADVICE: (a) a map NESTED in a struct or array must also be
    excluded from the default salt hash (xxhash64 rejects maps at any
    depth at plan time); (b) [key, key] must not disguise a key-only
    salt (dedupe-then-check)."""
    import pytest

    fact, dim = skewed
    nested = fact.withColumn(
        "s", F.struct(F.create_map(F.lit("a"), F.col("payload")).alias("m"))
    ).withColumn("am", F.array(F.create_map(F.lit("b"), F.lit(1))))
    got = salted_equi_join(nested, dim, "k", "dk", n_salts=4)
    assert got.count() == nested.join(dim, nested.k == dim.dk).count()
    with pytest.raises(ValueError, match="join key alone"):
        salted_equi_join(fact, dim, "k", "dk", salt_cols=["k", "k"])
