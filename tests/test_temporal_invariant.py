"""Pin join_temporal_scd2's collapse invariant (round-9 ADVICE, medium).

The round-9 skew re-spell collapsed the point-in-time join to one window
pass, valid ONLY under a dataset-construction invariant: every click is an
op-'u' envelope of the same feed whose own SCD2 version covers itself. A
change to op_for_event_type (clicks → 'd'), to the closing rule, or a
fixture where clicks are not self-versioned silently breaks equivalence —
and the driver only notices when the query rotates into a window. These
tests make the invariant a standing gate:

1. differential — the REGISTERED collapsed spelling must equal an
   independently-spelled generic interval join on real fixture data, and
   state_seq must equal event_id on every row (the load-bearing claim);
2. adversarial — on a synthetic feed where a click is NOT its own covering
   version (op 'd'), the generic join and the collapse DIVERGE, proving
   the unchanged interval-join oracle would flag any such contract drift.

Bench-claims note: join_temporal_scd2's plan is a window pass, not a join —
join-strategy wall-clock comparisons must cite join_interval_bucketed (the
general-probe interval join) instead; BASELINE.md's round-10 section says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.functions.compat import hround
from mongodb_mysql_cdc_spark.registry import queries

SF = "/root/testdata/sf0.001"


def _generic_pit_join(env: DataFrame) -> DataFrame:
    """The oracle's interval-join semantics spelled independently in Spark:
    SCD2 versions (lead-closed, op-'d' rows dropped AFTER closing) probed
    by the click rows with the residual interval + boundary-seq rule. This
    is the plan the collapse replaced — quadratic per hot key, fine at
    sf0.001 — kept here precisely so the two spellings can be diffed."""
    w = Window.partitionBy("key").orderBy("ts", "seq")
    versions = (
        env.withColumn("valid_to", F.lead("ts").over(w))
        .filter(F.col("op") != "d")
        .select(
            F.col("key").alias("v_key"),
            F.col("ts").alias("valid_from"),
            F.col("seq").alias("v_seq"),
            F.col("after.value").alias("v_value"),
            "valid_to",
        )
    )
    clicks = env.filter(F.col("after.event_type") == "click").select(
        "key", F.col("seq").alias("event_id"), "ts"
    )
    return (
        clicks.join(
            versions,
            (F.col("key") == F.col("v_key"))
            & (F.col("valid_from") <= F.col("ts"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
            & ~(
                (F.col("valid_from") == F.col("ts"))
                & (F.col("v_seq") > F.col("event_id"))
            ),
        )
        .select(
            "key",
            "event_id",
            "ts",
            F.col("v_seq").alias("state_seq"),
            hround(F.col("v_value"), 4).alias("state_value"),
        )
    )


def test_collapse_equals_generic_interval_join(spark):
    from mongodb_mysql_cdc_spark.sources.cdc import events_as_envelopes

    got = sorted(
        queries()["join_temporal_scd2"](spark, SF).collect(),
        key=lambda r: (r.key, r.event_id),
    )
    want = sorted(
        _generic_pit_join(events_as_envelopes(spark, SF)).collect(),
        key=lambda r: (r.key, r.event_id),
    )
    assert len(got) > 0
    assert got == want
    # the invariant the collapse is built on, asserted row-by-row
    assert all(r.state_seq == r.event_id for r in got)


def test_oracle_flags_a_click_that_is_not_self_versioned(spark):
    """Adversarial feed: key 1 gets a 'u' envelope then a CLICK envelope
    mapped to op 'd' (the contract change ADVICE warns about). The generic
    interval join yields NOTHING for that click — its own version is
    dropped from the history and the prior version is lead-closed at the
    click's ts — while the collapse would still emit (state_seq = its own
    seq). The spellings must diverge, i.e. the unchanged oracle catches
    the drift instead of silently agreeing with the collapsed plan."""
    rows = [
        (1, "2024-01-01 00:00:01", 10, "u", 1.0, "signup"),
        (1, "2024-01-01 00:00:05", 11, "d", 2.0, "click"),
    ]
    env = (
        spark.createDataFrame(
            rows, "key long, ts string, seq long, op string, value double, et string"
        )
        .select(
            "key",
            F.col("ts").cast("timestamp").alias("ts"),
            "seq",
            "op",
            F.struct(
                F.col("value"), F.col("et").alias("event_type")
            ).alias("after"),
        )
    )
    generic = _generic_pit_join(env).collect()
    assert generic == []  # no version covers the de-versioned click
    # the collapsed spelling (copied from suite/joins.py's core expression,
    # applied to the adversarial feed) still claims self-coverage:
    w = Window.partitionBy("key").orderBy("ts", "seq")
    collapsed = (
        env.withColumn("_nxt_ts", F.lead("ts").over(w))
        .where(
            (F.col("after.event_type") == "click")
            & F.col("key").isNotNull()
            & (F.col("_nxt_ts").isNull() | (F.col("_nxt_ts") > F.col("ts")))
        )
        .select("key", F.col("seq").alias("state_seq"))
        .collect()
    )
    assert len(collapsed) == 1  # divergence: 1 row vs the oracle's 0
