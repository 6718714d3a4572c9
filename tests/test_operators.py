"""Direct operator-level tests for operators/ primitives whose suite
queries use specialized (fused) forms — the generic composition must stay
correct on its own."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import load
from mongodb_mysql_cdc_spark.operators.joins import asof_join


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive_hand_case(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lts=_t("2024-01-01T10:00:00"), tag="a"),  # before any right
            Row(k=1, lts=_t("2024-01-01T12:00:00"), tag="b"),  # exact tie
            Row(k=1, lts=_t("2024-01-01T15:00:00"), tag="c"),  # after both
            Row(k=2, lts=_t("2024-01-01T12:00:00"), tag="d"),  # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_t("2024-01-01T12:00:00"), v=10.0),
            Row(k=1, rts=_t("2024-01-01T14:00:00"), v=20.0),
            Row(k=2, rts=_t("2024-01-01T13:00:00"), v=30.0),
        ]
    )
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", value_cols=["v"])
    got = {r["tag"]: r["v"] for r in out.collect()}
    # inclusive: the 12:00 left row takes the 12:00 right row
    assert got == {"a": None, "b": 10.0, "c": 20.0, "d": None}

    out_ex = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["v"], inclusive=False,
    )
    got_ex = {r["tag"]: r["v"] for r in out_ex.collect()}
    # exclusive: the 12:00 left row no longer sees the 12:00 right row
    assert got_ex == {"a": None, "b": None, "c": 20.0, "d": None}


def test_asof_join_matches_fused_suite_query(spark, sf_dir):
    """The generic union+window composition and the fused single-scan form
    used by suite join_asof must agree on real data."""
    from mongodb_mysql_cdc_spark.suite.joins import join_asof

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.expr("max_by(event_id, event_id)").alias("purchase_event_id"))
    )
    generic = asof_join(
        clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["purchase_event_id"],
    ).select("user_id", "event_id", "purchase_event_id")
    fused = join_asof(spark, sf_dir)
    cols = ["user_id", "event_id", "purchase_event_id"]
    rows = lambda df: sorted(tuple(r[c] for c in cols) for r in df.collect())
    assert rows(generic) == rows(fused)
