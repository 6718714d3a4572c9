"""Property-based tests (hypothesis) for the CDC fold — the exactly-once
argument is ASSOCIATIVITY: folding micro-batches in any grouping must give
the same state as one batch apply (streaming/apply.py docstring). Here
hypothesis searches for a counterexample instead of us picking chunkings."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mongodb_mysql_cdc_spark.streaming.apply import (
    cdc_apply_batch,
    merge_states,
    reconcile,
)

ENV_FIELDS = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
        T.StructField(
            "after",
            T.StructType(
                [
                    T.StructField("event_type", T.StringType()),
                    T.StructField("value", T.DoubleType()),
                    T.StructField("k", T.LongType()),
                ]
            ),
        ),
    ]
)

BASE_TS = datetime.datetime(2024, 1, 1)


@st.composite
def envelope_bags(draw):
    """A bag of 1-60 envelopes over a small key space with colliding
    timestamps (seq breaks ties), plus a chunking into 1-4 micro-batches.

    DELIVERY ORDER is drawn too (round 10): real change feeds arrive
    only roughly ordered, so the bag is optionally permuted BEFORE
    chunking — envelopes for one key may then reach the fold in
    descending ts, interleaved, or fully reversed. The (ts, seq) max_by
    fold is commutative/associative, so every assertion must hold for
    any arrival order, not just resume-token order."""
    n = draw(st.integers(1, 60))
    rows = []
    for seq in range(n):
        key = draw(st.integers(0, 7))
        op = draw(st.sampled_from(["c", "u", "d"]))
        # deliberately tiny ts domain → frequent ts collisions per key
        ts = BASE_TS + datetime.timedelta(seconds=draw(st.integers(0, 9)))
        value = draw(st.integers(-5, 5)) * 1.0
        rows.append((key, op, ts, seq, (op + str(key), value, seq % 3)))
    rows = draw(st.permutations(rows))
    n_chunks = draw(st.integers(1, 4))
    cuts = sorted(draw(st.lists(st.integers(0, n), min_size=n_chunks - 1,
                                max_size=n_chunks - 1)))
    chunks, lo = [], 0
    for c in cuts + [n]:
        chunks.append(rows[lo:c])
        lo = c
    return rows, [c for c in chunks if c]


def _collect_state(df):
    return sorted(
        (r.key, r.op, r.ts, r.seq, (r.after.event_type, r.after.value, r.after.k))
        for r in df.select("key", "op", "ts", "seq", "after").collect()
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(bag=envelope_bags())
def test_micro_batch_fold_equals_batch_apply(spark, bag):
    """reconcile(all) == fold(merge_states, reconcile(chunk_i)) for ANY
    chunking — the property that makes micro-batch replay invisible."""
    rows, chunks = bag
    whole = reconcile(spark.createDataFrame(rows, ENV_FIELDS))

    state = None
    for chunk in chunks:
        delta = reconcile(spark.createDataFrame(chunk, ENV_FIELDS))
        state = delta if state is None else merge_states(state, delta)

    assert _collect_state(whole) == _collect_state(state)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(bag=envelope_bags())
def test_apply_is_idempotent_under_replay(spark, bag):
    """Re-delivering any chunk (resume-token replay) must not change the
    final state: merge_states(final, reconcile(chunk)) == final."""
    rows, chunks = bag
    df = spark.createDataFrame(rows, ENV_FIELDS)
    final = reconcile(df)
    replayed = merge_states(final, reconcile(spark.createDataFrame(chunks[0], ENV_FIELDS)))
    assert _collect_state(final) == _collect_state(replayed)


def test_reconcile_single_struct_equals_four_aggregate_spelling(spark):
    """r14 differential pin: reconcile's one-max(struct(ts, seq, op,
    after)) spelling must pick the exact winner the r13 four-aggregate
    (max_by/max-of-struct) spelling picked — including on idempotent
    re-delivery (byte-identical duplicate (ts, seq) rows, the only tie
    the oplog contract allows) and on ts collisions broken by seq."""
    rows = [
        # key 1: ts collision, seq decides; duplicate delivery of winner
        (1, "c", BASE_TS, 1, ("c1", 1.0, 0)),
        (1, "u", BASE_TS, 3, ("u1", 2.0, 1)),
        (1, "u", BASE_TS, 3, ("u1", 2.0, 1)),  # replayed winner
        (1, "d", BASE_TS, 2, ("d1", 0.0, 2)),
        # key 2: later ts wins regardless of seq order
        (2, "u", BASE_TS + datetime.timedelta(seconds=5), 4, ("u2", 9.0, 0)),
        (2, "c", BASE_TS + datetime.timedelta(seconds=9), 0, ("c2", 7.0, 1)),
        # key 3: single tombstone
        (3, "d", BASE_TS, 9, ("d3", 0.0, 0)),
    ]
    df = spark.createDataFrame(rows, ENV_FIELDS)
    old = df.groupBy("key").agg(
        F.expr("max_by(op,  struct(ts, seq))").alias("op"),
        F.max(F.struct("ts", "seq")).getField("ts").alias("ts"),
        F.max(F.struct("ts", "seq")).getField("seq").alias("seq"),
        F.expr("max_by(after, struct(ts, seq))").alias("after"),
    )
    assert _collect_state(reconcile(df)) == _collect_state(old)


def test_tombstones_survive_reconcile_but_not_current_state(spark):
    """A delete must win over an older update AND stay in internal state
    (late older events cannot resurrect it), while the queryable view
    drops it."""
    rows = [
        (1, "c", BASE_TS, 1, ("sig", 1.0, 0)),
        (1, "d", BASE_TS + datetime.timedelta(seconds=5), 2, ("err", 0.0, 1)),
        (1, "u", BASE_TS + datetime.timedelta(seconds=3), 3, ("upd", 2.0, 2)),
    ]
    df = spark.createDataFrame(rows, ENV_FIELDS)
    state = reconcile(df)
    internal = _collect_state(state)
    assert len(internal) == 1 and internal[0][1] == "d"  # tombstone retained
    assert cdc_apply_batch(df).count() == 0  # queryable view: key is gone


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(
    vals=st.lists(
        st.floats(min_value=-1e12, max_value=1e12, allow_nan=False, width=64),
        min_size=1, max_size=40,
    ),
    n=st.integers(0, 6),
)
def test_hround_cross_engine_parity(spark, vals, n):
    """hround (the rounding used by 60+ oracles) must be BIT-identical
    between Spark and DuckDB for arbitrary doubles and scales — hypothesis
    hunts for a value where the floor-based spelling diverges (Spark's own
    round() does diverge, via Java BigDecimal)."""
    import duckdb

    from mongodb_mysql_cdc_spark.functions.compat import hround, sql_round

    con = duckdb.connect()
    sql = sql_round("x", n)
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql} FROM (SELECT unnest(CAST(? AS DOUBLE[])) AS x)", [vals]
        ).fetchall()
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.r for r in sdf.select(hround(F.col("x"), n).alias("r")).collect()]
    assert len(got) == len(duck)
    for g, d in zip(got, duck):
        assert g == d and str(g) == str(d), (g, d, n)


def test_chunk_overlap_covers_every_char(spark):
    """Every character position of every doc falls in ≥1 chunk, and
    consecutive chunks overlap by exactly 100 chars (stride 400 < width
    500) except the tail."""
    from pyspark.sql import functions as F

    from mongodb_mysql_cdc_spark.registry import queries

    chunks = queries()["doc_chunk_overlap"](spark, "/root/testdata/sf0.001")
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.max(F.col("chunk_start") + F.col("chunk_len") - 1).alias("covered"),
            F.min("chunk_start").alias("first_start"),
            F.max(F.col("chunk_start")).alias("last_start"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .collect()
    )
    docs = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", F.length("text").alias("n_chars"))
        .collect()
    }
    for r in agg:
        assert r.first_start == 1
        assert r.covered == docs[r.doc_id], (r.doc_id, r.covered, docs[r.doc_id])
        # stride math: starts are 1, 401, 801, ... → last start < n_chars + 400
        assert (r.last_start - 1) % 400 == 0
        assert r.n_chunks == (docs[r.doc_id] + 399) // 400


def test_merge_replicas_converges_to_single_feed_fold(spark):
    """Replica merge is delivery-invariant: the LWW fold of the two
    overlapping replicas must equal the fold of the clean single feed
    (same keys, same winning images)."""
    from pyspark.sql import functions as F

    from mongodb_mysql_cdc_spark.registry import queries

    sf = "/root/testdata/sf0.001"
    merged = (
        queries()["cdc_merge_replicas"](spark, sf)
        .select("key", "last_ts", "last_event_type", "last_value", "last_k")
    )
    single = queries()["cdc_apply_batch"](spark, sf)
    assert merged.exceptAll(single).count() == 0
    assert single.exceptAll(merged).count() == 0


def test_pagerank_mass_is_conserved(spark):
    """With every node having in- and out-edges, total rank mass stays
    (1-d) + d = 1 after each iteration (up to fp noise)."""
    from pyspark.sql import functions as F

    from mongodb_mysql_cdc_spark.registry import queries

    ranks = queries()["graph_pagerank_iter"](spark, "/root/testdata/sf0.001")
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6, total


def test_ewma_is_between_min_and_max_of_frame(spark):
    """A normalized weighted average can never leave the observed value
    envelope; spot-check the invariant corpus-wide."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from mongodb_mysql_cdc_spark.catalog import load
    from mongodb_mysql_cdc_spark.registry import queries

    sf = "/root/testdata/sf0.001"
    ew = queries()["ts_ewma"](spark, sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, Window.currentRow)
    )
    ev = load(spark, sf, "events").select(
        "user_id",
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    joined = ew.join(ev, ["user_id", "event_id"])
    bad = joined.where(
        (F.col("ewma") < F.col("lo") - 1e-6) | (F.col("ewma") > F.col("hi") + 1e-6)
    ).count()
    assert bad == 0


def test_scd2_intervals_partition_each_key_timeline(spark):
    """Per key, SCD2 version intervals must chain exactly: sorted by
    valid_from, each row's valid_to equals the next event's start (or the
    delete that closed it), intervals never overlap, and at most one row
    is open. Checked over every key at sf0.001."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from mongodb_mysql_cdc_spark.registry import queries

    hist = queries()["cdc_scd2"](spark, "/root/testdata/sf0.001")
    w = Window.partitionBy("key").orderBy("valid_from", "seq")
    chained = hist.select(
        "key",
        "valid_from",
        "valid_to",
        "is_current",
        F.lead("valid_from").over(w).alias("next_from"),
    )
    # closed intervals end at or before the next version's start (a delete
    # between them closes earlier); open intervals must be last
    bad_overlap = chained.where(
        F.col("valid_to").isNotNull() & F.col("next_from").isNotNull()
        & (F.col("valid_to") > F.col("next_from"))
    ).count()
    assert bad_overlap == 0
    open_not_last = chained.where(
        F.col("is_current") & F.col("next_from").isNotNull()
    ).count()
    assert open_not_last == 0
    multi_open = (
        hist.where("is_current").groupBy("key").count().where("count > 1").count()
    )
    assert multi_open == 0


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(bag=envelope_bags())
def test_fold_differential_vs_duckdb(spark, bag):
    """DIFFERENTIAL fuzzing: the LWW fold on hypothesis-generated
    envelope bags must match an independent DuckDB implementation
    (row_number over (ts DESC, seq DESC)) — the strict checker's
    cross-engine compare, but over adversarial generated data (colliding
    timestamps, delete-only keys, single-row bags) instead of the fixed
    harness tables."""
    import duckdb
    import pandas as pd

    rows, _ = bag
    df = spark.createDataFrame(rows, ENV_FIELDS)
    got = sorted(
        (r.key, r.ts, r.value)
        for r in cdc_apply_batch(df)
        .select("key", F.col("last_ts").alias("ts"), F.col("last_value").alias("value"))
        .collect()
    )
    flat = pd.DataFrame(
        [(k, op, ts, seq, a[1]) for (k, op, ts, seq, a) in rows],
        columns=["key", "op", "ts", "seq", "value"],
    )
    con = duckdb.connect()
    con.register("env", flat)
    want = sorted(
        (k, ts, v)
        for (k, ts, v) in con.sql(
            """
            SELECT key, ts, value FROM (
              SELECT *, row_number() OVER (PARTITION BY key
                                           ORDER BY ts DESC, seq DESC) AS rn
              FROM env
            ) WHERE rn = 1 AND op <> 'd'
            """
        ).fetchall()
    )
    assert got == want


# --- as-of join vs pandas merge_asof (operators/joins.py) -------------------

@st.composite
def asof_cases(draw):
    """Random left/right timelines over a small key space with frequent
    equal-ts collisions (the <= vs < boundary hypothesis hunts)."""
    n_l = draw(st.integers(1, 25))
    n_r = draw(st.integers(1, 25))
    left = [
        (draw(st.integers(0, 3)), draw(st.integers(0, 12)), i)
        for i in range(n_l)
    ]
    # right unique per (key, ts) — the operator's documented precondition
    pairs = draw(
        st.sets(
            st.tuples(st.integers(0, 3), st.integers(0, 12)),
            min_size=1, max_size=n_r,
        )
    )
    right = [(k, ts, 100 + j) for j, (k, ts) in enumerate(sorted(pairs))]
    inclusive = draw(st.booleans())
    return left, right, inclusive


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(case=asof_cases())
def test_asof_join_matches_pandas_merge_asof(spark, case):
    import pandas as pd

    from mongodb_mysql_cdc_spark.operators.joins import asof_join

    left_rows, right_rows, inclusive = case
    left = spark.createDataFrame(left_rows, "k long, lts long, lid long")
    right = spark.createDataFrame(right_rows, "k long, rts long, v long")
    got = sorted(
        (r.k, r.lts, r.lid, r.v)
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["v"], inclusive=inclusive,
        ).collect()
    )
    lp = pd.DataFrame(left_rows, columns=["k", "lts", "lid"]).sort_values("lts")
    rp = pd.DataFrame(right_rows, columns=["k", "rts", "v"]).sort_values("rts")
    mp = pd.merge_asof(
        lp, rp, left_on="lts", right_on="rts", by="k",
        direction="backward",
        allow_exact_matches=inclusive,
    )
    want = sorted(
        (int(r.k), int(r.lts), int(r.lid), None if pd.isna(r.v) else int(r.v))
        for r in mp.itertuples()
    )
    assert got == want


# --- registered as-of spellings under order-key ties (round 10) -------------
#
# The TIES fixture caught join_asof_forward's fused window spelling
# excluding equal-ts purchases from the click's frame. The data-shape
# gate pins that on one fixture; here hypothesis searches random
# tie-heavy feeds for any residual boundary divergence in BOTH fused
# spellings (backward join_asof, forward join_asof_forward) against
# pandas merge_asof over the same pre-aggregate tie-break the oracles
# use (backward: max event_id per (user, ts); forward: min).

@st.composite
def tie_heavy_feeds(draw):
    """1-40 events over 3 users x 7 timestamps — ties everywhere."""
    n = draw(st.integers(2, 40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # event_id (unique)
                draw(st.integers(0, 2)),  # user_id
                draw(st.integers(0, 6)),  # ts seconds — tiny domain
                draw(st.sampled_from(["click", "purchase", "view"])),
            )
        )
    return rows


def _asof_expected(rows, direction):
    """merge_asof over the pre-aggregated (user, ts) purchase table with
    the registered tie-break: backward keeps MAX purchase event_id per
    tied instant, forward keeps MIN."""
    import pandas as pd

    clicks = pd.DataFrame(
        [(i, u, ts) for i, u, ts, k in rows if k == "click"],
        columns=["event_id", "user_id", "ts"],
    ).sort_values(["ts", "event_id"], kind="mergesort")
    agg = "max" if direction == "backward" else "min"
    purchases = (
        pd.DataFrame(
            [(i, u, ts) for i, u, ts, k in rows if k == "purchase"],
            columns=["pid", "user_id", "ts"],
        )
        .groupby(["user_id", "ts"], as_index=False)
        .agg(pid=("pid", agg))
        .sort_values("ts", kind="mergesort")
    )
    if clicks.empty:
        return {}
    if purchases.empty:
        return {int(r.event_id): None for r in clicks.itertuples()}
    merged = pd.merge_asof(
        clicks,
        purchases,
        on="ts",
        by="user_id",
        direction=direction,
        allow_exact_matches=True,
    )
    import pandas as pd_

    return {
        int(r.event_id): None if pd_.isna(r.pid) else int(r.pid)
        for r in merged.itertuples()
    }


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=tie_heavy_feeds())
def test_registered_asof_spellings_match_merge_asof_under_ties(
    spark, rows, tmp_path_factory
):
    import pandas as pd

    from mongodb_mysql_cdc_spark.suite.joins import join_asof, join_asof_forward

    sf = str(tmp_path_factory.mktemp("asof_ties"))
    spark.createDataFrame(
        [
            (i, BASE_TS + datetime.timedelta(seconds=ts), u, k, 1.0, "{}")
            for i, u, ts, k in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    got_b = {
        int(r.event_id): None if r.purchase_event_id is None else int(r.purchase_event_id)
        for r in join_asof(spark, sf).collect()
    }
    assert got_b == _asof_expected(rows, "backward")

    got_f = {
        int(r.event_id): None if r.next_purchase_id is None or pd.isna(r.next_purchase_id)
        else int(r.next_purchase_id)
        for r in join_asof_forward(spark, sf).collect()
    }
    assert got_f == _asof_expected(rows, "forward")


# --- RFM monetary is a reorder-proof grid sum (round 10, PERMUTE catch) -----


def test_rfm_monetary_is_reorder_proof_grid_sum(spark, tmp_path_factory):
    """Two customers with the SAME price multiset laid out in OPPOSITE
    row orders must get bit-equal monetary totals — the PERMUTE-axis
    catch: a plain double sum gives the twins ulp-different totals
    depending on scan order (10^7 + many 0.03s is the classic case),
    un-tying them and flipping the quintile of whichever sits on a
    bucket boundary. The decimal-grid accumulator makes the ranking key
    a pure function of the multiset; the tie then resolves by custkey."""
    from mongodb_mysql_cdc_spark.suite.analytics import analytics_rfm

    sf = str(tmp_path_factory.mktemp("rfm"))
    prices = [10000000.01] + [0.03] * 7 + [123456.78, 0.01]
    rows = []
    for i, p in enumerate(prices):  # twin 1 forward, twin 2 reversed
        rows.append((100 + i, 1, "F", p, BASE_TS, "1-URGENT"))
    for i, p in enumerate(reversed(prices)):
        rows.append((200 + i, 2, "F", p, BASE_TS, "1-URGENT"))
    for k in range(3, 13):  # fillers so quintile boundaries exist
        rows.append((900 + k, k, "F", float(k * 1000), BASE_TS, "1-URGENT"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")

    out = analytics_rfm(spark, sf).toPandas().set_index("o_custkey")
    assert out.loc[1, "monetary"] == out.loc[2, "monetary"]
    assert out.loc[1, "m_score"] <= out.loc[2, "m_score"]


# --- scale-stable comparison contracts (suite/aggregates.py, round 8) -------


def test_product_contract_is_scale_stable_vs_duckdb(spark):
    """The round-8 sf1 sweep caught agg_product's old contract (round the
    raw product to 4 decimals) silently tightening with group size. The
    re-spelled contract — (mantissa, exponent) derived in log space +
    the raw log sum — must hold cross-engine at a magnitude (~1e28) far
    beyond where the old contract breaks (~1e16, float64's significand).
    Differential: Spark's log-space derivation vs DuckDB's NATIVE
    product(), the same cross-spelling pin the registered query makes."""
    import math

    import duckdb
    import pandas as pd

    from mongodb_mysql_cdc_spark.functions.compat import hround

    n = 3000
    rows = [("a" if i % 2 else "b", 1.0 + ((i * 37) % 10) / 100.0) for i in range(n)]
    df = spark.createDataFrame(rows, "g string, factor double")
    sum_ln = F.sum(F.log("factor"))
    log10p = sum_ln / math.log(10.0)
    expo = F.floor(log10p)
    got = {
        r["g"]: (r["m"], r["e"], r["l"])
        for r in df.groupBy("g")
        .agg(
            hround(F.pow(F.lit(10.0), log10p - expo), 6).alias("m"),
            expo.cast("long").alias("e"),
            hround(sum_ln, 6).alias("l"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "factor"]))
    want = {
        g: (m, e, l)
        for g, m, e, l in con.sql(
            "SELECT g,"
            " CAST(floor((product(factor) / pow(10.0, floor(log10(product(factor)))))"
            "   * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE),"
            " CAST(floor(log10(product(factor))) AS BIGINT),"
            " CAST(floor(sum(ln(factor)) * 1000000.0 + 0.5) / 1000000.0 AS DOUBLE)"
            " FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want
    # the magnitude really is beyond the old contract's breaking point
    assert all(e > 16 for (_, e, _) in got.values())


def test_decimal_total_is_exact_at_large_magnitude(spark):
    """agg_incremental_merge's running total: DECIMAL(18,2) partials merge
    exactly, and casting the exact decimal to DOUBLE at the end gives the
    bit-identical value on both engines regardless of summation order —
    unlike a double sum, whose order-dependent error grows with corpus
    size while a fixed-decimal rounding tolerance doesn't."""
    import duckdb
    import pandas as pd

    n = 50_000
    rows = [((i * 7919) % 49999 / 100.0 + 10_000_000.0,) for i in range(n)]
    df = spark.createDataFrame(rows, "v double")
    got = df.agg(
        F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("total")
    ).collect()[0]["total"]
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["v"]))
    want = con.sql(
        "SELECT CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) FROM t"
    ).fetchall()[0][0]
    assert got == want  # bit-identical, no tolerance


def test_via_string_double_cast_is_engine_agnostic_beyond_2pow53(spark):
    """Above 2^53 in the SCALED integer, the direct decimal→double cast is
    engine-specific: DuckDB computes (double)int128 / (double)10^scale —
    two roundings — while Java's BigDecimal.doubleValue is correctly
    rounded; the sf10x sweep caught them one ulp apart on
    pricing_summary's 6-decimal charge sum (…137.374750 → DuckDB
    …137.374752, Spark …137.37475). The via-string conversion
    (decimal→string is exact on both; string→double is strtod /
    Double.parseDouble, both correctly rounded) must agree bit-for-bit —
    pinned here on the exact value from that sweep, where the scaled
    integer 29791346137374750 > 2^53."""
    import duckdb

    val = "29791346137.374750"
    got = spark.sql(
        f"SELECT CAST(CAST(CAST('{val}' AS DECIMAL(38,6)) AS STRING) AS DOUBLE) AS v"
    ).collect()[0]["v"]
    con = duckdb.connect()
    want = con.sql(
        f"SELECT CAST(CAST(CAST('{val}' AS DECIMAL(38,6)) AS STRING) AS DOUBLE)"
    ).fetchall()[0][0]
    assert got == want == float(val)  # correctly rounded, all three agree
    # and the direct DuckDB cast really is the double-rounding outlier
    # this contract exists to dodge
    duck_direct = con.sql(
        f"SELECT CAST(CAST('{val}' AS DECIMAL(38,6)) AS DOUBLE)"
    ).fetchall()[0][0]
    assert duck_direct != float(val)


def test_grid_sum_matches_oracle_spelling_bit_for_bit(spark):
    """The grid accumulator (functions/compat.py grid notes): recover the
    fixed-point integer with pure double ops, sum exactly, divide once.
    Differential-pinned against the DuckDB spelling on adversarial grid
    values — negatives (floor(x+0.5) must stay exact below zero), values
    near the double→BigDecimal half-up/half-even divergence class (x.xx5
    neighbours), NULLs, and magnitudes that push the summed integer past
    2^31. No tolerance: the doubles must be bit-identical."""
    import duckdb
    import pandas as pd

    from mongodb_mysql_cdc_spark.functions.compat import grid_sum, sql_grid_sum

    vals = (
        [round((i * 7919) % 99999 / 100.0 - 300.0, 2) for i in range(20_000)]
        + [2.675, -2.675, 0.005, -0.005, 1e9 + 0.01, -1e9 - 0.01]
        + [None, None]
    )
    rows = [(i % 7, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        r["g"]: (r["s2"], r["s4"])
        for r in df.groupBy("g")
        .agg(
            grid_sum(F.col("v"), 2).alias("s2"),
            grid_sum(F.col("v") * (1 - F.lit(0.05)), 4).alias("s4"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]))
    want = {
        g: (s2, s4)
        for g, s2, s4 in con.sql(
            f"SELECT g, {sql_grid_sum('v', 2)}, "
            f"{sql_grid_sum('v * (1 - 0.05)', 4)} FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want  # bit-identical, no tolerance
    # and the on-grid recovery really is exact: a clean subtotal check
    sub = [v for i, v in enumerate(vals) if v is not None and i % 7 == 0]
    from decimal import Decimal

    exact = float(sum(Decimal(str(v)) for v in sub))
    assert got[0][0] == exact


def test_grid_moments_match_oracle_spelling_bit_for_bit(spark):
    """grid_var_samp / grid_stddev_samp / grid_corr (functions/compat.py
    grid second moments): exact decimal cross-sums, one agreed IEEE
    formula on both engines. Differential-pinned against the DuckDB
    spellings on adversarial 2-grid values — no tolerance."""
    import duckdb
    import pandas as pd

    from mongodb_mysql_cdc_spark.functions.compat import (
        grid_corr,
        grid_stddev_samp,
        grid_var_samp,
        sql_grid_corr,
        sql_grid_stddev_samp,
        sql_grid_var_samp,
    )

    vals = [round((i * 6007) % 49003 / 100.0, 2) for i in range(30_000)] + [
        2.675,
        0.005,
        490.02,
        0.01,
    ]
    rows = [(i % 5, v, (i * 13) % 151) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v double, u long")
    got = {
        r["g"]: (r["sd"], r["var"], r["c"])
        for r in df.groupBy("g")
        .agg(
            grid_stddev_samp(F.col("v")).alias("sd"),
            grid_var_samp(F.col("v")).alias("var"),
            grid_corr(F.col("v"), F.col("u")).alias("c"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v", "u"]))
    want = {
        g: (sd, var, c)
        for g, sd, var, c in con.sql(
            f"SELECT g, {sql_grid_stddev_samp('v')}, {sql_grid_var_samp('v')}, "
            f"{sql_grid_corr('v', 'u')} FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want  # bit-identical, no tolerance
    # sanity: within float tolerance of the reference statistics of the
    # GRID-SNAPPED values (the adversarial list includes off-grid
    # half-cent values like 2.675 precisely to pin that both engines
    # snap them identically; the contract is defined on the snapped grid)
    import math
    import statistics

    sub_v = [
        math.floor(v * 100.0 + 0.5) / 100.0
        for i, v in enumerate(vals)
        if i % 5 == 0
    ]
    sub_u = [(i * 13) % 151 for i in range(len(vals)) if i % 5 == 0]
    assert abs(got[0][1] - statistics.variance(sub_v)) < 1e-6
    mu_v = sum(sub_v) / len(sub_v)
    mu_u = sum(sub_u) / len(sub_u)
    cov = sum((a - mu_v) * (b - mu_u) for a, b in zip(sub_v, sub_u))
    den = (
        sum((a - mu_v) ** 2 for a in sub_v) * sum((b - mu_u) ** 2 for b in sub_u)
    ) ** 0.5
    assert abs(got[0][2] - cov / den) < 1e-9


def test_grid_var_clamp_near_constant_group(spark):
    """The Σc² − (Σc)²/n spelling is cancellation-prone: on a CONSTANT
    group of 2685 × 999.91 the raw formula yields −1.455e-10 (the
    (Σc)² product rounds above 2^53). Unclamped, grid_stddev_samp feeds
    that to sqrt — NaN in Spark but an OutOfRangeException (oracle
    CRASH) in DuckDB. Round-9 ADVICE fix: both spellings clamp with the
    same greatest(·, 0.0). Pin: var and sd come back exactly 0.0 on
    BOTH engines, no crash, still bit-identical."""
    import duckdb
    import pandas as pd

    from mongodb_mysql_cdc_spark.functions.compat import (
        grid_stddev_samp,
        grid_var_samp,
        sql_grid_stddev_samp,
        sql_grid_var_samp,
    )

    # sanity-pin the repro: the raw (unclamped) IEEE formula IS negative
    n, c = 2685, 99991
    s1, s2 = float(c * n), float(c * c * n)
    raw = (s2 - s1 * s1 / float(n)) / (n - 1.0) / 10000.0
    assert raw < 0

    rows = [(i % 2, 999.91) for i in range(2 * n)]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        r["g"]: (r["var"], r["sd"])
        for r in df.groupBy("g")
        .agg(
            grid_var_samp(F.col("v")).alias("var"),
            grid_stddev_samp(F.col("v")).alias("sd"),
        )
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]))
    want = {
        g: (var, sd)
        for g, var, sd in con.sql(
            f"SELECT g, {sql_grid_var_samp('v')}, {sql_grid_stddev_samp('v')} "
            "FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want == {0: (0.0, 0.0), 1: (0.0, 0.0)}


def test_grid_corr_non_integral_other_parity(spark):
    """grid_corr's ``other`` column goes through the same half-up grid
    recovery on both engines (round-9 ADVICE): a bare Spark
    cast("long") TRUNCATES toward zero (2.7→2) while DuckDB CAST(.. AS
    BIGINT) ROUNDS to nearest (2.7→3) — a silent cross-engine mismatch
    on any non-integral reuse. Pin bit-identity on fractional ``u``."""
    import duckdb
    import pandas as pd

    from mongodb_mysql_cdc_spark.functions.compat import grid_corr, sql_grid_corr

    rows = [
        (0, round((i * 37) % 997 / 100.0, 2), (i * 29) % 83 + 0.7)
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g int, v double, u double")
    got = (
        df.groupBy("g")
        .agg(grid_corr(F.col("v"), F.col("u")).alias("c"))
        .collect()[0]["c"]
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v", "u"]))
    want = con.sql(
        f"SELECT {sql_grid_corr('v', 'u')} FROM t GROUP BY g"
    ).fetchall()[0][0]
    assert got == want  # bit-identical, no tolerance
    assert got is not None and abs(got) <= 1.0


def test_grid_sum_spellings_pinned_byte_for_byte():
    """The driver's r09 evidence for sql_qualify hashes the EXACT oracle
    text; the round-10 shared-builder refactor (_sql_grid_sum_expr) must
    therefore be a no-op on the emitted SQL. Pin both derived strings
    byte-for-byte against the pre-refactor literals."""
    from mongodb_mysql_cdc_spark.functions.compat import (
        sql_dec_avg_over,
        sql_grid_sum,
    )

    assert sql_grid_sum("x") == (
        "CAST(CAST((sum(CAST(floor((x) * 100.0 + 0.5) AS DECIMAL(18,0))))"
        " AS STRING) AS DOUBLE) / 100.0"
    )
    assert sql_dec_avg_over("x", "g") == (
        "CAST(CAST((sum(CAST(floor((x) * 100.0 + 0.5) AS DECIMAL(18,0)))"
        " OVER (PARTITION BY g)) AS STRING) AS DOUBLE) / 100.0"
        " / CAST(count(x) OVER (PARTITION BY g) AS DOUBLE)"
    )


def test_sql_dec_avg_over_matches_aggregate_spelling(spark):
    """sql_dec_avg_over (the window-form exact grid average behind
    sql_qualify's QUALIFY oracle) must compute the identical value as
    the aggregate-form dec_avg/sql_dec_avg — the two spellings now
    derive from one compat.py builder (round-9 ADVICE) so they cannot
    drift. Differential-pin window-vs-aggregate on both engines."""
    import duckdb
    import pandas as pd

    from mongodb_mysql_cdc_spark.functions.compat import (
        dec_avg,
        sql_dec_avg,
        sql_dec_avg_over,
    )

    rows = [(i % 3, round((i * 6007) % 49003 / 100.0, 2)) for i in range(9001)]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        r["g"]: r["a"]
        for r in df.groupBy("g").agg(dec_avg(F.col("v")).alias("a")).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]))
    agg = dict(
        con.sql(f"SELECT g, {sql_dec_avg('v')} FROM t GROUP BY g").fetchall()
    )
    win = dict(
        con.sql(
            f"SELECT DISTINCT g, {sql_dec_avg_over('v', 'g')} FROM t"
        ).fetchall()
    )
    assert got == agg == win


def test_string_cast_literals_parse_bit_identical_cross_engine(spark):
    """r11 EXTREMES lesson, pinned: a pinned float constant must ship as
    CAST('<repr>' AS DOUBLE) — the STRING form. A bare decimal literal
    types as DECIMAL in both parsers, and DuckDB's decimal→double
    conversion DOUBLE-ROUNDS once the 17-digit mantissa exceeds 2^53
    (measured 1 ulp off on ts_ewma's weight-sum table), while
    string→double is correctly rounded in both engines. Assert every
    ts_ewma table entry round-trips bit-exactly to the Python double on
    BOTH engines, and that the unquoted DuckDB spelling is genuinely
    hazardous for at least one entry (the trap stays real)."""
    import duckdb
    import struct

    from mongodb_mysql_cdc_spark.suite import timeseries as ts

    py_w = [0.7**j for j in range(20)]
    py_den = [sum(0.7**j for j in range(m)) for m in range(1, 21)]

    def bits(x: float) -> int:
        return struct.unpack("<Q", struct.pack("<d", x))[0]

    con = duckdb.connect()
    for table, expected in ((ts._EWMA_W, py_w), (ts._EWMA_DEN, py_den)):
        for lit, py in zip(table, expected):
            duck = con.sql(f"SELECT {lit}").fetchone()[0]
            assert bits(duck) == bits(py), (lit, duck, py)
        sparkvals = spark.sql(
            "SELECT " + ", ".join(f"{lit} AS c{i}" for i, lit in enumerate(table))
        ).collect()[0]
        for i, py in enumerate(expected):
            assert bits(sparkvals[i]) == bits(py), (table[i], sparkvals[i], py)

    # the hazard is real: the UNQUOTED decimal spelling diverges in DuckDB
    hazardous = [x for x in py_den if bits(con.sql(f"SELECT CAST({x!r} AS DOUBLE)").fetchone()[0]) != bits(x)]
    assert hazardous, "unquoted decimal→double stopped double-rounding; re-evaluate the contract"


def test_sql_round_spark_executed_is_floorsafe_at_any_magnitude(spark):
    """r12 (ADVICE r11): sql_round's string EXECUTES IN SPARK SQL (the
    sql_* family — subqueries.py, modern_sql.py), where the old
    ``floor(double)`` spelling returned BIGINT and silently SATURATED
    past ±2^63 — the exact class the r11 EXTREMES axis caught inside
    hround. The r12 re-spell floors in the double domain via
    sql_floor_double (valid in both dialects). Pin, on a palette that
    spans the EXTREMES fixture bounds (±1e9 money grid) THROUGH the old
    saturation point (±2^63/10^n) to ±1e30:

      Spark-SQL-executed sql_round  ==  DuckDB-executed sql_round
                                    ==  Python _floor_double reference
                                    ==  hround (DataFrame API)

    all BIT-identical, and the old spelling's hazard stays real (Spark's
    floor(double) still saturates, so the re-spell keeps earning its
    place)."""
    import math
    import struct

    import duckdb

    from mongodb_mysql_cdc_spark.functions.compat import hround, sql_round

    def bits(x: float) -> int:
        return struct.unpack("<Q", struct.pack("<d", x))[0]

    palette = [
        0.0, -0.5, 2.5, -2.5, 2.675, -2.675, 123.456,
        1e9 - 0.005, -(1e9 - 0.005), 9.87654321e8,        # EXTREMES money bound
        2.0**52, -(2.0**52), 9.2233720368547758e18,        # around 2^63
        -9.2233720368547758e18, 1e19, -1e19,
        1.23456789e30, -1.23456789e30,                     # vector-palette scale
    ]

    def py_round(v: float, n: int) -> float:
        y = v * float(10**n) + 0.5
        t = y - math.fmod(y, 1.0)
        if y < 0 and math.fmod(y, 1.0) != 0.0:
            t -= 1.0
        return t / float(10**n)

    con = duckdb.connect()
    for n in (0, 2, 4, 6):
        exprs = [sql_round(f"CAST('{v!r}' AS DOUBLE)", n) for v in palette]
        sel = "SELECT " + ", ".join(f"{e} AS c{i}" for i, e in enumerate(exprs))
        srow = spark.sql(sel).collect()[0]
        drow = con.sql(sel).fetchone()
        sdf = spark.createDataFrame([(v,) for v in palette], "x double")
        hrow = [
            r.r
            for r in sdf.select(hround(F.col("x"), n).alias("r")).collect()
        ]
        for i, v in enumerate(palette):
            ref = py_round(v, n)
            assert bits(srow[i]) == bits(ref), ("spark-sql", v, n, srow[i], ref)
            assert bits(drow[i]) == bits(ref), ("duckdb", v, n, drow[i], ref)
            assert bits(hrow[i]) == bits(ref), ("hround", v, n, hrow[i], ref)

    # the hazard stays real: Spark SQL's floor(double) saturates at 2^63
    sat = spark.sql("SELECT floor(CAST('1e30' AS DOUBLE)) AS f").collect()[0][0]
    assert sat == (2**63) - 1, "Spark floor(double) stopped saturating; re-evaluate"
