"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as
(name → query callable) plus, when DuckDB can express the same semantics,
(name → oracle SQL). ``__spark_entry__.py`` re-exports these verbatim.

Rules enforced by convention (SURVEY.md §5):
- alias every computed column identically in the Spark query and oracle SQL;
- round floating aggregates identically on both sides (summation order
  differs across engines);
- deterministic top-k: break ties with a unique key;
- no nondeterministic functions in checked queries.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserve that for genuinely non-SQL-expressible ops (stateful streaming,
    approx sketches, arbitrary-Python UDF surfaces).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver verifies the FIRST 50 names in queries() order per round
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  Round 11
# rotation (r10 verdict item 1): the registry is frozen at 279 and
# `coverage_report.py --stale` is 0, so the window is pure evidence
# freshness — the oldest-evidence backlog, exactly as the r10 rotation
# plan precomputed.  Contents: multimodal_meta (the ONE r02-evidence
# query — it ceded its r10 slot to the analytics_rfm permute fix and
# the verdict requires it to lead), the ENTIRE remaining r03 shelf
# (31 names), the two RESERVED machinery re-verify slots
# (win_rank_dense, dataset_curriculum — r08 evidence on the r08
# localCheckpointed ranking machinery; analytics_rfm already re-proved
# in r10), and the 16 lowest-registry-position r04 names.  After a
# green r11 run no query's evidence is older than r04.  Evicted: the
# entire r10 window (all 50 green in CORRECTNESS_r10, code unchanged
# since).  Cheap relational/scalar families first, expensive
# streaming/LLM queries LAST so a time-capped driver run can't starve
# the cheap ones (the ordering trick from r2-r10).
_DRIVER_WINDOW = [
    # -- scalar function families (r03/r04 evidence; cheapest first) --
    "fn_bitwise", "fn_regex", "fn_string2", "fn_trig", "fn_url",
    "fn_array2", "fn_map2",
    # -- aggregate families (r03/r04) --
    "agg_boolean", "agg_histogram", "agg_percentile_exact",
    "agg_regression",
    # -- reshape (r03) --
    "pivot_wide", "unpivot_long",
    # -- window family (r03/r04) + RESERVED machinery re-verify:
    #    win_rank_dense exercises the r08 localCheckpointed distributed
    #    rank machinery whose last driver evidence predates the r10
    #    hof_recompute boundary-lambda fix in operators/ranking.py.
    "win_nth_value", "win_rank_dense", "win_gaps_islands",
    "win_running_distinct",
    # -- subquery surface (r03) --
    "subquery_exists", "subquery_not_exists", "subquery_in",
    "subquery_scalar",
    # -- joins / scans / sinks (r03/r04) --
    "join_bucketed", "join_lateral", "scan_merge_schema",
    "scan_csv_malformed", "sink_orc_roundtrip",
    # -- maintenance / data quality (r03) --
    "maintenance_cluster", "dq_checks",
    # -- r11 EXTREMES-axis re-spells (the tenth shape axis's first-sweep
    #    catches — changed spellings/oracles REQUIRE fresh evidence):
    #    fn_math's ln and fn_trig's log10 gained explicit x>0 domain
    #    guards (DuckDB hard-errors on log(0), Spark NULLs); agg_stats /
    #    anomaly_zscore moved their grid second moments onto
    #    DECIMAL(19,0) products (cents² wrapped BIGINT at ±1e9 money);
    #    ts_twap's numerator is grid_wsum (decimal product of cents ×
    #    µs weight); ts_ewma's weights are pinned string-cast literal
    #    tables (libm pow + DuckDB decimal→double double-rounding);
    #    ts_max_drawdown's equity curve is integer cents (double
    #    running-sum association order). fn_trig was already windowed;
    #    the other six take the slots of six r04-evidence names
    #    (sample_stratified, sample_per_group, dataset_split,
    #    cdc_dead_letter, cdc_tombstone_gc, cdc_merge_replicas — all
    #    keep green r04 evidence, consistent with this round's "nothing
    #    older than r04" target, and lead the r12 tail).
    "fn_math", "agg_stats", "anomaly_zscore", "ts_ewma", "ts_twap",
    "ts_max_drawdown",
    # -- sampling & splits (r03) --
    "sample_weighted",
    # -- text / fingerprint (r03) --
    "token_count", "lang_id", "doc_fingerprint", "text_redact",
    "text_ngram_freq",
    # -- embeddings / analytics (r03) --
    "embedding_normalize", "funnel_conversion", "retention_cohort",
    # -- multimodal: THE r02 straggler the verdict names (leads the
    #    backlog; placed here with its family, well inside any time cap)
    "multimodal_meta",
    # -- r11 re-spell: agg_minmax_by's register segment changed this
    #    round (ADVICE r10: the non-negative/width precondition of the
    #    zero-padded tie key is now documented in the docstring — code
    #    and oracle byte-identical, but --stale is mechanical, so it
    #    takes kmeans_refine's slot; that one keeps its green r04
    #    evidence and leads the r12 tail).
    "agg_minmax_by",
    # -- heavier LLM ops (r04) --
    "dedup_levenshtein",
    # -- curation pipeline (r03) + RESERVED machinery re-verify:
    #    dataset_curriculum consumes the same ranking machinery as
    #    win_rank_dense (r10 boundary-lambda fix, r08 evidence).
    "decontaminate", "domain_mix", "dataset_curriculum",
    # -- streaming live form LAST (most expensive; r03) --
    "stream_sliding",
]

# R12 ROTATION PLAN (precomputed from the r01-r11 evidence ledger;
# verify with coverage_report first — any --stale name takes priority):
#   1. any coverage_report --stale name (re-spelled code/oracle);
#   2. the remaining r04 shelf (23 names; the seven that ceded r11
#      slots to re-spells lead): kmeans_refine (→ agg_minmax_by),
#      sample_stratified, sample_per_group, dataset_split,
#      cdc_dead_letter, cdc_tombstone_gc, cdc_merge_replicas (→ the six
#      EXTREMES-axis re-spells), then dedup_url_canonical,
#      embedding_covariance, embedding_quantize, multimodal_resample,
#      multimodal_resize, quality_ensemble, quality_unigram_logprob,
#      search_bm25, sim_search_rerank, stream_session_stateful,
#      subquery_not_in_null, text_entropy, text_pii_flag,
#      tfidf_topk_per_doc, token_oov_rate, ts_ohlc_downsample;
#   3. fill the remaining ~27 slots from the r05 shelf head (cheap
#      scalar/agg names first, streaming/LLM last — the time-cap
#      ordering trick).


def _window_order(names: dict[str, QueryFn] | dict[str, str]) -> list[str]:
    front = [n for n in _DRIVER_WINDOW if n in names]
    return front + [n for n in names if n not in set(front)]


def queries() -> dict[str, QueryFn]:
    _load_suite()
    return {n: _QUERIES[n] for n in _window_order(_QUERIES)}


def oracles() -> dict[str, str]:
    _load_suite()
    return {n: _ORACLES[n] for n in _window_order(_ORACLES)}


_LOADED = False


def _load_suite() -> None:
    """Import every suite module exactly once (imports run the decorators)."""
    global _LOADED
    if _LOADED:
        return
    from mongodb_mysql_cdc_spark import suite  # noqa: F401

    suite.load_all()
    _LOADED = True
