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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  Round 12
# rotation (r11 verdict item 1 + this round's re-spells): the registry
# is frozen at 279; the window is (a) every name whose register segment
# changed this round — the 8 `coverage_report --stale` names from the
# extremes-vec axis fixes (sim_search_lsh/ivf/rerank, search_rrf_fusion,
# embedding_covariance/_pca_project/_quantize, udf_arrow) PLUS
# sim_search_topk and knn_classify, whose oracles changed through the
# shared _PAIRS_SQL module constant (interpolated f-string constants sit
# OUTSIDE the mechanical segment diff — the stale detector's documented
# limitation — so they are pinned here by hand), (b) the ENTIRE
# remaining r04-evidence shelf (23 names — the seven that ceded r11
# slots to the EXTREMES re-spells lead, exactly as the r11 note
# promised), (c) one machinery re-verify slot: analytics_rfm, the
# original PERMUTE-axis catch, re-proving the r12 exprId-precise
# rewrite of assert_deterministic_order_keys on its living consumer,
# and (d) the 16 lowest-registry-position r05 names, with fn_sql_udf
# and subquery_any_all prioritized inside that shelf because their
# Spark-EXECUTED sql_round text changed in compat.py this round (also
# outside the segment diff).  After a green r12 run no query's latest
# evidence is older than r05.  Evicted: the entire r11 window (all 50
# green in CORRECTNESS_r11, code unchanged since).  Cheap
# relational/scalar families first, expensive streaming/LLM queries
# LAST so a time-capped driver run can't starve the cheap ones.
_DRIVER_WINDOW = [
    # -- subqueries + SQL-executed sql_round re-verifies (cheap) --
    "subquery_not_in_null", "subquery_any_all", "fn_sql_udf",
    # -- aggregate/sketch families (r05) --
    "agg_approx_quantile", "agg_hll_sketch", "agg_bitmap_distinct",
    "agg_corr_matrix", "agg_entropy_diversity",
    # -- scans / union / Python DataSource surface (r05) --
    "union_schema_evolve", "scan_python_datasource",
    "scan_python_datasource_pushdown", "stream_python_datasource",
    # -- sampling & splits (r04) --
    "sample_stratified", "sample_per_group", "dataset_split",
    # -- text / quality / token (r04) --
    "text_entropy", "text_pii_flag", "token_oov_rate",
    "quality_ensemble", "quality_unigram_logprob",
    # -- retrieval / dedup (r04/r05) --
    "search_bm25", "tfidf_topk_per_doc", "dedup_url_canonical",
    "er_match_score",
    # -- the r12 extremes-vec re-spell block: zero-norm exclusion
    #    contracts (topk/lsh/ivf/rerank/rrf/knn), the conditioned
    #    covariance/PCA validity domain, the quantize scale=0 CASE, and
    #    udf_arrow's sequential column fold — every spelling/oracle that
    #    changed for the r12 vector-palette catches needs fresh driver
    #    evidence (topk/knn changed via the shared _PAIRS_SQL constant,
    #    invisible to --stale; pinned manually)
    "sim_search_topk", "sim_search_lsh", "sim_search_ivf",
    "sim_search_rerank", "search_rrf_fusion", "knn_classify",
    "embedding_covariance", "embedding_pca_project",
    "embedding_quantize", "kmeans_refine", "ml_logreg_gd",
    "udf_arrow",
    # -- machinery re-verify: the exprId-precise order-key gate (r12
    #    ADVICE fix) on its original catch query
    "analytics_rfm",
    # -- time series (r04) --
    "ts_ohlc_downsample",
    # -- CDC family (r04/r05) --
    "cdc_dead_letter", "cdc_tombstone_gc", "cdc_merge_replicas",
    "cdc_snapshot_handoff", "cdc_order_audit", "cdc_apply_python_source",
    "cdc_op_mix_hourly", "cdc_keys_churn",
    # -- multimodal (r04 + the r12 TEXT-probe re-spell): frames' oracle
    #    moved to the byte-exact hex contract after the TEXT∘multimodal
    #    probe caught its invalid-UTF-8 output (--stale takes priority;
    #    multimodal_phash cedes its slot — unchanged code, green r05
    #    evidence — and leads the r13 tail with the other deferrals)
    "multimodal_resize", "multimodal_resample", "multimodal_frames",
    # -- streaming live form LAST (most expensive) --
    "stream_session_stateful",
]

# R13 ROTATION PLAN (precomputed from the r01-r12 evidence ledger;
# verify with coverage_report first — any --stale name takes priority):
#   1. any coverage_report --stale name (re-spelled code/oracle);
#   2. the 12 r05-evidence names deferred this round (the window only
#      had 16 r05 slots after the re-spell block, and multimodal_phash
#      later ceded its slot to the stale multimodal_frames):
#      multimodal_phash, multimodal_audio_features, event_seq_pattern,
#      dq_benford, analytics_market_basket, dq_table_diff, anomaly_cusum,
#      ts_derivative, ts_autocorr, sql_recursive_cte, fn_variant,
#      fn_collation;
#   3. fill the remaining ~39 slots from the r06 shelf (22 names:
#      cdc_exactly_once, cdc_gdpr_erasure, cdc_pk_change,
#      cdc_replication_lag, fn_aes_roundtrip, fn_array_hof2,
#      fn_encoding, fn_explode_outer, fn_haversine, fn_interval,
#      fn_levenshtein_threshold, fn_str_to_map, fn_string3, fn_timezone,
#      fn_try_safe, fn_xml, maintenance_zorder, scan_json_corrupt,
#      search_rrf_fusion*, stream_topk, token_bigram_pmi,
#      token_bpe_merge — *rrf re-proves in r12, drop it from the shelf)
#      then the r07 head (cheap scalar/agg names first, streaming/LLM
#      last — the time-cap ordering trick).


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
