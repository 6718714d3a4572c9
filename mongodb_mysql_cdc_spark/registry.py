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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  Rounds 1-3
# produced green driver rows for 147 distinct queries; the 30 registered
# queries below carry only builder/judge strict-checker evidence so far.
# This round-4 window front-loads those 30 (cheap scalar/agg/join
# families first, the stateful-stream query last so a time-capped driver
# run can't starve the cheap ones — the ordering trick from r2/r3) and
# fills the remaining slots with round-4 additions as they land.
_DRIVER_WINDOW = [
    # §2.8/§2.4 scalar + aggregate extensions (cheapest)
    "fn_url", "agg_approx_quantile", "agg_incremental_merge",
    "agg_percentile_exact", "agg_regression",
    # §2.5 window extensions
    "win_gaps_islands",
    # §2.3/§2.1 join + scan extensions
    "join_asof_forward", "join_partition_pruned_dynamic",
    "scan_partition_pruned", "subquery_not_in_null",
    # §2.9 CDC extensions (batch forms)
    "cdc_dead_letter", "cdc_tombstone_gc",
    # time-series suite (§2.11)
    "ts_gapfill", "ts_ohlc_downsample", "anomaly_zscore",
    "ts_interpolate_linear",
    # §2.10 text + quality extensions
    "text_entropy", "token_oov_rate", "quality_ensemble",
    # §2.10 dedup / similarity extensions
    "dedup_levenshtein", "kmeans_refine", "embedding_quantize",
    "sim_search_rerank", "udf_grouped_agg",
    # §2.10 multimodal (real WAV/BMP kernels — moderate cost)
    "multimodal_resize", "multimodal_resample",
    # §2.10 curation
    "sample_stratified", "sample_per_group", "dataset_split",
    # round-4 additions (driver-unseen by construction)
    "fn_array2", "fn_map2", "agg_count_if", "agg_percentile_disc",
    "win_running_distinct", "dq_profile", "anomaly_mad", "ts_ewma",
    "join_asof_nearest", "cdc_merge_replicas", "scan_csv_malformed",
    "doc_chunk_overlap", "dedup_url_canonical", "text_pii_flag",
    "token_bigram_pmi", "quality_unigram_logprob", "search_bm25",
    "tfidf_topk_per_doc", "embedding_covariance", "graph_pagerank_iter",
    # stateful stream LAST — most expensive per query
    "stream_session_stateful",
]

# Queued for the round-5 window: EVERY query registered after this
# round's 50 slots filled (driver-unseen, each strict-checker green) —
# enumerate them with `python tools/coverage_report.py` (rows whose
# driver_green_round is empty and in_current_window is false). As of
# end-of-round-4 that is 34 queries: the wave 2-12 additions from
# agg_moments through fn_xml (see README coverage rows r4 wave 2+).


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
