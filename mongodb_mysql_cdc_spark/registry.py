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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  Round 13
# rotation (r12 verdict item 1, following the precomputed R13 ROTATION
# PLAN): the registry is frozen at 279; the window is (a) the one
# `coverage_report --stale` name — udf_arrow, whose n_pos kernel fold
# was re-spelled from np.add.reduceat to a cumsum-difference segment sum
# (ADVICE r12 empty-list quirk); (b) the 12 r05-evidence deferrals named
# in the r12 plan; (c) the full 21-name r06 shelf (search_rrf_fusion
# already re-proved in r12); (d) 16 of the 22 r07-evidence names,
# cheap-first — the 6 deferred to r14 are the expensive documents-table
# LLM names (anomaly_mad, dedup_exact, dedup_ngram_jaccard,
# dedup_semantic_keep, quality_winsorize, text_stats).  After a green
# r13 run no query's latest evidence is older than r07.  Evicted: the
# entire r12 window (all 50 green in CORRECTNESS_r12, code unchanged
# since except udf_arrow, which re-enters as the stale slot).  Cheap
# relational/scalar families first, expensive streaming/LLM queries
# LAST so a time-capped driver run can't starve the cheap ones.
_DRIVER_WINDOW = [
    # -- cheap relational / sort / window / join (r07) --
    "project", "filter_pred", "cast_types", "flatten_struct",
    "json_extract", "sort_multi", "topk", "win_row_number",
    "join_semi", "join_anti", "join_range",
    # -- aggregate family (r07) --
    "agg_count_distinct", "agg_mode", "agg_percentile_disc",
    # -- scalar fn_* shelf (r06) + the two r05 fn deferrals --
    "fn_aes_roundtrip", "fn_array_hof2", "fn_encoding",
    "fn_explode_outer", "fn_haversine", "fn_interval",
    "fn_levenshtein_threshold", "fn_str_to_map", "fn_string3",
    "fn_timezone", "fn_try_safe", "fn_xml", "fn_variant",
    "fn_collation", "sql_recursive_cte",
    # -- scans / maintenance (r06) --
    "scan_json_corrupt", "maintenance_zorder",
    # -- dq / analytics / time series (r05) --
    "dq_benford", "dq_table_diff", "anomaly_cusum", "ts_derivative",
    "ts_autocorr", "event_seq_pattern", "analytics_market_basket",
    # -- CDC family (r06/r07) --
    "cdc_envelope_parse", "cdc_scd2", "cdc_exactly_once",
    "cdc_gdpr_erasure", "cdc_pk_change", "cdc_replication_lag",
    # -- token/LLM (r06) --
    "token_bigram_pmi", "token_bpe_merge",
    # -- multimodal (r05: phash ceded its r12 slot to the stale frames
    #    re-spell; audio_features was the other deferral) --
    "multimodal_phash", "multimodal_audio_features",
    # -- stale re-verify: the r13 n_pos segment-sum re-spell --
    "udf_arrow",
    # -- streaming live form LAST (most expensive) --
    "stream_topk",
]

# R14 ROTATION PLAN (precomputed from the r01-r13 evidence ledger;
# verify with coverage_report first — any --stale name takes priority):
#   1. any coverage_report --stale name (re-spelled code/oracle);
#   2. the 6 r07-evidence names deferred this round (the expensive
#      documents-table LLM family): anomaly_mad, dedup_exact,
#      dedup_ngram_jaccard, dedup_semantic_keep, quality_winsorize,
#      text_stats;
#   3. fill the remaining ~43 slots from the r08 shelf (33 names) then
#      the r09 head (cheap scalar/agg names first, streaming/LLM last —
#      the time-cap ordering trick).  A green r14 leaves nothing older
#      than r08.


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
