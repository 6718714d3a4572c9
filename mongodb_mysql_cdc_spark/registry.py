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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  Round 14
# rotation (r13 verdict item 2 overrides the precomputed plan): the
# registry stays frozen at 279; the window front-loads every query path
# the r13 optimization commits edited AFTER the r13 window was pinned —
# all 12 `coverage_report --stale` names (analytics_rfm, cdc_apply_batch,
# dedup_semantic_keep, embedding_normalize, kmeans_refine,
# search_rrf_fusion, sim_search_ivf/lsh/rerank, stream_stream_join_left,
# text_stats, tfidf_topk_per_doc) plus the verdict-named touched paths
# the tracker's per-function diff misses because only shared helpers
# changed (tfidf via _df_from_tf, sim_search_topk and knn_classify via
# the vectors.py fold re-spell), the full staged-streaming consumer set
# (replay staging re-spelled in r13, patched in r14), the 4 remaining
# r07-evidence deferrals (anomaly_mad, dedup_exact, dedup_ngram_jaccard,
# quality_winsorize), and every bench-headline name this round's
# profiling touches — filled out with the oldest (r08) evidence shelf.
# Evicted: the entire r13 window (all 50 green in CORRECTNESS_r13; none
# edited since except through the replay patch, whose consumers re-enter
# here).  Cheap relational/agg families first, expensive streaming/LLM
# queries LAST so a time-capped driver run can't starve the cheap ones.
_DRIVER_WINDOW = [
    # -- cheap agg / join / window families (r08-evidence shelf, incl.
    #    every bench-headline name this round's profiling may touch) --
    "agg_hash", "agg_global", "agg_having", "agg_count_if",
    "agg_moments", "agg_incremental_merge", "agg_rollup",
    "topk_per_group", "join_inner_hash", "join_broadcast",
    "join_sort_merge", "join_asof", "win_running", "win_range_frame",
    "pricing_summary",
    # -- analytics / anomaly / ts (r08 shelf + r13-touched rfm + r07
    #    deferral + the r14 ts_gapfill window-expr fix, swapped in for
    #    the untouched agg_product) --
    "analytics_shipping_priority", "analytics_pareto", "analytics_rfm",
    "anomaly_mad", "ts_gapfill",
    # -- LLM text (r13-touched + r07 deferrals) --
    "text_stats", "quality_winsorize", "tfidf", "tfidf_topk_per_doc",
    # -- dedup family (r13-touched + r07 deferrals) --
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_semantic_keep",
    # -- vector / similarity family (r13 vector-fold + F.expr re-spells) --
    "embedding_normalize", "knn_classify", "kmeans_refine",
    "sim_search_topk", "sim_search_lsh", "sim_search_ivf",
    "sim_search_rerank", "search_rrf_fusion",
    # -- CDC batch (r13 deferred-parse re-spell) --
    "cdc_apply_batch",
    # -- staged streaming set LAST (most expensive; replay staging was
    #    re-spelled in r13 and patched in r14 — every consumer not in the
    #    r13 window re-verifies here) --
    "output_mode_update", "cdc_apply_stream", "cdc_apply_stateful",
    "cdc_scd2_stream", "stream_source", "stream_dedup",
    "stream_tumbling", "stream_dedup_watermarked", "stream_session",
    "stream_session_stateful", "stream_sliding", "stream_stream_join",
    "stream_stream_join_left",
]

# FUTURE ROTATION (should a round follow r14): any coverage_report
# --stale name first, then the r08 shelf names this window could not fit
# (analytics_local_supplier_volume, ts_gapfill, ts_calendar_profile,
# ts_seasonal_residual, sql_parameterized, sql_pipe_syntax), then the
# r09 head — cheap scalar/agg names first, streaming/LLM last.


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
