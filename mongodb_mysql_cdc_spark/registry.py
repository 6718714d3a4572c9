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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  The round-6
# window cleared the whole backlog: all 276 registered queries carry
# driver evidence (union of CORRECTNESS_r01-r06 — regenerate with
# `python tools/coverage_report.py`).  Round 7 is a depth round; the
# registry stays frozen at 276 and the window re-verifies the round-7
# re-spells plus high-value pads:
#   - 12 `coverage_report.py --stale` queries re-spelled this round:
#     agg_stats / quality_winsorize / anomaly_mad / agg_percentile_disc
#     (operators/percentile.py distinct-value-histogram kernel replacing
#     Spark's unbounded-state exact percentile), win_pct /
#     ml_quantile_normalize / quality_buckets / agg_weighted_median /
#     win_rank_dense (operators/ranking.py per-group distributed
#     rank/cumsum/ntile replacing Window.partitionBy on ≤25-value keys),
#     agg_mode (max_by argmax), dedup_ngram_jaccard (df via
#     groupBy+join, not a window buffering hot postings),
#     pack_sequences (packing cumsum via the distributed machinery),
#     corpus_prepare_e2e (comment-only segment change — its packing
#     window deliberately stays, see its in-code rationale; cheap slot);
#   - join_salted, manually: salted_equi_join grew a salt_cols parameter
#     (default behavior unchanged) — an operator-level change --stale
#     cannot see, same reasoning as its r6 slot;
#   - the 14 headline bench queries (BENCH_r07 cites their numbers —
#     fresh evidence beats idle slots), then a §2 core spread.
# Cheap relational/scalar families first, expensive LLM/CDC queries
# LAST so a time-capped driver run can't starve the cheap ones (the
# ordering trick from r2-r6).
_DRIVER_WINDOW = [
    # round-7 re-spells (--stale) — the point of the round, so first
    "agg_mode", "agg_stats", "agg_percentile_disc", "win_pct", "win_rank_dense",
    "ml_quantile_normalize", "quality_winsorize", "anomaly_mad",
    "quality_buckets", "agg_weighted_median", "dedup_ngram_jaccard",
    "pack_sequences",
    # operator-level change invisible to --stale (salt_cols param)
    "join_salted",
    # headline bench queries — BENCH_r07's numbers under fresh evidence
    "pricing_summary", "join_inner_hash", "join_broadcast", "join_asof",
    "topk_per_group", "win_running", "agg_rollup", "cdc_apply_batch",
    "dedup_exact", "dedup_minhash_lsh", "sim_search_topk",
    "sim_search_lsh", "tfidf", "text_stats",
    # pad: §2 core spread under current code, cheap families first
    "project", "filter_pred", "cast_types", "json_extract",
    "flatten_struct", "sort_multi", "topk",
    "agg_hash", "agg_global", "agg_count_distinct", "agg_grouping_sets",
    "agg_minmax_by", "win_row_number",
    "join_sort_merge", "join_semi", "join_anti", "join_range",
    # LLM-pipeline + CDC spread LAST — most expensive per query
    "sim_search_ivf", "knn_classify", "cdc_envelope_parse", "cdc_scd2",
    "dedup_semantic_keep", "corpus_prepare_e2e",
]


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
