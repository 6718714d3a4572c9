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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  Round 8
# registered one new query (corpus_prepare_e2e_production — the
# round-7 verdict's A/B item; registry 276 → 277) and reworked the
# ranking machinery (one-job bounded boundary sample, 1024-bucket cap,
# constant-depth bucket expression, null-safe join-backs), so the
# window re-verifies every machinery consumer first:
#   - `--stale` flags: win_rank_dense / agg_weighted_median /
#     analytics_rfm (localCheckpoint of float-aggregate machinery
#     inputs, round-7 ADVICE), corpus_prepare_e2e (stage-1-3 refactor
#     into the shared helper);
#   - corpus_prepare_e2e_production: NEW — first driver evidence;
#   - operator-level machinery changes invisible to --stale: win_pct,
#     ml_quantile_normalize, quality_buckets, pack_sequences,
#     dataset_curriculum (ranking.py rework), join_salted (nested-map
#     salt filter + salt_cols dedupe);
#   - the 14 headline bench queries (fresh evidence under BENCH_r08's
#     numbers), then a §2 core spread rotated to rows whose last
#     evidence predates r07 where possible.
# Cheap relational/scalar families first, expensive LLM/CDC queries
# LAST so a time-capped driver run can't starve the cheap ones (the
# ordering trick from r2-r7).
_DRIVER_WINDOW = [
    # round-8 machinery re-verifies — the point of the round, so first
    "win_pct", "win_rank_dense", "ml_quantile_normalize", "quality_buckets",
    "agg_weighted_median", "pack_sequences", "dataset_curriculum",
    "analytics_rfm", "join_salted",
    "corpus_prepare_e2e", "corpus_prepare_e2e_production",
    # headline bench queries — BENCH_r08's numbers under fresh evidence
    "pricing_summary", "join_inner_hash", "join_broadcast", "join_asof",
    "topk_per_group", "win_running", "agg_rollup", "cdc_apply_batch",
    "dedup_minhash_lsh", "sim_search_topk", "sim_search_lsh", "tfidf",
    # re-spelled mid-r8: scale-stable comparison contracts. The sf1
    # strict sweep caught agg_product (rounding contract tightening with
    # corpus size) and analytics_pareto (double-sum merge-order ulp on a
    # round-half boundary); the systematic audit then re-spelled every
    # corpus-group sum/avg of a money-grid double onto exact decimal
    # accumulators with via-string double casts (the sf10x re-validation
    # caught DuckDB's decimal→double cast double-rounding above 2^53 on
    # pricing_summary's charge sum — functions/compat.py). All fresh
    # evidence REQUIRED; the evicted §2 pads (scan_parquet, filters,
    # set-ops…) are unchanged code with green r≤07 evidence.
    "agg_product", "agg_incremental_merge", "analytics_pareto",
    "agg_hash", "agg_global", "agg_grouping_sets", "agg_count_if",
    "analytics_shipping_priority", "analytics_local_supplier_volume",
    "ts_twap", "cdc_warehouse_report", "sql_parameterized",
    "sql_pipe_syntax", "scan_observe_metrics", "join_sort_merge",
    "agg_having", "win_range_frame",
    # re-spelled LATE r8: the sf1 × AQE-off invariance sweep caught
    # ts_calendar_profile's 6dp-rounded corpus-group avg(value) flipping
    # a round-half boundary under a different merge order — the same
    # scale-unstable contract class as the money sums, in the stats
    # family. All eight corpus-group avg/stddev/var/corr sites over the
    # 2-grid `value` column re-spelled onto exact grid accumulators
    # (compat.dec_avg / grid_stddev_samp / grid_var_samp / grid_corr);
    # fresh driver evidence REQUIRED. Evicted for these slots (unchanged
    # code, green r<=07 evidence): agg_collect, agg_cube, win_lag_lead,
    # win_first_last, join_self, text_tokenize, dedup_exact, text_stats.
    "ts_calendar_profile", "ts_seasonal_residual", "ts_gapfill",
    "ts_interpolate_linear", "anomaly_zscore", "sql_qualify",
    "agg_moments", "agg_stats",
    # LLM-pipeline + CDC spread LAST — most expensive per query
    # (dedup_clusters/survivors: round-8 star-edge re-spell re-verify).
    # Exactly 50 names — the driver verifies queries()[:50] and the
    # window tests pin that count; dedup_simhash / cdc_apply_stream /
    # decontaminate were evicted by the exact-decimal re-spells
    # (unchanged code, green r<=07 evidence).
    "dedup_clusters", "dedup_survivors",
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
