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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  Round 9
# rotation (verdict item 1): nothing was code-stale after the r08
# artifacts landed (`coverage_report.py --stale` → 0), so the window
# holds the 3 queries whose ORACLE SPELLING changed this round plus the
# 47 oldest-evidence rows — all 20 remaining r01-evidence queries and
# the 27 lowest-position r02-evidence queries, whose last driver runs
# predate the exact-decimal compat layer, the session levers, and the
# ranking machinery.  Evicted: the r08 re-verify set (all green in
# CORRECTNESS_r08, code unchanged since).  Cheap relational/scalar
# families first, expensive streaming/LLM queries LAST so a time-capped
# driver run can't starve the cheap ones (the ordering trick from
# r2-r8).
_DRIVER_WINDOW = [
    # round-9 re-spells — ADVICE fixes changed these oracle strings
    # (grid_var/stddev clamp → agg_stats, anomaly_zscore; grid_corr
    # half-up `other` recovery → agg_stats; sql_dec_avg_over derivation
    # → sql_qualify). Values identical on fixture data (clamp only
    # engages on near-constant groups; user_id is integral; the window
    # string is semantically the same) but fresh evidence REQUIRED for
    # any changed spelling.
    "agg_stats", "anomaly_zscore", "sql_qualify",
    # round-9 NULL-fixture catches (tools/make_skew.py + the sweep):
    # cross-engine NULL-shape divergences fixed and re-spelled —
    # null-rejecting ASOF equality vs Spark's null-grouping window
    # (join_asof, join_asof_forward: _pv isNotNull gate), NULLS FIRST
    # pinned in the ranking oracles (win_pct, ml_quantile_normalize),
    # null-price exclusion on both engines (agg_weighted_median).
    # Fresh evidence REQUIRED.
    "join_asof", "join_asof_forward", "win_pct",
    "ml_quantile_normalize", "agg_weighted_median",
    # round-9 NULL-fixture catches, FULL-registry sweep wave: all-null
    # frame guards (win_rolling_median crash, ts_ewma list_filter),
    # null-safe flag join-back (win_ratio_to_report), null-safe ghost
    # filter (stream_session), null-safe Scd2 sink joins
    # (cdc_scd2_stream), pairwise NULL exclusion in the regression
    # kernel (udf_grouped_agg), null-propagating channel + cutoff-based
    # is_evolved (cdc_schema_evolution). agg_collect (all-null-group
    # flags contract) sits in the r01 block below — already windowed.
    "win_rolling_median", "win_ratio_to_report", "cdc_scd2_stream",
    "udf_grouped_agg", "stream_session", "cdc_schema_evolution", "ts_ewma",
    # round-9 SKEW-fixture scale re-spells (wall-clock growth audit):
    # join_temporal_scd2's quadratic hot-key probe collapsed to one
    # window pass (proof in the docstring); join_asof_nearest's O(n²)
    # unbounded-following frame reversed into a running frame. Same
    # oracles; fresh evidence REQUIRED for the changed plans.
    "join_temporal_scd2", "join_asof_nearest",
    # oldest evidence: r01 relational/scalar core (last seen by the
    # driver in round 1 under since-evolved session defaults)
    "scan_parquet", "null_handling", "limit",
    "join_left", "join_right", "join_full", "join_theta", "join_self",
    "join_cross", "win_lag_lead", "win_first_last",
    "union_all", "union_distinct", "intersect", "except_distinct",
    "except_all", "fn_string", "fn_datetime", "agg_collect",
    "agg_cube",
    # oldest evidence: r02 scalar families + batch CDC/io
    "fn_math", "fn_conditional", "fn_array", "fn_explode",
    "fn_hash", "filter_op_type",
    "read_json", "read_csv", "sink_append", "snapshot_load",
    "sink_upsert", "dedup_state",
    # oldest evidence: r02 streaming — cdc_apply_stream is the oldest
    # streaming representative still unevicted. Exactly 50 names — the
    # driver verifies queries()[:50] and the window tests pin that
    # count. Evicted for the NULL-fixture re-spell waves (unchanged
    # code, green r02 evidence): dedup_simhash, dedup_embedding_cosine,
    # multimodal_frames, multimodal_meta, text_tokenize, text_quality,
    # udf_surface, stream_dedup, stream_tumbling, stream_source,
    # output_mode_update, cdc_apply_stateful, fn_struct_map, fn_json —
    # they join
    # agg_approx_distinct / multimodal_decode / win_tumbling in the
    # r10 rotation queue.
    "cdc_apply_stream",
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
