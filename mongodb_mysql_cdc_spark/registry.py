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
# (CORRECTNESS_r01.json = registry positions 1-50 exactly).  After the
# round-5 window went 50/50 green, driver-verified coverage stands at
# 246 of 276 registered queries (union of CORRECTNESS_r01-r05 — the
# numbers regenerate with `python tools/coverage_report.py`).  This
# round-6 window clears the remainder in one pass:
#   - the full 30-name unseen backlog (`coverage_report.py --backlog`);
#   - the 5 green-but-re-spelled queries (`coverage_report.py --stale`,
#     new this round: mechanically diffs each green query's register
#     segment at HEAD vs its green round's marker commit): join_asof
#     (r1 green; nearest-variant + delta_sec fixes landed later), tfidf
#     (r1; df-derivation rewrite r5 + vocab-cutover r6),
#     dedup_ngram_jaccard (r2; pair-budget bound r5), token_bigram_pmi
#     (r4; raw-token-shuffle removal r5), cdc_scd2 (r3; shared-helper
#     refactor when the streaming SCD2 sink landed);
#   - 15 pad slots re-verifying the headline bench queries + three core
#     operators under current code (all green r1-r2, cheap, and the
#     queries whose numbers BENCH_r06 will cite — fresh evidence beats
#     idle slots).
# Cheap scalar/agg/sql families first, streaming LAST so a time-capped
# driver run can't starve the cheap ones (the ordering trick from
# r2-r5).  A green round here makes every registered query
# driver-verified under its current source — keep the registration
# freeze until CORRECTNESS_r06.json lands, then new work reopens.
_DRIVER_WINDOW = [
    # §2.8 scalar-function wave 2 (cheapest)
    "fn_string3", "fn_explode_outer", "fn_array_hof2", "fn_try_safe",
    "fn_interval", "fn_timezone", "fn_xml", "fn_haversine",
    "fn_str_to_map", "fn_aes_roundtrip", "fn_levenshtein_threshold",
    "fn_encoding",
    # §2.4/§2.5 aggregate + window stragglers
    "agg_product", "agg_grouping_id", "win_ratio_to_report",
    # modern-SQL surface
    "sql_parameterized", "sql_pipe_syntax", "sql_qualify",
    # re-verify: re-spelled after their driver green (--stale)
    "join_asof", "tfidf", "dedup_ngram_jaccard", "token_bigram_pmi",
    "cdc_scd2",
    # pad: headline bench queries + core ops under current code.
    # join_salted earns its slot the hard way: the r6 skew-stress test
    # caught the key-derived salt (no spread within the hot key) and the
    # operator was re-salted on the full row — --stale can't see an
    # operator-level change, so the slot is manual.
    "pricing_summary", "join_inner_hash", "join_broadcast",
    "topk_per_group", "win_running", "agg_rollup", "agg_hash",
    "join_salted", "dedup_exact", "dedup_minhash_lsh",
    "sim_search_topk", "sim_search_lsh", "sim_search_ivf", "text_stats",
    # scan/maintenance surface
    "scan_json_corrupt", "scan_observe_metrics",
    # LLM-pipeline round-5 additions
    "dedup_semantic_keep", "search_rrf_fusion", "token_bpe_merge",
    "dataset_curriculum",
    # CDC corner cases (batch)
    "cdc_exactly_once", "cdc_pk_change", "cdc_gdpr_erasure",
    "cdc_replication_lag", "cdc_apply_batch",
    # file-rewrite + streaming LAST — most expensive per query
    "maintenance_zorder", "stream_topk",
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
