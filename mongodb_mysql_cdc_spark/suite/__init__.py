"""The registered query suite — one module per SURVEY.md §2 family.

Each module binds generic operators (from ``operators/``) to the harness
tables and registers (query, oracle) pairs via ``registry.register``.
"""

from __future__ import annotations

import importlib

_MODULES = (
    "relational",
    "aggregates",
    "sorting",
    "joins",
    "windows",
    "setops",
    "scalars",
    "cdc",
    "io",
    "llm_dedup",
    "llm_simsearch",
    "llm_text",
    "llm_media",
    "streaming_batch",
    "pipeline",
    "subqueries",
    "analytics",
    "timeseries",
    "modern_sql",
)


def load_all() -> None:
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
