"""Reusable operator implementations (table-agnostic).

Modules:
- ``relational``: projection/filter/cast/JSON-bridge helpers.
- ``joins``: join strategies incl. as-of and range joins Spark lacks natively.
- ``windows``: window-function compositions (dedup-rank, top-k per group).
- ``llm``: LLM-data-pipeline operators (dedup, similarity, text analysis,
  multimodal).
"""
