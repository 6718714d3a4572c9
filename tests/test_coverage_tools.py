"""Unit tests for tools/coverage_report.py's --stale machinery (no Spark).

The stale check is what decides which green queries owe a re-verify
window slot; a silent extraction failure would under-rotate the driver
window, which is exactly how round-4's backlog undercount happened.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

import coverage_report as cr  # noqa: E402


def test_query_segment_includes_decorator_and_body():
    src = (ROOT / "mongodb_mysql_cdc_spark/suite/llm_text.py").read_text()
    seg = cr._query_segment(src, "tfidf")
    assert seg is not None
    assert seg.startswith("@register")       # decorator included …
    assert "oracle=" in seg                  # … because it carries the SQL
    assert "def tfidf" in seg
    assert cr._query_segment(src, "no_such_query") is None


def test_round_commit_resolves_markers():
    assert cr._round_commit("05") is not None
    assert cr._round_commit("99") is None


def test_driver_window_contract():
    """The driver verifies the FIRST 50 queries() names. The window list
    must therefore be exactly 50 valid, distinct, registered names —
    a typo here silently wastes verification slots (the round-4 backlog
    undercount class)."""
    from mongodb_mysql_cdc_spark import registry

    w = registry._DRIVER_WINDOW
    qs = registry.queries()
    assert len(w) == 50
    assert len(set(w)) == 50
    assert all(n in qs for n in w), [n for n in w if n not in qs]
    assert list(qs)[:50] == w


def test_stale_flags_an_edited_segment():
    # a green query whose segment is byte-identical at its marker commit
    # must NOT flag; simulate an edit by asking against an older round
    # where tfidf is KNOWN re-spelled (r5 rewrite + r6 cutover vs r1)
    stale = dict(cr.stale_queries({"tfidf": "01"}))
    assert "tfidf" in stale


def test_driver_evidence_keeps_latest_green_round():
    """Re-verified ⇒ not stale: a query green in r01 AND re-verified in
    a later round must report the LATER round, so --stale diffs against
    the code its newest evidence was recorded under (keeping the
    earliest round made every re-verified query stale forever)."""
    ev = cr.driver_evidence()
    # join_asof: green r01, re-spelled afterwards, re-verified green r06
    assert ev["join_asof"] == "06"
    # and therefore it must NOT appear stale at a HEAD that hasn't
    # touched it since the r06 re-verify
    assert "join_asof" not in dict(cr.stale_queries({"join_asof": ev["join_asof"]}))


def test_stale_warns_on_unresolvable_round_marker(capsys):
    """A round with no marker commit yet (the current round before its
    verdict files land) must WARN, not silently treat its queries as
    fresh — the silent skip is the round-4 undercount failure mode."""
    out = cr.stale_queries({"tfidf": "99"})
    assert out == []
    assert "no 'round 99:' marker" in capsys.readouterr().err
