"""Coverage report: registry vs driver evidence, one line per query.

Prints every registered query with
- whether it carries a DuckDB oracle (value-checked) or is rows-only,
- which CORRECTNESS_r*.json round (if any) gave it a driver-green row,
- whether it sits in the current driver window (next round's evidence).

The judge's SURVEY §2 line-by-line check reduces to reading this table.

Usage:  python tools/coverage_report.py [--json]
"""

from __future__ import annotations

import argparse
import ast
import glob
import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from mongodb_mysql_cdc_spark import registry  # noqa: E402


def driver_evidence(paths: list[str] | None = None) -> dict[str, str]:
    """name → LATEST round with a fully-green driver row.

    Latest, not earliest: a query re-verified green in a later round has
    evidence under NEWER code, and --stale must diff against that round
    — keeping the earliest round made every re-verified query print as
    stale forever (round-6 verdict item), masking real staleness.

    `paths` overrides the repo glob (tests feed synthetic fixtures so
    assertions don't break whenever the driver drops a new round file)."""
    out: dict[str, str] = {}
    # glob sort is ascending by round (r01 < r02 < …), so the last write
    # per name below is its latest green round
    if paths is None:
        paths = glob.glob(str(ROOT / "CORRECTNESS_r*.json"))
    for path in sorted(paths):
        rnd = Path(path).stem.split("_r")[-1]
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = (
                row.get("rows_match")
                and row.get("schema_match") is not False
                and row.get("hash_match") is not False
                and not row.get("err")
            )
            # oracle-less queries: the driver records err='no_oracle' plus a
            # row count — that IS its (weaker, by-design) rows-only pass
            rows_only_green = (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green or rows_only_green:
                out[name] = rnd
    return out


def _round_commit(rnd: str) -> str | None:
    """Hash of the 'round N: verdict/...' marker commit — the repo state
    the driver's CORRECTNESS_rN.json evidence was recorded against (the
    marker only adds verdict/bench files, so its package tree IS the
    end-of-round-N code)."""
    out = subprocess.run(
        ["git", "log", "--format=%H", "-1", "--grep", f"^round {int(rnd)}: ",
         "--extended-regexp"],
        cwd=ROOT, capture_output=True, text=True,
    )
    h = out.stdout.strip()
    return h or None


def _query_segment(src: str, qname: str) -> str | None:
    """Source segment (register decorator + body) of the function
    registered under qname, or None if absent. The decorator is included
    because it carries the oracle SQL — an oracle edit is as much a
    re-spell as a body edit. Limitation (documented): shared module
    constants interpolated into oracle f-strings (CTE snippets, shared
    helpers) are outside the segment; an edit there won't flag."""
    try:
        tree = ast.parse(src)
    except SyntaxError:
        return None
    lines = src.splitlines()
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        for dec in node.decorator_list:
            if (
                isinstance(dec, ast.Call)
                and dec.args
                and isinstance(dec.args[0], ast.Constant)
                and dec.args[0].value == qname
            ):
                start = min(d.lineno for d in node.decorator_list) - 1
                return "\n".join(lines[start : node.end_lineno])
    return None


def stale_queries(evidence: dict[str, str]) -> list[tuple[str, str]]:
    """Queries whose defining source changed AFTER their driver-green
    round: (name, green_round) pairs needing a re-verify window slot.
    Mechanical version of 'changed since green' — compares the register
    segment at HEAD vs the round-marker commit's copy of the module."""
    from mongodb_mysql_cdc_spark import registry as _r

    _r.queries()  # force suite load
    out: list[tuple[str, str]] = []
    old_file_cache: dict[tuple[str, str], str | None] = {}
    warned_rounds: set[str] = set()
    for name, rnd in sorted(evidence.items()):
        fn = _r._QUERIES.get(name)
        if fn is None:
            continue
        path = Path(fn.__code__.co_filename)
        try:
            rel = str(path.relative_to(ROOT))
        except ValueError:
            continue
        commit = _round_commit(rnd)
        if commit is None:
            # an unresolvable marker silently treated as not-stale is the
            # round-4 backlog-undercount failure mode — warn loudly (the
            # current round's marker usually doesn't exist until its
            # verdict files are committed; until then its queries are
            # UNVERIFIABLE here, not known-fresh)
            if rnd not in warned_rounds:
                warned_rounds.add(rnd)
                print(
                    f"  WARNING: no 'round {int(rnd)}:' marker commit — "
                    f"queries green in r{rnd} are unverifiable for "
                    "staleness (not known-fresh)",
                    file=sys.stderr,
                )
            continue
        key = (commit, rel)
        if key not in old_file_cache:
            show = subprocess.run(
                ["git", "show", f"{commit}:{rel}"],
                cwd=ROOT, capture_output=True, text=True,
            )
            old_file_cache[key] = show.stdout if show.returncode == 0 else None
        old_src = old_file_cache[key]
        new_seg = _query_segment(path.read_text(), name)
        old_seg = _query_segment(old_src, name) if old_src else None
        if new_seg != old_seg:
            out.append((name, rnd))
    return out


def driver_seen() -> set[str]:
    """Every name that has appeared in ANY driver window (green or not)."""
    seen: set[str] = set()
    for path in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        with open(path) as f:
            seen.update(json.load(f).keys())
    return seen


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--backlog",
        action="store_true",
        help="print the ordered next-round queue: every registered query "
        "that is neither driver-seen nor in the current window",
    )
    ap.add_argument(
        "--stale",
        action="store_true",
        help="print driver-green queries whose register segment changed "
        "after their green round (need a re-verify window slot)",
    )
    ap.add_argument(
        "--summary",
        action="store_true",
        help="print the one-paragraph markdown coverage summary README/"
        "SURVEY cite (regenerate instead of hand-editing counts)",
    )
    args = ap.parse_args()
    if args.summary:
        qs = registry.queries()
        orc = registry.oracles()
        window = registry._DRIVER_WINDOW
        evidence = driver_evidence()
        seen = driver_seen()
        backlog = [n for n in qs if n not in seen and n not in set(window)]
        stale = stale_queries(evidence)
        print(
            f"Registry: **{len(qs)} queries / {len(orc)} oracles** "
            f"({len(qs) - len(orc)} rows-only by design). Driver evidence: "
            f"**{len(evidence)} green** (union of CORRECTNESS_r*.json). "
            f"Window: {len(window)} slots. Unseen backlog outside the "
            f"window: {len(backlog)}. Green-but-re-spelled (--stale): "
            f"{len(stale)} → {[n for n, _ in stale] or 'none'}."
        )
        return
    if args.stale:
        stale = stale_queries(driver_evidence())
        print(f"{len(stale)} green-but-re-spelled queries (need re-verify):")
        for name, rnd in stale:
            print(f"  stale-since-r{rnd}  {name}")
        return
    queries = registry.queries()
    oracles = registry.oracles()
    window = set(registry._DRIVER_WINDOW)
    evidence = driver_evidence()

    if args.backlog:
        seen = driver_seen()
        backlog = [n for n in queries if n not in seen and n not in window]
        # also surface seen-but-never-green names needing a re-verify slot
        red = [n for n in queries if n in seen and n not in evidence and n not in window]
        print(f"round-6 queue ({len(backlog)} unseen + {len(red)} needs-reverify):")
        for n in backlog:
            print(f"  unseen    {n}")
        for n in red:
            print(f"  reverify  {n}")
        return
    rows = []
    for pos, name in enumerate(queries, 1):
        rows.append(
            {
                "pos": pos,
                "name": name,
                "oracle": name in oracles,
                "driver_green_round": evidence.get(name),
                "in_current_window": name in window,
            }
        )
    if args.json:
        print(json.dumps(rows, indent=1))
        return
    n_green = sum(1 for r in rows if r["driver_green_round"])
    n_oracle = sum(1 for r in rows if r["oracle"])
    print(f"{len(rows)} queries | {n_oracle} with oracle | "
          f"{n_green} driver-green so far | window=50")
    for r in rows:
        mark = f"r{r['driver_green_round']}" if r["driver_green_round"] else "--"
        win = "W" if r["in_current_window"] else " "
        orc = "oracle" if r["oracle"] else "ROWS-ONLY"
        print(f"{r['pos']:>3} {win} {mark:>3} {orc:<9} {r['name']}")


if __name__ == "__main__":
    main()
