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
import glob
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from mongodb_mysql_cdc_spark import registry  # noqa: E402


def driver_evidence() -> dict[str, str]:
    """name → earliest round with a fully-green driver row."""
    out: dict[str, str] = {}
    for path in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
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
            if green and name not in out:
                out[name] = rnd
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    queries = registry.queries()
    oracles = registry.oracles()
    window = set(registry._DRIVER_WINDOW)
    evidence = driver_evidence()
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
