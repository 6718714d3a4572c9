#!/usr/bin/env bash
# Round-end gate sequence — every check the driver (or the judge) will
# run, in the order that fails fastest. See .claude/skills/verify for
# what each gate catches. Run on a QUIET box; streaming checkpoint tests
# flake under concurrent Spark JVMs (re-run a failure alone before
# believing it).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== plan lint (scale-killer hunt, all registered queries) =="
python tools/plan_lint.py

echo "== strict oracle sweep (Spark vs DuckDB, driver-faithful) =="
python tools/check_strict.py

echo "== driver window simulation (plain session, scratch cwd) =="
python tools/driver_sim.py --window

echo "== headline bench =="
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" python bench.py

echo "ALL GATES GREEN"
