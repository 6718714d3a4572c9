#!/usr/bin/env bash
# Round-end gate sequence — every check the driver (or the judge) will
# run, in the order that fails fastest. See .claude/skills/verify for
# what each gate catches. Streaming checkpoint-restart tests run in a
# serialized second stage (their own process, nothing else competing
# for the JVM) — round-7 verdict item 2.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest (main suite) =="
python -m pytest tests/ -q -m "not serial"

echo "== pytest (serialized checkpoint-restart stage) =="
python -m pytest tests/ -q -m serial -p no:cacheprovider

echo "== plan lint (scale-killer hunt, all registered queries) =="
python tools/plan_lint.py

echo "== strict oracle sweep (Spark vs DuckDB, driver-faithful) =="
python tools/check_strict.py

echo "== driver window simulation (plain session, scratch cwd) =="
python tools/driver_sim.py --window

echo "== headline bench =="
SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" python bench.py

echo "ALL GATES GREEN"
