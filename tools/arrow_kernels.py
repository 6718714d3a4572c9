"""Derive the Arrow-kernel query subset mechanically from physical plans.

``spark.sql.execution.arrow.maxRecordsPerBatch`` re-shapes the pandas
batches every Arrow-Python execution node receives.  Any kernel that
(accidentally) assumes "one batch == one partition / one group / >= 2
rows" is invisible to every data-shape axis — the batch geometry is an
EXECUTION property, not a data property — so the tiny-batch invariance
cell (`SPARK_GRAFT_EXTRA_CONF="spark.sql.execution.arrow.maxRecordsPerBatch=1"`)
needs its own subset, and like the r13 readership subsets it must be
DERIVED, not curated: a query joins this list the moment its plan grows
an Arrow node.

Mechanism: build every registered query at sf0.001 (the plan_lint
pattern) and scan the executed plan for the Arrow-Python operators:

  ArrowEvalPython              vectorized scalar pandas_udf
  MapInPandas / PythonMapInArrow   df.mapInPandas / mapInArrow
  FlatMapGroupsInPandas        groupBy().applyInPandas
  FlatMapCoGroupsInPandas      cogroup().applyInPandas
  AggregateInPandas            grouped-agg pandas_udf
  WindowInPandas               window pandas_udf
  FlatMapGroupsInPandasWithState / TransformWithStateInPandas  stateful

Note ``FlatMapGroupsInPandas`` receives ONE WHOLE GROUP per call by API
contract regardless of the batch conf — it is still swept: the conf
re-chunks its *input* collection path, and the sweep is cheap insurance
against that contract reading differently in a future Spark.
``BatchEvalPython`` (the row-UDF tier exhibit) is excluded: it batches
at a fixed row count unrelated to the Arrow conf.

Usage:
    python tools/arrow_kernels.py            # name: nodes report
    python tools/arrow_kernels.py --names    # subset names, one per line
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mongodb_mysql_cdc_spark.registry import queries
from mongodb_mysql_cdc_spark.session import get_session

ARROW_NODES = [
    "ArrowEvalPython",
    "MapInPandas",
    "PythonMapInArrow",
    "MapInArrow",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "AggregateInPandas",
    "WindowInPandas",
    "FlatMapGroupsInPandasWithState",
    "TransformWithStateInPandas",
]
_PAT = re.compile("|".join(ARROW_NODES))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--names", action="store_true", help="print subset names only")
    ap.add_argument("names_filter", nargs="*")
    args = ap.parse_args()
    spark = get_session("arrow_kernels")
    reg = queries()
    names = args.names_filter or list(reg)
    subset: list[str] = []
    n_err = 0
    for name in names:
        try:
            df = reg[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # eager/streaming query that cannot re-plan here
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:100]}", file=sys.stderr)
            n_err += 1
            continue
        hits = sorted({m.group(0) for m in _PAT.finditer(plan)})
        # MapInPandas is a substring of nothing else, but PythonMapInArrow
        # contains MapInArrow — collapse to the longest form.
        if "PythonMapInArrow" in hits and "MapInArrow" in hits:
            hits.remove("MapInArrow")
        if hits:
            subset.append(name)
            if not args.names:
                print(f"{name}: {', '.join(hits)}")
    if args.names:
        for name in subset:
            print(name)
    else:
        print(f"\n{len(names)} scanned, {len(subset)} Arrow-kernel queries, {n_err} errors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
