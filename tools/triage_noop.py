"""Full-registry per-query timing triage (r13 optimization, guide §1).

Times every registered query with the noop sink (build + execute, best of
--n) at --sf and prints a JSON {name: sec} map sorted slowest-first to
stdout. Used to rank optimization targets beyond the 14 headline queries.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mongodb_mysql_cdc_spark.registry import queries
from mongodb_mysql_cdc_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_session("triage")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, fn in queries().items():
        if args.names and name not in args.names:
            continue
        best = float("inf")
        try:
            for _ in range(args.n):
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001 — triage must finish the sweep
            errs[name] = str(e)[:200]
        print(f"# {name}: {out.get(name, 'ERR')}", file=sys.stderr)
    ranked = dict(sorted(out.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"sf": args.sf, "n": args.n, "timings": ranked, "errors": errs}))


if __name__ == "__main__":
    main()
