"""Best-of-N wall-clock comparison of registry queries across two sf dirs
(the BASELINE.md 10× scale-validation harness).

Timing forces full materialization the same way bench.py does:
bit_xor(xxhash64(struct(*))) over every output column — Catalyst cannot
prune the computation being measured.

Usage:
  python tools/bench_scale.py --queries q1,q2 [--a /root/testdata/sf0.1]
                              [--b /tmp/sf10x] [--n 2]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.registry import queries
from mongodb_mysql_cdc_spark.session import get_session


def materialize(df) -> int:
    row = df.agg(
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return row.n


def time_query(fn, spark, sf_dir: str, n: int) -> tuple[float, int]:
    best, rows = float("inf"), 0
    for _ in range(n):
        t0 = time.monotonic()
        rows = materialize(fn(spark, sf_dir))
        best = min(best, time.monotonic() - t0)
    return best, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--a", default="/root/testdata/sf0.1")
    ap.add_argument("--b", default="/tmp/sf10x")
    ap.add_argument("--n", type=int, default=2)
    args = ap.parse_args()
    spark = get_session("bench_scale")
    reg = queries()
    for name in args.queries.split(","):
        fn = reg[name]
        ta, ra = time_query(fn, spark, args.a, args.n)
        tb, rb = time_query(fn, spark, args.b, args.n)
        growth = tb / ta if ta > 0 else float("inf")
        print(
            f"RESULT {name}: a={ta:.2f}s ({ra} rows)  b={tb:.2f}s ({rb} rows)"
            f"  growth={growth:.1f}x",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
