"""Build the 10× scale-up fixture used by BASELINE.md's validation tables.

Multiplies the sf0.1 harness tables 10× with shifted keys (so join/group
cardinalities grow with the data instead of collapsing onto the same keys)
into a target dir laid out exactly like a harness sf dir — every registry
query runs against it unmodified via ``load(spark, target, name)``.

Key-shift scheme (copy i in 0..9):
- events:     event_id += i·10⁹   user_id += i·10⁴
- documents:  doc_id   += i·10⁶   (text/source unchanged — true near-dups,
                                   the adversarial case for dedup ops)
- embeddings: vec_id   += i·10⁶
- orders:     o_orderkey += i·10⁹   o_custkey += i·10⁷
- lineitem:   l_orderkey += i·10⁹   (preserves the orders join)
              l_suppkey  += i·10⁶   l_partkey += i·10⁶
- customer:   c_custkey += i·10⁷   (preserves the orders join)
- part/supplier/nation/region: copied once, unshifted (bounded dims)

Usage:  python tools/make_10x.py [--src /root/testdata/sf0.1] [--dst /tmp/sf10x]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import TABLES, load
from mongodb_mysql_cdc_spark.session import get_session

SHIFTS = {
    "events": {"event_id": 10**9, "user_id": 10**4},
    "documents": {"doc_id": 10**6},
    "embeddings": {"vec_id": 10**6},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**9, "l_suppkey": 10**6, "l_partkey": 10**6},
    "customer": {"c_custkey": 10**7},
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf10x")
    ap.add_argument(
        "--copies", type=int, default=10,
        help="scale multiplier (key shifts are i*shift for copy i, so any "
        "count up to ~10^3 stays collision-free under the SHIFTS strides)",
    )
    args = ap.parse_args()
    spark = get_session("make_10x")
    for name in TABLES:
        df = load(spark, args.src, name)
        out = f"{args.dst}/{name}.parquet"
        shifts = SHIFTS.get(name)
        if shifts is None:
            df.write.mode("overwrite").parquet(out)
            print(f"{name}: copied")
            continue
        copies = [
            df.select(
                *[
                    (F.col(c) + i * shifts[c]).alias(c) if c in shifts else F.col(c)
                    for c in df.columns
                ]
            )
            for i in range(args.copies)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.write.mode("overwrite").parquet(out)
        print(f"{name}: x{args.copies} -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
