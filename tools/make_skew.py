"""Build the data-SHAPE fixtures (round 9): skewed keys and NULL-bearing.

The invariance program (tools/invariance_sweep.sh) covers layout, scale,
and execution path; this tool adds the fourth adversarial axis — the
shape of the DATA itself. Two fixtures, both derived from a harness sf
dir the same way make_10x.py derives the scale fixtures (column remaps
only, so every FIXTURES.md invariant the queries rely on survives:
2-decimal money grids, PK uniqueness, doc_id/vec_id ranges, timestamp
domains, FK validity):

SKEW (--mode skew, default dst /tmp/sfskew): one hot key absorbs ~50%
of the rows of each fact-side join/group column —
  - events.user_id      → hot user  where event_id % 2 = 0
  - orders.o_custkey    → hot cust  where o_orderkey % 2 = 0
  - lineitem.l_partkey  → hot part  where (l_orderkey + l_linenumber) % 2 = 0
  - lineitem.l_suppkey  → hot supp  where (l_orderkey + l_linenumber) % 2 = 0
Hot keys are the MIN existing key of the referenced dim, so FK validity
is preserved and joins stay semantically valid — the hot side simply
concentrates half the fact table on one build/probe key (the shape AQE
skew-join and salted_equi_join exist for). PK/tiebreak columns
(event_id, o_orderkey, l_orderkey+l_linenumber, doc_id, vec_id) are
never remapped: top-k queries tiebreak on them, and collapsing them
would make result SETS engine-dependent (a fixture artifact, not a bug).

NULL (--mode null, default dst /tmp/sfnull): NULL group keys and NULL
money values at a few percent — FIXTURES.md verifies no NULLs at
sf0.001 but explicitly warns larger SFs may carry them; this fixture
makes the hazard concrete:
  - events.user_id         → NULL where event_id % 37 = 0   (~2.7%)
  - events.value           → NULL where event_id % 41 = 0   (~2.4%)
  - lineitem.l_extendedprice → NULL where (l_orderkey*7 + l_linenumber) % 47 = 0
  - lineitem.l_returnflag  → NULL where (l_orderkey + l_linenumber) % 53 = 0
Deterministic predicates on never-remapped unique columns, so both
fixtures are reproducible bit-for-bit and Spark + DuckDB read the SAME
parquet — the strict sweep's hash compare stays meaningful.

Usage:
    python tools/make_skew.py                      # both fixtures from sf0.1
    python tools/make_skew.py --mode skew --dst /tmp/sfskew
    python tools/make_skew.py --src /tmp/sf10x --mode null --dst /tmp/sf10xnull
Then sweep:
    python tools/check_strict.py --sf /tmp/sfskew $(python tools/subsets.py skew)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mongodb_mysql_cdc_spark.catalog import TABLES, load
from mongodb_mysql_cdc_spark.session import get_session


def _min_key(spark, src: str, table: str, col: str) -> int:
    return load(spark, src, table).agg(F.min(col)).collect()[0][0]


def build_skew(spark, src: str, dst: str) -> None:
    hot_user = _min_key(spark, src, "events", "user_id")
    hot_cust = _min_key(spark, src, "customer", "c_custkey")
    hot_part = _min_key(spark, src, "part", "p_partkey")
    hot_supp = _min_key(spark, src, "supplier", "s_suppkey")
    print(f"hot keys: user={hot_user} cust={hot_cust} part={hot_part} supp={hot_supp}")
    for name in TABLES:
        df = load(spark, src, name)
        if name == "events":
            df = df.withColumn(
                "user_id",
                F.when(F.col("event_id") % 2 == 0, F.lit(hot_user).cast("long"))
                .otherwise(F.col("user_id")),
            )
        elif name == "orders":
            df = df.withColumn(
                "o_custkey",
                F.when(F.col("o_orderkey") % 2 == 0, F.lit(hot_cust).cast("long"))
                .otherwise(F.col("o_custkey")),
            )
        elif name == "lineitem":
            pred = (F.col("l_orderkey") + F.col("l_linenumber")) % 2 == 0
            df = df.withColumn(
                "l_partkey",
                F.when(pred, F.lit(hot_part).cast("long")).otherwise(F.col("l_partkey")),
            ).withColumn(
                "l_suppkey",
                F.when(pred, F.lit(hot_supp).cast("long")).otherwise(F.col("l_suppkey")),
            )
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name} -> {dst}")


def build_null(spark, src: str, dst: str) -> None:
    for name in TABLES:
        df = load(spark, src, name)
        if name == "events":
            df = df.withColumn(
                "user_id",
                F.when(F.col("event_id") % 37 == 0, F.lit(None).cast("long"))
                .otherwise(F.col("user_id")),
            ).withColumn(
                "value",
                F.when(F.col("event_id") % 41 == 0, F.lit(None).cast("double"))
                .otherwise(F.col("value")),
            )
        elif name == "lineitem":
            df = df.withColumn(
                "l_extendedprice",
                F.when(
                    (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 47 == 0,
                    F.lit(None).cast("double"),
                ).otherwise(F.col("l_extendedprice")),
            ).withColumn(
                "l_returnflag",
                F.when(
                    (F.col("l_orderkey") + F.col("l_linenumber")) % 53 == 0,
                    F.lit(None).cast("string"),
                ).otherwise(F.col("l_returnflag")),
            )
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name} -> {dst}")


def build_span(spark, src: str, dst: str, factor: int = 12) -> None:
    """SPAN fixture (round 10): stretch the events timeline ×factor
    (30 days → ~1 year at 12) by exact integer-microsecond affine remap
    ts' = min_ts + (ts − min_ts)·factor. Ordering, uniqueness, values and
    every other column survive; only the TIME SPAN grows — the axis the
    round-10 ts_interpolate_linear catch proved invisible to skew (a hot
    key doesn't grow an hourly grid; a longer span does, and per-user
    grids are where frame pathologies turn quadratic). Deterministic and
    engine-shared like the other fixtures: both engines read the SAME
    stretched parquet, so the strict hash compare stays meaningful."""
    min_us = int(
        load(spark, src, "events").agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    )
    for name in TABLES:
        df = load(spark, src, name)
        if name == "events":
            df = df.withColumn(
                "ts",
                F.timestamp_micros(
                    F.lit(min_us)
                    + (F.unix_micros("ts") - F.lit(min_us)) * F.lit(int(factor))
                ),
            )
        df.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name} -> {dst}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--mode", choices=["skew", "null", "span", "both"], default="both")
    ap.add_argument("--dst", default=None, help="target dir (defaults per mode)")
    args = ap.parse_args()
    spark = get_session("make_skew")
    if args.mode in ("skew", "both"):
        build_skew(spark, args.src, args.dst or "/tmp/sfskew")
    if args.mode in ("null", "both"):
        build_null(spark, args.src, args.dst or "/tmp/sfnull")
    if args.mode == "span":
        build_span(spark, args.src, args.dst or "/tmp/sfspan")
    spark.stop()


if __name__ == "__main__":
    main()
