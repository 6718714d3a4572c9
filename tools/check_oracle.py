"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, sorted column names,
and an order-insensitive value hash. Stricter than it needs to be on
purpose: if this passes, the driver's compare should too.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mongodb_mysql_cdc_spark.catalog import TABLES, path_for
from mongodb_mysql_cdc_spark.session import get_session


def _norm_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 and 3 hash alike across engines
        return repr(v)
    if isinstance(v, bool):
        return str(bool(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_value(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def table_digest(rows, colnames) -> tuple[int, list[str], str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    names = [colnames[i] for i in order]
    lines = sorted("|".join(_norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), names, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show-diff", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args.names or sorted(qs)

    spark = get_session("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path_for(args.sf, t)}')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        if name not in qs:
            print(f"  ?? {name}: not registered")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ok" if len(srows) >= 0 else "??"
            print(f"  -- {name}: rows-only ({len(srows)} rows) {status} [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = rel.columns
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        sc, sn, sh = table_digest([tuple(r) for r in srows], scols)
        dc, dn, dh = table_digest(drows, dcols)
        ok = (sc, sn, sh) == (dc, dn, dh)
        if ok:
            print(f"PASS {name} ({sc} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: spark=({sc},{sn},{sh}) duckdb=({dc},{dn},{dh})")
            if args.show_diff:
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                s_set = sorted("|".join(_norm_value(r[i]) for i in order_s) for r in srows)
                d_set = sorted("|".join(_norm_value(r[i]) for i in order_d) for r in drows)
                only_s = [x for x in s_set if x not in set(d_set)][:5]
                only_d = [x for x in d_set if x not in set(s_set)][:5]
                print("   spark-only:", only_s)
                print("   duck-only :", only_d)

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
