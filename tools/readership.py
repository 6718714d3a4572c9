"""Mechanical column-readership extraction (round 13, VERDICT r12 item 3).

The data-shape axes that sweep a SUBSET (span / text / ties / vectors —
the full-registry axes can't hide anything by construction) relied on
hand-curated membership lists in tools/subsets.py. Round 12's bonus
catch proved the failure mode: the multimodal family consumes
documents.text as its payload substrate but was absent from the TEXT
subset for eleven rounds, hiding a driver-crashing bug (invalid UTF-8
out of multimodal_frames) from every TEXT sweep. Hand curation is a
coverage gap; this tool closes it by DERIVING readership mechanically.

For every registered query it records two signals:

- ``scan``: per-table column sets taken from the FORMATTED physical
  plan's ``Scan parquet`` blocks (Output attribute lists + Location
  paths). This is the post-pruning truth: exactly the columns the query
  reads from each fixture table. Temp-file rescans (a sink's own
  parquet, a JSON/CSV re-encode) don't map to a fixture table and are
  ignored here — the ``loads`` signal covers their provenance.
- ``loads``: fixture tables whose ``<sf_dir>/<table>.parquet`` path went
  through ``DataFrameReader.parquet`` while the query BUILT (captured by
  instrumenting the reader class, so eager pre-steps — temp-format
  conversion, stream-input staging, driver-side machinery samples — are
  seen even though the final plan can't show them).

A table in ``loads`` but absent from ``scan`` is an OPAQUE read (the
final plan reads a memory sink / temp re-encode instead): column-level
readership is unknowable mechanically, so consumers must treat the query
as a reader of EVERY column of that table (conservative direction — a
sweep too many, never a hidden family).

Output: tools/readership.json, committed; regenerated per round (or
whenever the registry changes — tests/test_coverage_tools.py pins the
name set) with::

    python tools/readership.py --write          # full registry, sf0.001
    python tools/readership.py name1 name2      # spot-check, print only

tests/test_coverage_tools.py asserts every curated axis subset is a
SUPERSET of the derived reader set for that axis's mutated columns
(tools/subsets.py AXIS_MUTATIONS).
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mongodb_mysql_cdc_spark.catalog import TABLES
from mongodb_mysql_cdc_spark.registry import queries
from mongodb_mysql_cdc_spark.session import get_session

OUT_PATH = Path(__file__).resolve().parent / "readership.json"

_SCAN_BLOCK = re.compile(r"\(\d+\) Scan (\w+)[^\n]*\n((?:[^\n]+\n)*)")
_OUTPUT = re.compile(r"Output(?: \[\d+\])?: \[([^\]]*)\]")
_LOCATION = re.compile(r"Location: \S+ \[([^\]]*)\]")
_ATTR = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)#\d+")


def _table_of(path: str) -> str | None:
    for t in TABLES:
        if path.rstrip("/").endswith(f"/{t}.parquet"):
            return t
    return None


def scan_readership(explain_formatted: str) -> dict[str, set[str]]:
    """(table → column set) from the formatted plan's Scan blocks."""
    out: dict[str, set[str]] = {}
    for m in _SCAN_BLOCK.finditer(explain_formatted):
        block = m.group(2)
        loc = _LOCATION.search(block)
        if not loc:
            continue
        table = _table_of(loc.group(1))
        if table is None:
            continue  # temp/sink rescan — provenance covered by `loads`
        outm = _OUTPUT.search(block)
        cols = set(_ATTR.findall(outm.group(1))) if outm else set()
        out.setdefault(table, set()).update(cols)
    return out


class _LoadRecorder:
    """Instrument DataFrameReader.parquet to log fixture-table reads."""

    def __init__(self) -> None:
        self.tables: set[str] = set()

    def __enter__(self):
        from pyspark.sql.readwriter import DataFrameReader

        self._orig = DataFrameReader.parquet
        rec = self

        def parquet(reader, *paths, **kw):
            for p in paths:
                t = _table_of(str(p))
                if t:
                    rec.tables.add(t)
            return rec._orig(reader, *paths, **kw)

        DataFrameReader.parquet = parquet
        return self

    def __exit__(self, *exc):
        from pyspark.sql.readwriter import DataFrameReader

        DataFrameReader.parquet = self._orig
        return False


def extract(spark, name: str, qfn, sf: str) -> dict:
    with _LoadRecorder() as rec:
        df = qfn(spark, sf)
        explained = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    scan = scan_readership(explained)
    loads = sorted(rec.tables)
    opaque = sorted(t for t in rec.tables if t not in scan)
    return {
        "scan": {t: sorted(c) for t, c in sorted(scan.items())},
        "loads": loads,
        "opaque": opaque,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--write", action="store_true", help=f"write {OUT_PATH}")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    spark = get_session("readership")
    # widen truncation well past the widest fixture table (11 cols) so a
    # Scan block's Output list is never elided to "... N more fields"
    spark.conf.set("spark.sql.debug.maxToStringFields", "200")
    reg = queries()
    names = args.names or list(reg)
    result: dict[str, dict] = {}
    n_err = 0
    for name in names:
        try:
            result[name] = extract(spark, name, reg[name], args.sf)
        except Exception as ex:  # noqa: BLE001 — survey tool: record & continue
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:120]}")
            result[name] = {"scan": {}, "loads": [], "opaque": [], "err": str(ex)[:200]}
            n_err += 1
            continue
        r = result[name]
        tagged = [
            t + ("(opaque)" if t in r["opaque"] else f"[{len(r['scan'].get(t, []))}c]")
            for t in r["loads"]
        ]
        print(f"OK   {name}: {' '.join(tagged) or '-'}")
    if args.write:
        OUT_PATH.write_text(
            json.dumps({"sf": args.sf, "queries": result}, indent=1, sort_keys=True)
            + "\n"
        )
        print(f"wrote {OUT_PATH} ({len(result)} queries, {n_err} errors)")
    return 1 if n_err else 0


if __name__ == "__main__":
    raise SystemExit(main())
