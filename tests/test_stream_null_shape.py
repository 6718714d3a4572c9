"""NULL-shape gate for the STREAMING catch-set members (round-9 verdict
item 5 → round 10).

stream_session and cdc_scd2_stream were two of the thirteen round-9
NULL-fixture catches (null-safe ghost filter; null-safe SCD2 sink joins),
but tests/test_data_shape.py deliberately excludes streaming (micro-batch
replay is too slow for the main stage). This serialized test replays a
small NULL fixture's events through the REAL foreachBatch / micro-batch
path — the registered queries stage chunks and run a live stream — and
strict-compares against the unchanged DuckDB oracles on the same files,
so the NULL contracts are pinned on real stream execution, not just the
batch-form oracle.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))

from check_strict import compare  # noqa: E402
from make_skew import build_null  # noqa: E402

from mongodb_mysql_cdc_spark.catalog import TABLES, path_for  # noqa: E402

STREAM_NULL_SUBSET = ["stream_session", "cdc_scd2_stream"]


@pytest.mark.serial
def test_stream_queries_hold_null_contract_on_live_replay(
    spark, sf_dir, tmp_path_factory
):
    null_dir = str(tmp_path_factory.mktemp("stream_shape") / "sfnull")
    build_null(spark, sf_dir, null_dir)

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = path_for(null_dir, t)
        if Path(p).is_dir():
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    bad = {}
    for name in STREAM_NULL_SUBSET:
        try:
            problems = compare(
                qs[name](spark, null_dir).toPandas(), con.sql(oracles[name]).df()
            )
        except Exception as ex:  # a crash is a finding, not a test error
            problems = [f"{type(ex).__name__}: {ex}"]
        if problems:
            bad[name] = problems[:3]
    assert not bad, bad
