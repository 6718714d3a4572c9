"""The session test levers (SPARK_GRAFT_AQE / SPARK_GRAFT_SHUFFLE) exist
for the layout-invariance and cluster-shape sweeps; production defaults
must stay AQE-on and shuffle-partitions=cores. Pure-Python — no Spark."""
import importlib
import os

import pytest


@pytest.fixture()
def clean_env(monkeypatch):
    for k in ("SPARK_GRAFT_AQE", "SPARK_GRAFT_SHUFFLE", "SPARK_GRAFT_EXTRA_CONF"):
        monkeypatch.delenv(k, raising=False)
    yield monkeypatch


def test_defaults_are_production(clean_env):
    from mongodb_mysql_cdc_spark import session as s

    assert s._aqe() == "true"
    assert s.shuffle_partitions() == s.default_parallelism()


def test_extra_conf_lever(clean_env):
    from mongodb_mysql_cdc_spark import session as s

    assert s._extra_conf() == []
    clean_env.setenv(
        "SPARK_GRAFT_EXTRA_CONF",
        "spark.sql.codegen.wholeStage=false; spark.sql.parquet.enableVectorizedReader=false",
    )
    assert s._extra_conf() == [
        ("spark.sql.codegen.wholeStage", "false"),
        ("spark.sql.parquet.enableVectorizedReader", "false"),
    ]


def test_levers_take_effect(clean_env):
    from mongodb_mysql_cdc_spark import session as s

    clean_env.setenv("SPARK_GRAFT_AQE", "false")
    clean_env.setenv("SPARK_GRAFT_SHUFFLE", "1024")
    assert s._aqe() == "false"
    assert s.shuffle_partitions() == 1024
    # the shuffle lever must not touch executor-thread count
    assert s.default_parallelism() != 1024 or "SPARK_GRAFT_CPUS" in os.environ
