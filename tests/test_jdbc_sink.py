"""sink_jdbc unit tests — SQL text goldens + the foreachPartition kernel
driven with a recording fake connection (no MySQL exists in the harness;
SURVEY §2.1 documents the parquet stand-in)."""

from __future__ import annotations

import pytest

from mongodb_mysql_cdc_spark.sinks.jdbc import (
    JdbcSinkConfig,
    delete_sql,
    insert_sql,
    partition_writer,
    quote_ident,
    upsert_sql,
)


def test_sql_text_goldens():
    assert (
        insert_sql("events_state", ["key", "ts", "value"])
        == "INSERT INTO `events_state` (`key`, `ts`, `value`) VALUES (?, ?, ?)"
    )
    assert upsert_sql("events_state", ["key", "ts", "value"], ["key"]) == (
        "INSERT INTO `events_state` (`key`, `ts`, `value`) VALUES (?, ?, ?)"
        " ON DUPLICATE KEY UPDATE `ts` = VALUES(`ts`), `value` = VALUES(`value`)"
    )
    assert (
        delete_sql("events_state", ["key"]) == "DELETE FROM `events_state` WHERE `key` = ?"
    )
    assert delete_sql("t", ["a", "b"]) == "DELETE FROM `t` WHERE `a` = ? AND `b` = ?"
    # all-key table degenerates to the MySQL ignore-duplicate idiom
    assert upsert_sql("t", ["a", "b"], ["a", "b"]).endswith(
        "ON DUPLICATE KEY UPDATE `a` = `a`"
    )


def test_identifier_validation_rejects_injection():
    for bad in ["a;drop table x", "a`b", "1col", "a b", ""]:
        with pytest.raises(ValueError):
            quote_ident(bad)


class _FakeCursor:
    def __init__(self, log):
        self.log = log

    def executemany(self, sql, rows):
        self.log.append((sql, [tuple(r) for r in rows]))


class _FakeConn:
    def __init__(self, log):
        self.log = log
        self.committed = self.rolled_back = self.closed = False

    def cursor(self):
        return _FakeCursor(self.log)

    def commit(self):
        self.committed = True

    def rollback(self):
        self.rolled_back = True

    def close(self):
        self.closed = True


def test_partition_writer_routes_upserts_and_deletes():
    cfg = JdbcSinkConfig(
        url="jdbc:mysql://db:3306/app", table="events_state",
        key_cols=("key",), batch_size=2,
    )
    log, conns = [], []

    def factory():
        c = _FakeConn(log)
        conns.append(c)
        return c

    kernel = partition_writer(cfg, ["op", "key", "value"], factory)
    kernel(
        iter(
            [
                {"op": "u", "key": 1, "value": 10.0},
                {"op": "c", "key": 2, "value": 20.0},
                {"op": "d", "key": 3, "value": None},
                {"op": "u", "key": 4, "value": 40.0},
            ]
        )
    )

    up = upsert_sql("events_state", ["key", "value"], ["key"])
    de = delete_sql("events_state", ["key"])
    # batch_size=2 flushes the first two upserts together, remainder at end
    assert log == [
        (up, [(1, 10.0), (2, 20.0)]),
        (up, [(4, 40.0)]),
        (de, [(3,)]),
    ]
    (conn,) = conns
    assert conn.committed and conn.closed and not conn.rolled_back


def test_partition_writer_rolls_back_on_failure():
    cfg = JdbcSinkConfig(url="jdbc:mysql://db/app", table="t", key_cols=("key",))

    class _Boom(_FakeConn):
        def cursor(self):
            raise RuntimeError("server gone")

    conns = []

    def factory():
        c = _Boom([])
        conns.append(c)
        return c

    kernel = partition_writer(cfg, ["op", "key"], factory)
    with pytest.raises(RuntimeError):
        kernel(iter([{"op": "u", "key": 1}]))
    (conn,) = conns
    assert conn.rolled_back and conn.closed and not conn.committed
