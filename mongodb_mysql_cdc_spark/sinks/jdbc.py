"""JDBC (MySQL) sink — the reference pipeline's literal write target:
"apply the change stream to MySQL with INSERT … ON DUPLICATE KEY UPDATE /
DELETE" (SURVEY.md §2.1 sink_jdbc, §3-C).

No MySQL server exists in this harness, so the module is factored so that
everything testable WITHOUT a database is pure and unit-tested:

- SQL text generation (``upsert_sql`` / ``delete_sql`` / ``insert_sql``)
  is pure string building over a validated identifier grammar;
- ``partition_writer`` returns the foreachPartition kernel with the
  connection factory INJECTED, so tests drive it with a recording fake
  and production passes a real DBAPI connector;
- the bulk path ``write_append`` is a thin ``df.write.format("jdbc")``
  and is exercised only when a JDBC driver jar + server are present.

Scale notes (100 TB): the upsert path is foreachPartition + executemany —
parallelism equals the DataFrame's partitioning, so repartition the delta
by key-hash to match the MySQL server's write concurrency, and size
``batch_size`` to the server's max_allowed_packet. The delta should be
RECONCILED first (one row per key — streaming.apply.reconcile); sending
raw envelopes would make row order within a partition significant.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable, Iterator, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


def quote_ident(name: str) -> str:
    """Backtick-quote a MySQL identifier; reject anything outside the
    unquoted-identifier grammar rather than attempt escaping (schema names
    come from config/DataFrame schemas, never from data — fail loudly)."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return f"`{name}`"


def insert_sql(table: str, columns: Sequence[str]) -> str:
    cols = ", ".join(quote_ident(c) for c in columns)
    marks = ", ".join("?" for _ in columns)
    return f"INSERT INTO {quote_ident(table)} ({cols}) VALUES ({marks})"


def upsert_sql(table: str, columns: Sequence[str], key_cols: Sequence[str]) -> str:
    """MySQL-dialect upsert: INSERT … ON DUPLICATE KEY UPDATE with every
    non-key column refreshed from the incoming row (VALUES() form — the
    8.0.20+ alias form needs a server-version gate; VALUES() still parses
    everywhere MySQL 5.7+)."""
    keys = set(key_cols)
    non_key = [c for c in columns if c not in keys]
    if not non_key:
        # all-key table: nothing to update — MySQL idiom for "ignore dup"
        first = quote_ident(key_cols[0])
        return f"{insert_sql(table, columns)} ON DUPLICATE KEY UPDATE {first} = {first}"
    sets = ", ".join(f"{quote_ident(c)} = VALUES({quote_ident(c)})" for c in non_key)
    return f"{insert_sql(table, columns)} ON DUPLICATE KEY UPDATE {sets}"


def delete_sql(table: str, key_cols: Sequence[str]) -> str:
    where = " AND ".join(f"{quote_ident(c)} = ?" for c in key_cols)
    return f"DELETE FROM {quote_ident(table)} WHERE {where}"


@dataclass(frozen=True)
class JdbcSinkConfig:
    """Connection + shaping config for the MySQL sink."""

    url: str  # jdbc:mysql://host:port/db
    table: str
    key_cols: tuple[str, ...] = ("key",)
    user: str = ""
    password: str = field(default="", repr=False)  # never in repr/logs
    driver: str = "com.mysql.cj.jdbc.Driver"
    batch_size: int = 1000
    op_col: str = "op"  # envelope op column routing upsert vs delete
    delete_op: str = "d"


def write_append(df: DataFrame, cfg: JdbcSinkConfig) -> None:
    """Bulk append via Spark's built-in JDBC datasource — the snapshot
    loader's bulk-insert phase. Requires the MySQL driver jar on the Spark
    classpath and a reachable server; harness-untestable by design."""
    (
        df.write.format("jdbc")
        .option("url", cfg.url)
        .option("dbtable", cfg.table)
        .option("user", cfg.user)
        .option("password", cfg.password)
        .option("driver", cfg.driver)
        .option("batchsize", str(cfg.batch_size))
        .mode("append")
        .save()
    )


def partition_writer(
    cfg: JdbcSinkConfig,
    columns: Sequence[str],
    connection_factory: Callable[[], object],
) -> Callable[[Iterator], None]:
    """Build the foreachPartition kernel applying a reconciled CDC delta:
    op == delete_op rows become DELETEs by key, everything else an upsert.

    ``connection_factory`` must return a DBAPI-2.0 connection (e.g.
    ``lambda: mysql.connector.connect(...)``); it is called once per
    partition ON THE EXECUTOR. The kernel is returned as a closure so
    cloudpickle ships it by value (same rule as every kernel in
    operators/ — a module-level function would pickle by reference and
    require the package importable on executors).

    Usage (real cluster)::

        delta = reconcile(envelopes)          # one row per key
        flat  = delta.select("key", "op", "after.*")
        flat.foreachPartition(
            partition_writer(cfg, flat.columns, connect))
    """
    columns = list(columns)
    value_cols = [c for c in columns if c != cfg.op_col]
    key_idx = [value_cols.index(k) for k in cfg.key_cols]
    up_sql = upsert_sql(cfg.table, value_cols, cfg.key_cols)
    del_sql = delete_sql(cfg.table, cfg.key_cols)
    op_col, delete_op, batch_size = cfg.op_col, cfg.delete_op, cfg.batch_size

    def write_partition(rows: Iterable) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            ups: list[tuple] = []
            dels: list[tuple] = []

            def flush() -> None:
                if ups:
                    cur.executemany(up_sql, ups)
                    ups.clear()
                if dels:
                    cur.executemany(del_sql, dels)
                    dels.clear()

            for row in rows:
                d = row.asDict() if hasattr(row, "asDict") else dict(row)
                vals = tuple(d[c] for c in value_cols)
                if d.get(op_col) == delete_op:
                    dels.append(tuple(vals[i] for i in key_idx))
                else:
                    ups.append(vals)
                if len(ups) >= batch_size or len(dels) >= batch_size:
                    flush()
            flush()
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    return write_partition


def apply_delta(
    delta: DataFrame,
    cfg: JdbcSinkConfig,
    connection_factory: Callable[[], object],
) -> None:
    """Apply a reconciled (one-row-per-key) delta to MySQL. Flag-gated
    entry point: nothing in the engine calls this unless the user wires a
    JdbcSinkConfig in — the harness default remains the parquet sink."""
    delta.foreachPartition(partition_writer(cfg, delta.columns, connection_factory))
