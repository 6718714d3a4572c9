"""Python DataSource API connector (Spark 4's pluggable-source seam).

``MongoChangeStreamSource`` (adapters.py) documents the production
JVM-connector wiring; THIS module is the same seam exercised through the
API Spark actually ships for pure-Python connectors: a ``DataSource``
subclass whose reader declares N input partitions and generates rows
per-partition on executors — the real parallel-scan contract (each
partition is an independent task; no driver-side row materialization).

The source synthesizes a deterministic oplog slice (seeded by pure
arithmetic on the global row index), so a DuckDB oracle can reproduce
every row from ``generate_series`` — the correctness check covers the
partitioning math (no dropped/duplicated indices across partitions) as
much as the row formula.

Everything is built inside ``make_synthetic_oplog_source`` so cloudpickle
ships the classes BY VALUE: a module-level DataSource pickles by
reference and executors then need ``import mongodb_mysql_cdc_spark``,
which only works when the driver's cwd is the repo root (the repo-wide
kernel rule — see .claude/skills/verify; this source originally failed
exactly that /tmp driver-sim check).
"""

from __future__ import annotations

try:
    import pyspark.sql.datasource  # noqa: F401

    HAVE_PYDS = True
except ImportError:  # pragma: no cover — pre-4.0 builds
    HAVE_PYDS = False

OPLOG_SCHEMA = "seq long, key long, op string, value double, ts_sec long"
EPOCH_2024 = 1_704_067_200  # 2024-01-01T00:00:00Z


def make_synthetic_oplog_source():
    """Return a self-contained DataSource class (safe to register from
    any driver cwd)."""
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    epoch = EPOCH_2024

    class SyntheticOplogReader(DataSourceReader):
        def __init__(self, options):
            self.n_parts = int(options.get("partitions", 4))
            self.rows_per_part = int(options.get("rows_per_partition", 250))

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            # executes ON AN EXECUTOR, once per partition — the scan is
            # parallel by construction; each index appears exactly once
            base = partition.value * self.rows_per_part
            for i in range(self.rows_per_part):
                seq = base + i
                key = seq % 50
                if seq % 10 == 0:
                    op = "d"
                elif seq % 10 == 1:
                    op = "c"
                else:
                    op = "u"
                yield (seq, key, op, (seq * 31 % 997) / 10.0, epoch + seq)

    class SyntheticOplogDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_oplog"

        def schema(self):
            return OPLOG_SCHEMA

        def reader(self, schema):
            return SyntheticOplogReader(self.options)

    return SyntheticOplogDataSource
