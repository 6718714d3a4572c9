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


def make_synthetic_oplog_stream_source(total_rows: int = 1000, batch_rows: int = 200):
    """Streaming twin: a self-contained DataSource whose
    SimpleDataSourceStreamReader serves the SAME deterministic oplog in
    offset-tracked micro-batches (read → (rows, nextOffset); Spark
    checkpoints the offsets — the resume-token contract, again, but
    through the API a pure-Python connector actually implements). Emits
    ``batch_rows`` per trigger until ``total_rows``, then reports no new
    data. Same by-value pickling rule as the batch factory."""
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    epoch = EPOCH_2024

    class SyntheticOplogStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.total = int(options.get("total_rows", total_rows))
            self.batch = int(options.get("batch_rows", batch_rows))

        def initialOffset(self):
            return {"pos": 0}

        def _rows(self, lo, hi):
            # a LIST, not a generator: the runtime pickles the prefetched
            # rows into its offset cache for readBetweenOffsets replay
            out = []
            for seq in range(lo, hi):
                key = seq % 50
                if seq % 10 == 0:
                    op = "d"
                elif seq % 10 == 1:
                    op = "c"
                else:
                    op = "u"
                out.append((seq, key, op, (seq * 31 % 997) / 10.0, epoch + seq))
            return out

        def read(self, start):
            lo = start["pos"]
            hi = min(lo + self.batch, self.total)
            # iter() over a concrete list: the runtime requires an
            # iterator here but pickles the underlying prefetched rows
            return iter(self._rows(lo, hi)), {"pos": hi}

        def readBetweenOffsets(self, start, end):
            return iter(self._rows(start["pos"], end["pos"]))

        def commit(self, end):
            pass  # offsets live in Spark's checkpoint WAL

    class SyntheticOplogStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_oplog_stream"

        def schema(self):
            return OPLOG_SCHEMA

        def simpleStreamReader(self, schema):
            return SyntheticOplogStreamReader(self.options)

    return SyntheticOplogStreamSource


def make_pushdown_oplog_source():
    """Batch source with FILTER PUSHDOWN (DataSourceReader.pushFilters,
    Spark 4.1): seq-range predicates are accepted, recorded, and used to
    PRUNE input partitions before any row is generated — the custom-
    connector equivalent of parquet row-group skipping. Unsupported
    filters are returned to Spark for post-scan evaluation, so semantics
    never depend on what the source happens to handle. Same by-value
    pickling rule as the other factories."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        GreaterThanOrEqual,
        InputPartition,
        LessThan,
    )

    epoch = EPOCH_2024

    class PushdownOplogReader(DataSourceReader):
        def __init__(self, options):
            self.n_parts = int(options.get("partitions", 4))
            self.rows_per_part = int(options.get("rows_per_partition", 250))
            self.seq_lo = 0
            self.seq_hi = self.n_parts * self.rows_per_part

        def pushFilters(self, filters):
            # Iterate EAGERLY and return a list: a generator body only runs
            # if Spark drains it before calling partitions(), and the API
            # contract doesn't promise that order — under a lazier runtime
            # the seq_lo/seq_hi mutations (and so partition pruning) would
            # silently vanish.
            unsupported = []
            for f in filters:
                if isinstance(f, GreaterThanOrEqual) and f.attribute == ("seq",):
                    self.seq_lo = max(self.seq_lo, int(f.value))
                elif isinstance(f, LessThan) and f.attribute == ("seq",):
                    self.seq_hi = min(self.seq_hi, int(f.value))
                else:
                    unsupported.append(f)  # unhandled → Spark evaluates post-scan
            return unsupported

        def partitions(self):
            # prune whole partitions whose seq range misses the bounds
            parts = []
            for i in range(self.n_parts):
                lo, hi = i * self.rows_per_part, (i + 1) * self.rows_per_part
                if hi > self.seq_lo and lo < self.seq_hi:
                    parts.append(InputPartition((i, self.seq_lo, self.seq_hi)))
            return parts or [InputPartition((0, 0, 0))]  # empty scan

        def read(self, partition):
            i, seq_lo, seq_hi = partition.value
            base = i * self.rows_per_part
            for j in range(self.rows_per_part):
                seq = base + j
                if not (seq_lo <= seq < seq_hi):
                    continue  # residual within the surviving partition
                key = seq % 50
                if seq % 10 == 0:
                    op = "d"
                elif seq % 10 == 1:
                    op = "c"
                else:
                    op = "u"
                yield (seq, key, op, (seq * 31 % 997) / 10.0, epoch + seq)

    class PushdownOplogDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synthetic_oplog_pushdown"

        def schema(self):
            return OPLOG_SCHEMA

        def reader(self, schema):
            return PushdownOplogReader(self.options)

    return PushdownOplogDataSource
