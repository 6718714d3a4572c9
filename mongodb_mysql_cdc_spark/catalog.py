"""Table catalog: declared schemas + loaders for the harness parquet tables.

Schemas are DECLARED, not inferred (SURVEY.md §1.3) — on a stream, inference
is unsafe; on a 100 TB batch read it costs a footer-listing pass. Parquet
footers still win for batch reads (column pruning + predicate pushdown are
driven by the footer), so ``load`` reads without forcing the schema but
``SCHEMAS`` is the contract tests assert against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Dimension tables small enough to broadcast unconditionally at ANY scale
# factor — region/nation are bounded by the world (5 / 25 rows); at 100 TB
# they are still 25 rows. supplier/part/customer grow with SF and must NOT
# be assumed broadcastable; AQE decides for those.
BROADCAST_DIMS = frozenset({"region", "nation"})


def path_for(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-timezone TIMESTAMP.

    The harness parquet carries naive ``timestamp[us]`` values; depending on
    ``spark.sql.parquet.inferTimestampNTZ.enabled`` (true by default on this
    build, and we don't control the driver's session) they surface as either
    TIMESTAMP_NTZ or TIMESTAMP. Functions like ``unix_micros`` and interval
    arithmetic require TIMESTAMP, and the DuckDB oracle treats the same naive
    values as UTC — so with the session pinned to UTC this cast is a pure
    reinterpretation, identical wall-clock on both sides. Top-level columns
    only: no harness table nests timestamps inside structs/arrays.
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    if ntz:
        df = df.withColumns({c: F.col(c).cast(T.TimestampType()) for c in ntz})
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one harness table. Plain parquet read: Catalyst drives column
    pruning + predicate pushdown from whatever the caller selects/filters.

    ``events.ts`` has shipped as parquet TIMESTAMP(NANOS) (which Spark's
    vectorized reader rejects — read as raw nanos via the legacy conf and
    truncated to micros, exactly DuckDB's behavior) and, since the round-4
    regeneration, as naive ``timestamp[us]`` (TIMESTAMP_NTZ under NTZ
    inference — normalized to session-UTC TIMESTAMP). Handle both so the
    loader works against either vintage of the harness data. Truncation
    (DIV), not rounding: DIV keeps the integer math in longs; a double
    division would lose precision above 2^53 ns (~1970+104 days).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path_for(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(path_for(sf_dir, name)))


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``defaultParallelism * factor`` splits.

    Fan-out guard for small-file inputs feeding expensive downstream work:
    at sf0.1 a harness table is ONE parquet split, so a join that emits
    millions of rows per input row (interval-overlap pair emission) runs
    in a single task no matter how many cores exist. Round-robin — not
    hash-by-key — on purpose: hashing a skewed key would re-serialize the
    hot entity into one task, which is exactly the bomb being defused.
    Only safe on the PROBE side of a broadcast join (no shuffle replaced)
    or ahead of a shuffle that re-keys anyway; a no-op at real scale where
    the scan already yields hundreds of splits."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism * factor)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every harness table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
