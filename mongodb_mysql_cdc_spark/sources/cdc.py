"""CDC envelope model — the Debezium-style normalization of a MongoDB
change-stream event (SURVEY.md §1.1):

    {_id: resumeToken, operationType, clusterTime, ns, documentKey,
     fullDocument, updateDescription}
      → {op, ts, key, before, after, source}

The harness has no live MongoDB, so ``events_as_envelopes`` synthesizes a
deterministic envelope stream from the ``events`` table (the driver's
designated stream table): signup→c(reate), error→d(elete), others→u(pdate),
documentKey = user_id. The mapping is pure column algebra, so a SQL oracle
can reproduce it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mongodb_mysql_cdc_spark.catalog import load

# op codes follow Debezium: c=create, u=update, d=delete (r=snapshot read)
OP_CREATE, OP_UPDATE, OP_DELETE, OP_READ = "c", "u", "d", "r"

AFTER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("k", T.LongType()),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),  # resume-token stand-in (event_id)
        T.StructField("key", T.LongType()),
        T.StructField("after", AFTER_SCHEMA),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("db", T.StringType()),
                    T.StructField("table", T.StringType()),
                ]
            ),
        ),
    ]
)


def op_for_event_type() -> F.Column:
    return (
        F.when(F.col("event_type") == "signup", OP_CREATE)
        .when(F.col("event_type") == "error", OP_DELETE)
        .otherwise(OP_UPDATE)
    )


def events_as_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic envelope DataFrame from the events table."""
    ev = load(spark, sf_dir, "events")
    return envelopes_from_events(ev)


def envelopes_from_events(ev: DataFrame) -> DataFrame:
    """The events→envelope mapping as pure column algebra (works on both
    batch and streaming DataFrames — same code path, per the Structured
    Streaming batch/stream parity argument)."""
    return ev.select(
        op_for_event_type().alias("op"),
        F.col("ts"),
        F.col("event_id").alias("seq"),
        F.col("user_id").alias("key"),
        F.struct(
            F.col("user_id"),
            F.col("event_type"),
            F.col("value"),
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        ).alias("after"),
        F.struct(F.lit("appdb").alias("db"), F.lit("events").alias("table")).alias(
            "source"
        ),
    )


# Default to_json truncates timestamps to milliseconds; the oplog's
# clusterTime is microsecond-relevant, so force a full-precision format.
_JSON_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}


def envelopes_as_json(env: DataFrame) -> DataFrame:
    """Serialize envelopes to JSON strings — the shape a Kafka topic or a
    change-stream cursor would deliver (raw bytes at the edge)."""
    return env.select(F.to_json(F.struct(*env.columns), _JSON_OPTS).alias("raw"))


def parse_envelope_json(raw: DataFrame, column: str = "raw") -> DataFrame:
    """Decode raw JSON envelopes into the typed envelope schema — the
    from_json(declared schema) crossing from dynamic to fixed types."""
    return raw.select(
        F.from_json(F.col(column), ENVELOPE_SCHEMA, _JSON_OPTS).alias("v")
    ).select("v.*")
