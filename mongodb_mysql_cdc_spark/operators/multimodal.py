"""Multimodal column plumbing (SURVEY.md §2.10 multimodal_cols).

Images / audio / video ride through the engine as opaque ``BinaryType``
payload columns plus a typed metadata struct — first-class in every
relational operator (join, filter, dedup-by-hash, partition) without the
engine ever interpreting the bytes. Decode / feature-extraction happens at
the edge via Arrow-batched ``mapInPandas``.

This container ships no image/audio codecs (no PIL / ffmpeg / torchaudio),
so the decode kernel is STUBBED exactly as the task mandates: calling
``decode_media`` without ``fake=True`` raises ``NotImplementedError``;
with ``fake=True`` a deterministic byte-statistics "decoder" stands in.
Everything around the kernel — output schema, Arrow batch iteration,
column pruning of the payload until the decode stage, partition
preservation (mapInPandas is narrow: no shuffle) — is real, tested, and is
the part that matters at 100 TB.

100 TB design notes:
- Payload columns live in their own parquet column chunks; any query not
  touching ``payload`` never reads those bytes (column pruning).
- ``mapInPandas`` is a narrow transformation: decode parallelism equals
  scan parallelism, no shuffle; size input splits so one Arrow batch of
  payloads fits executor memory (spark.sql.files.maxPartitionBytes, and
  spark.sql.execution.arrow.maxRecordsPerBatch for wide payloads).
- Frame sampling multiplies rows at the edge (explode AFTER decode), so
  the blow-up happens post-filter, never on the full corpus.
"""

from __future__ import annotations

from collections.abc import Iterator, Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("lang", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def with_payload(docs: DataFrame) -> DataFrame:
    """documents → media table conforming to MEDIA_SCHEMA. The UTF-8 bytes
    of ``text`` stand in for real image/audio payloads; in production this
    column arrives from the binary-file source or object-store URIs."""
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct("lang", "source", "n_chars").alias("meta"),
    )


def decode_media(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode payloads to per-item features via Arrow-batched mapInPandas.

    STUB: real codecs are absent from this container. ``fake=True`` swaps
    in a deterministic byte-statistics kernel (length / sum / mean / first /
    last byte) so the full Spark-side path — pruned input projection, Arrow
    transfer, FEATURE_SCHEMA output — executes and is testable.
    """
    if not fake:
        raise NotImplementedError(
            "no image/audio codecs in this container; pass fake=True for the "
            "deterministic byte-statistics stand-in decoder"
        )

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            byte_sum = payloads.map(lambda b: sum(b) if len(b) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "byte_sum": byte_sum.astype("int64"),
                    "byte_mean": byte_sum / n_bytes.clip(lower=1),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1).astype("int32"),
                }
            )

    # Prune to exactly the columns the kernel reads BEFORE crossing the
    # Arrow boundary — payload bytes dominate transfer cost.
    return media.select("doc_id", "media_type", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, *, frame_bytes: int = 64, stride: int = 256,
                  max_frames: int = 8) -> DataFrame:
    """Deterministic "video" frame sampling: slice fixed-size byte windows
    every ``stride`` bytes (stand-in for ffmpeg keyframe extraction). The
    row blow-up (≤ max_frames per item) happens at the edge, after any
    upstream filtering — the 100 TB-safe place for it."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out_ids, out_nos, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for k in range(max_frames):
                    off = k * stride
                    if off >= len(payload):
                        break
                    out_ids.append(doc_id)
                    out_nos.append(k)
                    out_frames.append(bytes(payload[off : off + frame_bytes]))
            yield pd.DataFrame({"doc_id": out_ids, "frame_no": out_nos, "frame": out_frames})

    return media.select("doc_id", "payload").mapInPandas(kernel, FRAME_SCHEMA)
