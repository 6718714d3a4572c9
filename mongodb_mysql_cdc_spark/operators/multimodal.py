"""Multimodal column plumbing (SURVEY.md §2.10 multimodal_cols).

Images / audio / video ride through the engine as opaque ``BinaryType``
payload columns plus a typed metadata struct — first-class in every
relational operator (join, filter, dedup-by-hash, partition) without the
engine ever interpreting the bytes. Decode / feature-extraction happens at
the edge via Arrow-batched ``mapInPandas``.

This container ships no compressed-media codecs (no PIL / ffmpeg /
torchaudio), but two uncompressed container formats ARE fully decodable
with pure ``struct``/numpy, so the decode kernel is REAL for them:

- **WAV** (RIFF): chunk-walk to ``fmt ``/``data``, read sample rate /
  channels / bit depth, compute duration and mean |PCM| amplitude;
- **BMP** (BITMAPFILEHEADER + BITMAPINFOHEADER): width / height / bpp and
  mean pixel value, honoring 4-byte row padding.

``synth_media`` manufactures genuine WAV/BMP payloads deterministically
from ``doc_id`` (the harness stand-in for an object-store media column),
which lets the decode query carry a full DuckDB oracle: the oracle
recomputes the expected features *analytically* from the generator
formulas, so any byte-layout or parsing bug becomes a value mismatch, not
just a row-count blip. Compressed codecs (JPEG/MP3/H.264...) remain
honestly out of scope: ``decode_media`` raises ``NotImplementedError``
for payloads it cannot parse. Everything around the kernels — output
schema, Arrow batch iteration, column pruning of the payload until the
decode stage, partition preservation (mapInPandas is narrow: no shuffle)
— is the part that matters at 100 TB.

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

# Unified decode output: WAV rows leave the image fields NULL and vice
# versa (one schema so the decode stage stays a single narrow pass).
DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("signal_mean", T.DoubleType()),
    ]
)

WAV_SAMPLE_RATE = 8000
BMP_HEIGHT = 4

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


def synth_media(docs: DataFrame) -> DataFrame:
    """documents → media table with REAL container-format payloads:
    even doc_ids get a PCM16 mono WAV, odd doc_ids a 24-bit BMP, each
    deterministic in ``doc_id`` (the analytic oracle recomputes the same
    values without touching bytes). Arrow-batched mapInPandas; the kernel
    is a nested function so cloudpickle ships it BY VALUE (a module-level
    kernel pickles by reference and breaks when the driver's cwd is not
    the repo root)."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import struct

        import pandas as pd

        def wav(doc_id: int) -> bytes:
            n = 64 + doc_id % 64
            sr = 8000  # WAV_SAMPLE_RATE (inlined: kernel must be self-contained)
            samples = [((doc_id * 31 + i * 17) % 2048) - 1024 for i in range(n)]
            data = struct.pack(f"<{n}h", *samples)
            return (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                + b"data" + struct.pack("<I", len(data)) + data
            )

        def bmp(doc_id: int) -> bytes:
            w, h = 4 + doc_id % 8, 4  # BMP_HEIGHT
            rowsize = (3 * w + 3) // 4 * 4
            img = bytearray()
            for y in range(h):
                row = bytearray()
                for x in range(w):
                    v = (doc_id * 7 + x * 3 + y * 13) % 256
                    row += bytes([v, v, v])
                img += row + b"\x00" * (rowsize - len(row))
            return bytes(
                b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0)
                + img
            )

        for pdf in batches:
            ids = pdf["doc_id"]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_type": ids.map(lambda d: "audio/wav" if d % 2 == 0 else "image/bmp"),
                    "payload": ids.map(lambda d: wav(int(d)) if d % 2 == 0 else bmp(int(d))),
                    "meta": [
                        {"lang": la, "source": so, "n_chars": nc}
                        for la, so, nc in zip(pdf["lang"], pdf["source"], pdf["n_chars"])
                    ],
                }
            )

    return docs.select("doc_id", "lang", "source", "n_chars").mapInPandas(
        kernel, MEDIA_SCHEMA
    )


def decode_media(media: DataFrame) -> DataFrame:
    """REAL decode of WAV/BMP payloads via Arrow-batched mapInPandas:
    chunk-walks the RIFF container / parses the BMP headers with
    ``struct`` and computes signal statistics with numpy. Payloads whose
    magic bytes match no shipped parser raise ``NotImplementedError`` —
    compressed codecs are honestly absent from this container."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def parse_wav(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE container")
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(b):
                cid, sz = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                body = b[pos + 8 : pos + 8 + sz]
                if cid == b"fmt ":
                    fmt = body
                elif cid == b"data":
                    data = body
                pos += 8 + sz + (sz & 1)  # chunks are word-aligned
            if fmt is None or data is None:
                raise ValueError("missing fmt/data chunk")
            audio_fmt, channels, sr, _rate, _block, bits = struct.unpack("<HHIIHH", fmt[:16])
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV is decodable here")
            samples = np.frombuffer(data, dtype="<i2")
            n = len(samples) // channels
            mean_abs = float(np.abs(samples.astype(np.float64)).mean())
            return sr, n, n * 1000.0 / sr, mean_abs

        def parse_bmp(b: bytes):
            if b[:2] != b"BM":
                raise ValueError("not a BMP")
            (_size, _r1, _r2, off) = struct.unpack_from("<IHHI", b, 2)
            (_hsz, w, h, _planes, bpp) = struct.unpack_from("<IiiHH", b, 14)
            if bpp != 24:
                raise NotImplementedError("only 24-bit BMP is decodable here")
            rowsize = (3 * w + 3) // 4 * 4
            img = np.frombuffer(b, dtype=np.uint8, offset=off, count=rowsize * abs(h))
            pixels = img.reshape(abs(h), rowsize)[:, : 3 * w]  # drop row padding
            return w, abs(h), float(pixels.astype(np.float64).mean())

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "media_type", "n_bytes", "width", "height",
                "sample_rate", "n_samples", "duration_ms", "signal_mean",
            )}
            for doc_id, mtype, payload in zip(pdf["doc_id"], pdf["media_type"], pdf["payload"]):
                b = bytes(payload)
                rows["doc_id"].append(int(doc_id))
                rows["media_type"].append(mtype)
                rows["n_bytes"].append(len(b))
                if b[:4] == b"RIFF":
                    sr, n, dur, mean_abs = parse_wav(b)
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["sample_rate"].append(sr)
                    rows["n_samples"].append(n)
                    rows["duration_ms"].append(dur)
                    rows["signal_mean"].append(mean_abs)
                elif b[:2] == b"BM":
                    w, h, mean_px = parse_bmp(b)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["sample_rate"].append(None)
                    rows["n_samples"].append(None)
                    rows["duration_ms"].append(None)
                    rows["signal_mean"].append(mean_px)
                else:
                    raise NotImplementedError(
                        f"no codec for media_type={mtype!r} (magic {b[:4]!r}); "
                        "only WAV and BMP are decodable in this container"
                    )
            out = pd.DataFrame(rows)
            for c in ("n_bytes", "width", "height", "sample_rate", "n_samples"):
                out[c] = pd.array(out[c], dtype="Int64")
            yield out

    # Prune to exactly the columns the kernel reads BEFORE crossing the
    # Arrow boundary — payload bytes dominate transfer cost.
    return media.select("doc_id", "media_type", "payload").mapInPandas(kernel, DECODE_SCHEMA)


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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("rs_width", T.LongType()),
        T.StructField("rs_height", T.LongType()),
        T.StructField("rs_n_bytes", T.LongType()),
        T.StructField("rs_pixel_mean", T.DoubleType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_bmp(media: DataFrame, factor: int = 2) -> DataFrame:
    """Nearest-neighbor downsample of BMP payloads by ``factor`` — the
    image-preprocessing step (thumbnail / model-input resize) of a
    multimodal pipeline, done as a REAL byte transform: parse the 24-bit
    BMP, keep every ``factor``-th pixel in both axes, RE-ENCODE a valid
    BMP payload. Arrow-batched mapInPandas, narrow (no shuffle); payload
    bytes pruned to the kernel's columns before the Arrow crossing.

    Skips non-BMP rows (a real pipeline routes per media_type); emits new
    dims, re-encoded byte size, and the resampled pixel mean so the
    transform is value-checkable without a reference image library."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def parse(b: bytes):
            (_size, _r1, _r2, off) = struct.unpack_from("<IHHI", b, 2)
            (_hsz, w, h, _planes, bpp) = struct.unpack_from("<IiiHH", b, 14)
            if bpp != 24:
                raise NotImplementedError("only 24-bit BMP is resizable here")
            rowsize = (3 * w + 3) // 4 * 4
            img = np.frombuffer(b, dtype=np.uint8, offset=off, count=rowsize * abs(h))
            return w, abs(h), img.reshape(abs(h), rowsize)[:, : 3 * w].reshape(abs(h), w, 3)

        def encode(px: "np.ndarray") -> bytes:
            h, w, _ = px.shape
            rowsize = (3 * w + 3) // 4 * 4
            img = bytearray()
            for y in range(h):
                row = px[y].tobytes()
                img += row + b"\x00" * (rowsize - len(row))
            return bytes(
                b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
                + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 2835, 2835, 0, 0
                )
            ) + bytes(img)

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "rs_width", "rs_height",
                "rs_n_bytes", "rs_pixel_mean", "resized",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"BM":
                    continue  # route: only images pass through the resizer
                w, h, px = parse(b)
                # Subsample in STORED row order (BMP bottom-up): the grid
                # anchors at the first stored row, matching the synth
                # generator's row indexing — for nearest-neighbor the
                # anchor choice is a convention, and this one keeps the
                # whole transform analytically checkable
                small = px[::factor, ::factor, :]
                out = encode(small)
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["rs_width"].append(small.shape[1])
                rows["rs_height"].append(small.shape[0])
                rows["rs_n_bytes"].append(len(out))
                rows["rs_pixel_mean"].append(float(small.astype(np.float64).mean()))
                rows["resized"].append(out)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(kernel, RESIZE_SCHEMA)


RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rs_rate", T.LongType()),
        T.StructField("rs_n_samples", T.LongType()),
        T.StructField("rs_n_bytes", T.LongType()),
        T.StructField("rs_mean_abs", T.DoubleType()),
        T.StructField("resampled", T.BinaryType()),
    ]
)


def resample_wav(media: DataFrame, factor: int = 2) -> DataFrame:
    """Decimate PCM16 WAV payloads by ``factor`` (keep every factor-th
    sample, divide the declared sample rate) and RE-ENCODE a valid RIFF
    container — the audio twin of resize_bmp: the model-input resampling
    step of a multimodal pipeline as a real byte transform. (True
    anti-aliased resampling needs a low-pass filter; plain decimation is
    the deterministic, library-free form that keeps the oracle analytic.)
    Narrow mapInPandas; non-WAV rows are routed past, not errored."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def parse(b: bytes):
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(b):
                cid, sz = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                body = b[pos + 8 : pos + 8 + sz]
                if cid == b"fmt ":
                    fmt = body
                elif cid == b"data":
                    data = body
                pos += 8 + sz + (sz & 1)
            (_afmt, ch, sr, _bps, _ba, bits) = struct.unpack_from("<HHIIHH", fmt, 0)
            if bits != 16 or ch != 1:
                raise NotImplementedError("only mono PCM16 WAV is resampleable here")
            return sr, np.frombuffer(data, dtype="<i2")

        def encode(sr: int, samples: "np.ndarray") -> bytes:
            data = samples.astype("<i2").tobytes()
            return (
                b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                + b"data" + struct.pack("<I", len(data)) + data
            )

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "rs_rate",
                "rs_n_samples", "rs_n_bytes", "rs_mean_abs", "resampled",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"RIFF":
                    continue
                sr, samples = parse(b)
                small = samples[::factor]
                out = encode(sr // factor, small)
                rows["doc_id"].append(int(doc_id))
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(len(samples))
                rows["rs_rate"].append(sr // factor)
                rows["rs_n_samples"].append(len(small))
                rows["rs_n_bytes"].append(len(out))
                rows["rs_mean_abs"].append(
                    float(np.abs(small.astype(np.float64)).mean())
                )
                rows["resampled"].append(out)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(kernel, RESAMPLE_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("grid_mean", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)


def phash_bmp(media: DataFrame) -> DataFrame:
    """16-bit average-hash of BMP payloads (the embedding-free perceptual
    near-dup key for images): parse the REAL byte container, take the
    top-left 4×4 luminance crop (every harness BMP is ≥4 wide, exactly 4
    tall), threshold each pixel against the crop mean, pack the bits in
    file-row order. Arrow-batched mapInPandas, narrow (no shuffle);
    payloads pruned to the kernel's columns before the Arrow crossing.

    Bit order is FILE row order (the generator writes row y first, so
    file row r == generator y) — pinned here because the oracle
    recomputes the same bits analytically."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import struct

        import pandas as pd

        def one(b: bytes):
            (_size, _r1, _r2, off) = struct.unpack_from("<IHHI", b, 2)
            (_hsz, w, h, _planes, bpp) = struct.unpack_from("<IiiHH", b, 14)
            if bpp != 24:
                raise NotImplementedError("only 24-bit BMP is hashable here")
            rowsize = (3 * w + 3) // 4 * 4
            px = [
                b[off + r * rowsize + x * 3]  # grayscale: B==G==R, take B
                for r in range(4)
                for x in range(4)
            ]
            mean = sum(px) / 16.0
            phash = 0
            for k, v in enumerate(px):
                if v > mean:
                    phash |= 1 << k
            return w, mean, phash

        for pdf in batches:
            out = {"doc_id": [], "width": [], "grid_mean": [], "phash": []}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "image/bmp":
                    continue
                w, mean, ph = one(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["width"].append(int(w))
                out["grid_mean"].append(mean)
                out["phash"].append(ph)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        kernel, PHASH_SCHEMA
    )


AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Signal features from REAL WAV bytes (RMS energy, peak amplitude,
    strict zero-crossing count — the speech/music discriminators an audio
    curation pass gates on): RIFF chunk-walk to the data chunk, int16
    decode, numpy reductions. All integer partial sums stay below 2^53,
    so RMS is fp-exact against an analytic recomputation. Crossing rule
    pinned as product<0 (strict sign change; zeros break runs). Narrow
    mapInPandas — no shuffle."""

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterable["pd.DataFrame"]:
        import struct

        import numpy as np
        import pandas as pd

        def one(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                raise ValueError("not a WAV")
            pos = 12
            while pos + 8 <= len(b):
                cid, sz = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
                if cid == b"data":
                    v = np.frombuffer(b, dtype="<i2", offset=pos + 8, count=sz // 2)
                    v64 = v.astype(np.int64)
                    rms = float(np.sqrt(np.sum(v64 * v64) / len(v64)))
                    zc = int(np.sum(v64[:-1] * v64[1:] < 0))
                    return len(v64), rms, int(np.max(np.abs(v64))), zc
                pos += 8 + sz + (sz & 1)
            raise ValueError("no data chunk")

        for pdf in batches:
            out = {
                "doc_id": [], "n_samples": [], "rms": [], "peak": [],
                "zero_crossings": [],
            }
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                if mt != "audio/wav":
                    continue
                n, rms, peak, zc = one(bytes(payload))
                out["doc_id"].append(int(doc_id))
                out["n_samples"].append(n)
                out["rms"].append(rms)
                out["peak"].append(peak)
                out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        kernel, AUDIO_FEAT_SCHEMA
    )
