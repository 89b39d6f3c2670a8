"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct, exactly like a production lakehouse layout
(content-addressed blobs + parquet metadata).  The decode/feature kernels
are Arrow-batched ``mapInPandas`` stages; the *decoders themselves* are
stubbed (no image/audio libs in this container — a deterministic fake
produces the feature vector from the raw bytes) but the Spark-side
contract — schema, batch shape, partition parallelism — is real and
tested.  Swapping the stub for PIL/torchvision is a one-function change.

Scale posture: mapInPandas streams Arrow batches, so per-executor memory
is bounded by batch size regardless of blob sizes; no collect, no driver
involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),   # image|audio|video
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("feat_dim", IntegerType()),
        StructField("features", ArrayType(FloatType())),
        StructField("checksum", LongType()),
    ]
)


def media_from_text(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a synthetic media table from text bytes (the test stand-in
    for real blobs): content = utf-8 bytes, metadata derived."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
        F.lit("fake/raw").alias("format"),
    )


def decode_image(content: bytes) -> bytes:
    """Pixel decoder stub: the container has no image libraries.

    Raises so nobody mistakes the fake features for real ones; swap in
    PIL/libvips here in a real deployment.  Container/HEADER parsing, by
    contrast, is real — see parse_png_header / parse_wav_header below
    (pure stdlib struct, no codec library needed).
    """
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; extract_features uses a deterministic fake instead"
    )


# ---------------------------------------------------------------------------
# Real container parsers (stdlib struct/zlib — public PNG/RIFF specs).
# These are NOT stubs: they read actual bytes of the two formats and are
# exercised against synthesized-but-valid files in the registered query.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def synth_png(width: int, height: int, bit_depth: int = 8, color_type: int = 6) -> bytes:
    """Build a structurally valid PNG prelude: signature + IHDR chunk with
    a correct CRC32 + IEND.  (No IDAT — enough for any header parser;
    pixel payload would need a codec.)"""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    out = bytearray(_PNG_MAGIC)
    for tag, body in ((b"IHDR", ihdr), (b"IEND", b"")):
        out += struct.pack(">I", len(body)) + tag + body
        out += struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    return bytes(out)


def synth_wav(pcm: bytes, sample_rate: int = 16000, channels: int = 1, bits: int = 16) -> bytes:
    """Build a canonical RIFF/WAVE file around raw PCM bytes (PCM fmt
    chunk + data chunk) — the exact layout `wave`-writing tools emit."""
    import struct

    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    chunks = b"WAVE"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def parse_png_header(content: bytes) -> dict | None:
    """PNG signature + IHDR → (width, height, bit_depth, color_type), or
    None when the bytes are not a PNG / the IHDR is malformed."""
    import struct
    import zlib

    if not content or not content.startswith(_PNG_MAGIC):
        return None
    buf = content[len(_PNG_MAGIC):]
    if len(buf) < 8 + 13 + 4 or buf[4:8] != b"IHDR":
        return None
    (length,) = struct.unpack(">I", buf[:4])
    if length != 13:
        return None
    body = buf[8:21]
    (crc,) = struct.unpack(">I", buf[21:25])
    if crc != (zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF):
        return None
    width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
    return {
        "format": "png",
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


def parse_wav_header(content: bytes) -> dict | None:
    """RIFF/WAVE chunk walk → (channels, sample_rate, bits_per_sample,
    data_bytes), or None for non-WAV / truncated input.  Walks the chunk
    list properly (word-aligned), so extra chunks (LIST, fact) between
    fmt and data parse fine."""
    import struct

    if (
        not content
        or len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"WAVE"
    ):
        return None
    meta: dict = {"format": "wav"}
    pos = 12
    while pos + 8 <= len(content):
        tag = content[pos:pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
        body = content[pos + 8:pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            _, channels, sample_rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            meta.update(channels=channels, sample_rate=sample_rate, bits_per_sample=bits)
        elif tag == b"data":
            meta["data_bytes"] = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    return meta if "sample_rate" in meta else None


def sniff_media_meta(df: DataFrame) -> DataFrame:
    """Magic-byte sniff + REAL header parse over binary content: PNG and
    WAV route to their stdlib parsers; anything else reports format
    'unknown' with null fields.  Arrow-batched mapInPandas — bounded
    memory per batch, no collect; columns absent for a format are null."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    cols = (
        "width", "height", "bit_depth", "color_type",
        "channels", "sample_rate", "bits_per_sample", "data_bytes",
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "format": []}
            for c in cols:
                rows[c] = []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob) if blob is not None else b""
                meta = parse_png_header(blob) or parse_wav_header(blob) or {}
                rows["media_id"].append(mid)
                rows["format"].append(meta.get("format", "unknown"))
                for c in cols:
                    rows[c].append(meta.get(c))
            yield pd.DataFrame(rows)

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("format", StringType()),
            *[StructField(c, LongType()) for c in cols],
        ]
    )
    return df.select("media_id", "content").mapInPandas(kernel, schema)


def _fake_features(content: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector derived from raw bytes."""
    if not content:
        return [0.0] * dim
    return [
        float(sum(content[j] for j in range(i, len(content), dim)) % 1000) / 1000.0
        for i in range(dim)
    ]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media content.

    The per-batch kernel is where a real decoder would run (decode →
    resize → embed); here the embed step is the deterministic fake.
    """
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "feat_dim": dim,
                    "features": content.map(lambda b: _fake_features(b or b"", dim)),
                    "checksum": content.map(
                        lambda b: sum(b or b"") % 997
                    ),
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def synthesize_media(df: DataFrame, id_col: str, text_col: str, len_col: str) -> DataFrame:
    """Deterministically build REAL container bytes per row — WAV for even
    ids (pcm = the text's utf-8 bytes), PNG for odd ids (dimensions from
    ``len_col``) — so downstream parsers exercise true format layouts.
    Arrow-batched generator, the write-side twin of sniff_media_meta."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, text, n in zip(pdf[id_col], pdf[text_col], pdf[len_col]):
                mid, n = int(mid), int(n)
                if mid % 2 == 0:
                    blob = synth_wav(
                        (text or "").encode("utf-8"),
                        sample_rate=8000 + (mid % 5) * 1000,
                        channels=1 + (mid // 2) % 2,
                        bits=16,
                    )
                else:
                    blob = synth_png(n % 640 + 1, n % 480 + 1, 8, 6)
                ids.append(mid)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return df.select(id_col, text_col, len_col).mapInPandas(kernel, schema)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_stub(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image-resize plumbing: computes the aspect-preserving target
    dimensions (longest side → ``max_side``) per row and passes content
    through.  The pixel resample itself would run here (PIL/libvips) in
    the same Arrow-batched kernel; the dimension math, schema and batch
    shape are the real contract."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].fillna(0).astype(int)
            h = pdf["height"].fillna(0).astype(int)
            longest = w.combine(h, max).clip(lower=1)
            scale = (max_side / longest).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": (w * scale).round().clip(lower=1).astype(int),
                    "out_height": (h * scale).round().clip(lower=1).astype(int),
                    "content": pdf["content"],  # real impl: resampled bytes
                }
            )

    return df.mapInPandas(kernel, RESIZE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) rows for
    frames 0, n, 2n… based on a fake duration derived from byte length.
    The real implementation would demux with pyav inside the same
    mapInPandas shape."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n_frames = (len(content or b"") % 100) + 1
                for f in range(0, n_frames, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(f)
            yield pd.DataFrame(rows)

    schema = StructType(
        [StructField("media_id", LongType()), StructField("frame_no", IntegerType())]
    )
    return df.mapInPandas(kernel, schema)


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content", BinaryType()),
    ]
)


def audio_chunk_stub(df: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Fixed-size audio chunking: one input blob → N chunk rows (the
    1→N generator shape the other multimodal kernels don't cover — frame
    extraction, utterance segmentation and sliding-window ASR all look
    like this).

    A real deployment decodes PCM/containers first (decode_image's
    NotImplementedError twin applies); the byte-window chunker below is
    the deterministic stand-in, while the Spark contract — Arrow-batched
    expansion, bounded memory per batch, chunk ordinals — is real.
    """
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, blobs = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = blob or b""
                for i in range(0, max(len(blob), 1), chunk_bytes):
                    chunk = blob[i : i + chunk_bytes]
                    ids.append(mid)
                    idxs.append(i // chunk_bytes)
                    sizes.append(len(chunk))
                    blobs.append(chunk)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": idxs,
                    "n_bytes": sizes,
                    "content": blobs,
                }
            )

    return df.select("media_id", "content").mapInPandas(kernel, AUDIO_CHUNK_SCHEMA)
