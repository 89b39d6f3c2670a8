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
    for real blobs): content = utf-8 bytes, metadata derived.  Fans out
    (like every media producer) so downstream Arrow codec kernels stay
    parallel on compact parquet inputs (r10 single-task audit)."""
    from hotdog_spark.operators import fan_out

    df = fan_out(df)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("image").alias("media_type"),
        (F.length(F.col(text_col)) % 640).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 480).cast("int").alias("height"),
        F.lit("fake/raw").alias("format"),
    )


def decode_image(content: bytes) -> dict:
    """REAL image pixel decode (stdlib+numpy; no codec library needed).

    PNG is fully decoded — IDAT zlib inflate + per-row unfilter per the
    public PNG spec (see :func:`decode_png`) — and baseline JPEG
    (grayscale AND 3-component 4:2:0 colour) through the full entropy +
    IDCT pipeline (see :mod:`hotdog_spark.operators.jpeg`), both
    returning raw row-major interleaved samples.  Colour JPEG chroma is
    upsampled to full resolution by EXACT sample replication (an
    integer op, deterministic in every engine) and emitted as
    interleaved YCbCr — deliberately NOT converted to RGB, whose
    fixed-point rounding is implementation-defined.  Raises
    ``ValueError`` for formats that would need an external codec
    (WebP, progressive JPEG, ...), which keeps the failure loud instead
    of silently fake.
    """
    out = decode_png(content)
    if out is not None:
        return out
    if content[:2] == b"\xff\xd8":
        import numpy as np

        from hotdog_spark.operators.jpeg import decode_jpeg

        planes = decode_jpeg(content)  # raises ValueError on variants
        y = planes[0]
        h, w = y.shape
        if len(planes) == 1:
            return {
                "width": int(w),
                "height": int(h),
                "channels": 1,
                "bit_depth": 8,
                "pixels": y.tobytes(),
            }
        ups = [y] + [
            np.repeat(
                np.repeat(p, h // p.shape[0], axis=0), w // p.shape[1], axis=1
            )
            for p in planes[1:]
        ]
        return {
            "width": int(w),
            "height": int(h),
            "channels": 3,
            "bit_depth": 8,
            "pixels": np.stack(ups, axis=-1).tobytes(),
        }
    raise ValueError(
        "unsupported or malformed image payload: PNG (8-bit, "
        "non-interlaced, color types 0/2/4/6) and baseline JPEG "
        "(grayscale + 4:2:0 colour) decode with stdlib+numpy"
    )


# ---------------------------------------------------------------------------
# Real container parsers (stdlib struct/zlib — public PNG/RIFF specs).
# These are NOT stubs: they read actual bytes of the two formats and are
# exercised against synthesized-but-valid files in the registered query.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+alpha, rgba


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick the neighbor (left,
    above, upper-left) closest to a + b - c, ties broken in that order."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, raw: bytes, prior: bytes, bpp: int) -> bytes:
    """Apply PNG row filter ``ftype`` (encode side).  ``prior`` is the
    previous row's RAW (unfiltered) bytes, zeros for the first row."""
    n = len(raw)
    out = bytearray(n)
    for i in range(n):
        left = raw[i - bpp] if i >= bpp else 0
        up = prior[i]
        ul = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = raw[i]
        elif ftype == 1:
            v = raw[i] - left
        elif ftype == 2:
            v = raw[i] - up
        elif ftype == 3:
            v = raw[i] - (left + up) // 2
        elif ftype == 4:
            v = raw[i] - _paeth(left, up, ul)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[i] = v & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, filt: bytes, prior: bytes, bpp: int) -> bytes:
    """Reverse a PNG row filter (decode side) — the exact inverse of
    :func:`_filter_row`; reconstruction must go left-to-right because
    filters 1/3/4 reference already-reconstructed bytes of the same row."""
    n = len(filt)
    out = bytearray(n)
    for i in range(n):
        left = out[i - bpp] if i >= bpp else 0
        up = prior[i]
        ul = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = filt[i]
        elif ftype == 1:
            v = filt[i] + left
        elif ftype == 2:
            v = filt[i] + up
        elif ftype == 3:
            v = filt[i] + (left + up) // 2
        elif ftype == 4:
            v = filt[i] + _paeth(left, up, ul)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[i] = v & 0xFF
    return bytes(out)


def synth_png(
    width: int,
    height: int,
    bit_depth: int = 8,
    color_type: int = 6,
    pixels: bytes | None = None,
) -> bytes:
    """Build a valid PNG: signature + IHDR (correct CRC32) + IEND; when
    ``pixels`` (row-major interleaved 8-bit samples, len = w*h*channels)
    is given, a real zlib-compressed IDAT is included with row filters
    cycling 0→4 so every filter type appears in multi-row images.
    Without pixels: header-only prelude (enough for any header parser)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    chunks: list[tuple[bytes, bytes]] = [(b"IHDR", ihdr)]
    if pixels is not None:
        ch = _PNG_CHANNELS[color_type]
        if bit_depth != 8 or len(pixels) != width * height * ch:
            raise ValueError("pixels must be 8-bit row-major w*h*channels bytes")
        stride = width * ch
        # Vectorized encode-side filtering: unlike decode, every filter
        # type reads only RAW bytes (current row + prior row), so all
        # five are expressible as shifted-array arithmetic — including
        # Paeth, whose predictor select is two nested wheres.  Byte-exact
        # with the loop reference (_filter_row, kept as the decode-test
        # twin); pinned by the golden-bytes and round-trip tests.
        # sf1-measured: the per-byte Python loop here was ~half the
        # synth+decode cost of every PNG-bearing query.
        import numpy as np

        a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
        raw = a.astype(np.int16)
        left = np.zeros_like(raw)
        left[:, ch:] = raw[:, :-ch]
        up = np.zeros_like(raw)
        up[1:] = raw[:-1]
        ul = np.zeros_like(raw)
        ul[1:, ch:] = raw[:-1, :-ch]
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
        )
        preds = (
            np.zeros_like(raw),      # 0: none
            left,                    # 1: sub
            up,                      # 2: up
            (left + up) // 2,        # 3: average
            paeth,                   # 4: paeth
        )
        scan = bytearray()
        for y in range(height):
            ftype = y % 5
            scan.append(ftype)
            scan += ((raw[y] - preds[ftype][y]) % 256).astype(np.uint8).tobytes()
        chunks.append((b"IDAT", zlib.compress(bytes(scan))))
    chunks.append((b"IEND", b""))
    out = bytearray(_PNG_MAGIC)
    for tag, body in chunks:
        out += struct.pack(">I", len(body)) + tag + body
        out += struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    return bytes(out)


def decode_png(content: bytes) -> dict | None:
    """Full PNG pixel decode, stdlib-only (public PNG spec): chunk walk →
    IDAT concat → zlib inflate → per-row unfilter (all 5 filter types).
    Supports 8-bit non-interlaced color types 0/2/4/6.  Returns
    ``{width, height, channels, pixels}`` with ``pixels`` = row-major
    interleaved samples, or None for non-PNG / unsupported / corrupt
    input (parity with the reference's parse-failure routing posture,
    /root/reference/src/sink/parquet.rs:254-285 — bytes in, typed
    columns out, bad records diverted not fatal)."""
    import struct
    import zlib

    hdr = parse_png_header(content)
    if hdr is None:
        return None
    if hdr["bit_depth"] != 8 or hdr["color_type"] not in _PNG_CHANNELS:
        return None
    w, h, ch = hdr["width"], hdr["height"], _PNG_CHANNELS[hdr["color_type"]]
    # interlace byte is the 13th of IHDR (parse_png_header validated CRC)
    if content[len(_PNG_MAGIC) + 8 + 12] != 0:
        return None
    idat = bytearray()
    pos = len(_PNG_MAGIC)
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos:pos + 4])
        tag = content[pos + 4:pos + 8]
        body = content[pos + 8:pos + 8 + length]
        if len(body) != length:
            return None  # truncated
        if tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length  # len + tag + body + crc
    if not idat:
        return None
    try:
        scan = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(scan) != h * (1 + stride):
        return None
    # Row unfiltering: filters 0 (none), 2 (up) and 1 (sub — a per-lane
    # prefix sum: out[i] = filt[i] + out[i-bpp], so each of the bpp byte
    # lanes is an independent cumsum mod 256) vectorize with numpy;
    # 3 (average) and 4 (Paeth) reference already-reconstructed bytes of
    # the same row through a nonlinear predictor, so they stay on the
    # loop reference (_unfilter_row).  Byte-exact either way — pinned by
    # the round-trip and golden-bytes tests.
    import numpy as np

    pixels = bytearray()
    prior_a = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (1 + stride)
        ftype = scan[off]
        if ftype > 4:
            return None
        filt = scan[off + 1:off + 1 + stride]
        if ftype == 0:
            row_a = np.frombuffer(filt, dtype=np.uint8)
        elif ftype == 2:
            row_a = np.frombuffer(filt, dtype=np.uint8) + prior_a  # uint8 wraps
        elif ftype == 1:
            f = np.frombuffer(filt, dtype=np.uint8).reshape(-1, ch)
            row_a = np.cumsum(f, axis=0, dtype=np.int64).astype(np.uint8).reshape(-1)
        else:
            row_a = np.frombuffer(
                _unfilter_row(ftype, filt, prior_a.tobytes(), ch), dtype=np.uint8
            )
        pixels += row_a.tobytes()
        prior_a = row_a
    return {"width": w, "height": h, "channels": ch, "pixels": bytes(pixels)}


def decode_wav(content: bytes) -> dict | None:
    """WAV PCM sample decode, stdlib-only: RIFF chunk walk + ``array``
    sample extraction.  16-bit signed little-endian and 8-bit unsigned
    PCM supported.  Returns ``{sample_rate, channels, bits_per_sample,
    samples}`` — ``samples`` a flat interleaved list of ints — or None
    for non-WAV / unsupported encodings."""
    import struct
    import sys
    from array import array

    meta = parse_wav_header(content)
    if meta is None or "data_bytes" not in meta:
        return None
    bits = meta["bits_per_sample"]
    if bits not in (8, 16):
        return None
    # re-walk to find the data chunk payload (parse_wav_header keeps size only)
    pos, data = 12, None
    while pos + 8 <= len(content):
        tag = content[pos:pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
        if tag == b"data":
            data = content[pos + 8:pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if data is None or len(data) < meta["data_bytes"]:
        return None
    if bits == 16:
        a = array("h")
        a.frombytes(data[: len(data) - (len(data) % 2)])
        if sys.byteorder == "big":
            a.byteswap()
        samples = a.tolist()
    else:
        samples = list(data)  # 8-bit WAV is unsigned
    return {
        "sample_rate": meta["sample_rate"],
        "channels": meta["channels"],
        "bits_per_sample": bits,
        "samples": samples,
    }


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


def synth_avi(
    frames: list[bytes],
    width: int,
    height: int,
    usec_per_frame: int = 40_000,
) -> bytes:
    """Build a minimal valid uncompressed (DIB) AVI around raw frame
    payloads, stdlib-struct only (public AVI/RIFF spec — the video twin
    of :func:`synth_wav`): RIFF 'AVI ' → LIST hdrl (avih MainAVIHeader +
    LIST strl (strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) → LIST movi
    ('00db' chunk per frame, word-aligned) → idx1 (one AVIIF_KEYFRAME
    entry per frame, offsets relative to the movi 'movi' fourcc, the
    convention real muxers use).

    The header prelude is FIXED-SIZE (200 bytes of hdrl + 12 RIFF +
    12 movi-LIST header), so with constant frame size the f-th payload
    starts at byte ``224 + f*(8 + fs + fs%2) + 8`` — the closed form the
    frame-index oracle predicts."""
    import struct

    avih = struct.pack(
        "<14I",
        usec_per_frame,          # dwMicroSecPerFrame
        0, 0, 0x10,              # maxbytes, padding, AVIF_HASINDEX
        len(frames), 0, 1, 0,    # totalframes, initial, streams, sugbuf
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, max(1, 1_000_000 // usec_per_frame),  # scale, rate
        0, len(frames), 0, -1, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0, width * height * 3, 0, 0, 0, 0,
    )
    strl = b"strl" + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = (
        b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
        + b"LIST" + struct.pack("<I", len(strl)) + strl
    )
    movi = bytearray(b"movi")
    idx = bytearray()
    for fr in frames:
        # idx1 offsets point at the chunk fourcc, relative to 'movi'
        idx += struct.pack("<4sII", b"00db", 0x10, len(movi)) \
            + struct.pack("<I", len(fr))
        movi += b"00db" + struct.pack("<I", len(fr)) + fr
        if len(fr) & 1:
            movi += b"\x00"
    body = (
        b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
        + b"LIST" + struct.pack("<I", len(movi)) + bytes(movi)
        + b"idx1" + struct.pack("<I", len(idx)) + bytes(idx)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_header(content: bytes) -> dict | None:
    """RIFF/AVI walk → (width, height, total_frames, usec_per_frame), or
    None for non-AVI input.  Reads the MainAVIHeader from the hdrl LIST;
    tolerant of extra chunks like the WAV walker."""
    import struct

    if (
        not content
        or len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"AVI "
    ):
        return None
    pos = 12
    while pos + 8 <= len(content):
        tag = content[pos:pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
        body = content[pos + 8:pos + 8 + size]
        if tag == b"LIST" and body[:4] == b"hdrl":
            ipos = 4
            while ipos + 8 <= len(body):
                itag = body[ipos:ipos + 4]
                (isz,) = struct.unpack("<I", body[ipos + 4:ipos + 8])
                # length check, not just the declared isz: an AVI
                # truncated mid-avih would otherwise crash struct.unpack
                # instead of diverting (found by the video-signature
                # dedup truncation test)
                if itag == b"avih" and isz >= 40 and ipos + 48 <= len(body):
                    v = struct.unpack("<10I", body[ipos + 8:ipos + 48])
                    return {
                        "format": "avi",
                        "usec_per_frame": v[0],
                        "total_frames": v[4],
                        "width": v[8],
                        "height": v[9],
                    }
                ipos += 8 + isz + (isz & 1)
        pos += 8 + size + (size & 1)
    return None


def iter_avi_frames(content: bytes):
    """Demux an AVI's movi LIST: yield (frame_no, absolute_payload_offset,
    payload_size) for every video frame chunk ('00db' uncompressed /
    '00dc' compressed).  Pure index walk — never copies frame payloads,
    so indexing a multi-GB blob touches only chunk headers."""
    import struct

    if parse_avi_header(content) is None:
        return
    pos = 12
    while pos + 8 <= len(content):
        tag = content[pos:pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4:pos + 8])
        if tag == b"LIST" and content[pos + 8:pos + 12] == b"movi":
            fno, ipos, end = 0, pos + 12, pos + 8 + size
            while ipos + 8 <= end:
                itag = content[ipos:ipos + 4]
                (isz,) = struct.unpack("<I", content[ipos + 4:ipos + 8])
                if itag in (b"00db", b"00dc"):
                    yield fno, ipos + 8, isz
                    fno += 1
                ipos += 8 + isz + (isz & 1)
            return
        pos += 8 + size + (size & 1)


FRAME_INDEX_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("byte_offset", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def frame_index(df: DataFrame, every_n: int = 1) -> DataFrame:
    """REAL video frame indexing: demux each AVI payload's movi chunk
    list (:func:`iter_avi_frames` — stdlib RIFF walk, the video twin of
    the WAV path) and emit (media_id, frame_no, byte_offset, n_bytes)
    for every ``every_n``-th frame — the seek table a frame-extraction
    stage consumes.  Non-AVI / corrupt payloads produce no rows
    (corrupt-record divert posture).  Arrow-batched 1→N expansion;
    payload bytes are never copied, only chunk headers are read.

    Retires round 1-5's ``frame_sample_stub`` (frame counts faked from
    byte length) — offsets here are real file positions, golden-tested
    by slicing the original blob at [byte_offset, byte_offset+n_bytes)
    and comparing to the source frame."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "byte_offset": [], "n_bytes": []}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(blob) if blob is not None else b""
                for fno, off, sz in iter_avi_frames(blob):
                    if fno % every_n:
                        continue
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["byte_offset"].append(off)
                    rows["n_bytes"].append(sz)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(kernel, FRAME_INDEX_SCHEMA)


def synth_decodable_video(df: DataFrame, id_col: str, len_col: str) -> DataFrame:
    """Deterministic REAL AVI videos with closed-form geometry (the video
    member of the synth_decodable_media family): per row,
    w = (len%8)*2+2 (even), h = len%6+1, n_frames = len%12+2, each frame
    a constant-fill w*h*3 payload of byte ``(id*7 + frame*13) % 256`` —
    so an oracle predicts every frame offset and size arithmetically
    (see :func:`synth_avi` for the fixed 232-byte first-payload
    offset)."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, n in zip(pdf[id_col], pdf[len_col]):
                mid, n = int(mid), int(n)
                w, h = (n % 8) * 2 + 2, n % 6 + 1
                frames = [
                    bytes([(mid * 7 + f * 13) % 256]) * (w * h * 3)
                    for f in range(n % 12 + 2)
                ]
                ids.append(mid)
                blobs.append(synth_avi(frames, w, h))
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    # fan out at the producer: downstream frame/signature kernels keep
    # the parallel partitioning for free (r10 single-task audit)
    from hotdog_spark.operators import fan_out

    return fan_out(df.select(id_col, len_col)).mapInPandas(kernel, schema)


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
                meta = (
                    parse_png_header(blob) or parse_wav_header(blob)
                    or parse_avi_header(blob) or {}
                )
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


def _byte_features(content: bytes, dim: int) -> list[float]:
    """Fallback feature vector from raw bytes, for payloads in no
    decodable container format (deterministic, NOT a decode)."""
    if not content:
        return [0.0] * dim
    return [
        float(sum(content[j] for j in range(i, len(content), dim)) % 1000) / 1000.0
        for i in range(dim)
    ]


def _decoded_series(content: bytes) -> tuple[str, int, list[int]]:
    """Route bytes through the REAL decoders: PNG → (kind, channels,
    interleaved 0..255 samples); WAV → (kind, channels, PCM ints);
    anything else → ('raw', 1, byte values)."""
    png = decode_png(content)
    if png is not None:
        return "png", png["channels"], list(png["pixels"])
    wav = decode_wav(content)
    if wav is not None:
        return "wav", wav["channels"], wav["samples"]
    return "raw", 1, list(content)


def _media_features(content: bytes, dim: int) -> list[float]:
    """Feature vector from DECODED values: per-channel means (cycled to
    fill ``dim``), normalized to [0,1] for pixels and [-1,1] for PCM.
    Raw (undecodable) payloads keep the byte-stat fallback."""
    kind, ch, vals = _decoded_series(content)
    if kind == "raw":
        return _byte_features(content, dim)
    if not vals:
        return [0.0] * dim
    scale = 255.0 if kind == "png" else 32768.0
    means = []
    for c in range(ch):
        chan = vals[c::ch]
        means.append((sum(chan) / len(chan)) / scale if chan else 0.0)
    return [float(means[i % ch]) for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media content — REAL decode:
    PNG pixels (zlib inflate + unfilter) and WAV PCM samples feed
    per-channel means; undecodable payloads fall back to deterministic
    byte stats (clearly not a decode — kept so opaque blobs still get a
    stable fingerprintable vector)."""
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
                    "features": content.map(lambda b: _media_features(b or b"", dim)),
                    "checksum": content.map(
                        lambda b: sum(b or b"") % 997
                    ),
                }
            )

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("channel", IntegerType()),
        StructField("n_values", LongType()),
        StructField("sum_val", LongType()),
        StructField("min_val", LongType()),
        StructField("max_val", LongType()),
    ]
)


def decode_stats(df: DataFrame) -> DataFrame:
    """Per-channel stats over DECODED media values — the end-to-end proof
    that the codecs are real: PNG rows must survive zlib round-trip and
    all five row filters; WAV samples must re-interpret byte pairs as
    signed 16-bit PCM.  One output row per (media, channel); integer sums
    keep the oracle comparison bit-exact.  Arrow-batched mapInPandas,
    memory bounded by batch size; undecodable rows are diverted to kind
    'raw' (never fatal — the reference's corrupt-record posture,
    /root/reference/src/sink/parquet.rs:254-285)."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "kind", "channel", "n_values", "sum_val",
                "min_val", "max_val",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                kind, ch, vals = _decoded_series(bytes(blob) if blob is not None else b"")
                for c in range(ch):
                    chan = vals[c::ch]
                    rows["media_id"].append(mid)
                    rows["kind"].append(kind)
                    rows["channel"].append(c)
                    rows["n_values"].append(len(chan))
                    rows["sum_val"].append(sum(chan))
                    rows["min_val"].append(min(chan) if chan else 0)
                    rows["max_val"].append(max(chan) if chan else 0)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(kernel, DECODE_STATS_SCHEMA)


def synth_decodable_media(df: DataFrame, id_col: str, len_col: str) -> DataFrame:
    """Deterministic REAL media with closed-form content, sized for full
    decode: even ids → mono 16-bit WAV with samples
    ``((id*13 + i*7) % 4096) - 2048``; odd ids → RGBA PNG (w = len%64+1,
    h = len%48+1) with y-independent pixels ``(id*31 + c*7 + x) % 256``
    so an oracle can predict per-channel sums without iterating rows
    (row sum × h).  Row filters cycle 0→4, so decoding exercises every
    unfilter path."""
    from hotdog_spark.dist import ensure_shipped
    from hotdog_spark.operators import fan_out

    ensure_shipped(df.sparkSession)
    # Synth + the codec stages downstream are CPU-bound Python over a
    # compact parquet input (one or two splits at bench SFs): fan out so
    # the work uses every core.  No-op on naturally multi-partition
    # inputs at scale.
    df = fan_out(df)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, blobs = [], []
            for mid, n in zip(pdf[id_col], pdf[len_col]):
                mid, n = int(mid), int(n)
                if mid % 2 == 0:
                    cnt = n % 512 + 16
                    samples = (
                        (mid * 13 + np.arange(cnt, dtype=np.int64) * 7) % 4096
                    ) - 2048
                    pcm = samples.astype("<i2").tobytes()
                    blob = synth_wav(pcm, sample_rate=16000, channels=1, bits=16)
                else:
                    w, h = n % 64 + 1, n % 48 + 1
                    xs = np.repeat(np.arange(w, dtype=np.int64), 4)
                    cs = np.tile(np.arange(4, dtype=np.int64), w)
                    row = ((mid * 31 + cs * 7 + xs) % 256).astype(np.uint8).tobytes()
                    blob = synth_png(w, h, 8, 6, pixels=row * h)
                ids.append(mid)
                blobs.append(blob)
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    schema = StructType(
        [StructField("media_id", LongType()), StructField("content", BinaryType())]
    )
    return df.select(id_col, len_col).mapInPandas(kernel, schema)


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
    # the media producer pins the partitioning of every downstream codec
    # kernel: fan out here once and chunking/decode/feature stages stay
    # parallel with no further shuffles (r10 single-task audit)
    from hotdog_spark.operators import fan_out

    return fan_out(df.select(id_col, text_col, len_col)).mapInPandas(
        kernel, schema
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


_CT_FROM_CHANNELS = {1: 0, 3: 2, 2: 4, 4: 6}


def _resize_png(content: bytes, max_side: int) -> tuple[int, int, bytes] | None:
    """Nearest-neighbor PNG downscale, stdlib-only: decode (zlib inflate +
    unfilter), integer-index resample src = (dst * src_dim) // out_dim,
    re-encode via the same writer the synth/golden tests pin.  Returns
    (out_w, out_h, png_bytes) or None when content is not a decodable
    PNG (caller passes such rows through untouched)."""
    dec = decode_png(content)
    if dec is None:
        return None
    w, h, ch = dec["width"], dec["height"], dec["channels"]
    px = dec["pixels"]
    longest = max(w, h, 1)
    scale = min(1.0, max_side / longest)
    out_w = max(1, round(w * scale))
    out_h = max(1, round(h * scale))
    if (out_w, out_h) == (w, h):
        return out_w, out_h, content
    out = bytearray(out_w * out_h * ch)
    for y in range(out_h):
        sy = (y * h) // out_h
        src_row = sy * w * ch
        dst_row = y * out_w * ch
        for x in range(out_w):
            sx = (x * w) // out_w
            s = src_row + sx * ch
            d = dst_row + x * ch
            out[d:d + ch] = px[s:s + ch]
    return out_w, out_h, synth_png(
        out_w, out_h, 8, _CT_FROM_CHANNELS[ch], pixels=bytes(out)
    )


def resize_image(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize — REAL for PNG: decode → nearest-neighbor resample →
    re-encode (all stdlib; see :func:`_resize_png`).  Non-PNG/opaque
    payloads take the plumbing path: aspect-preserving target dimensions
    from the metadata columns, content passed through (formats needing an
    external codec stay untouched rather than silently faked).  Arrow-
    batched mapInPandas either way."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "out_width": [], "out_height": [], "content": []}
            for mid, w, h, blob in zip(
                pdf["media_id"], pdf["width"].fillna(0).astype(int),
                pdf["height"].fillna(0).astype(int), pdf["content"],
            ):
                raw = bytes(blob) if blob is not None else b""
                resized = _resize_png(raw, max_side)
                if resized is not None:
                    ow, oh, out = resized
                else:
                    longest = max(int(w), int(h), 1)
                    scale = min(1.0, max_side / longest)
                    ow = max(1, round(int(w) * scale))
                    oh = max(1, round(int(h) * scale))
                    out = raw
                rows["media_id"].append(mid)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["content"].append(out)
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, RESIZE_SCHEMA)


# Back-compat name from the rounds when the resample was stubbed; the
# plumbing contract is unchanged, PNG payloads now actually resample.
resize_stub = resize_image


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Every-n-th-frame sampling over REAL AVI demux: the (media_id,
    frame_no) projection of :func:`frame_index`.  Replaces the r1-r5
    ``frame_sample_stub`` whose frame counts were faked from byte
    length."""
    return frame_index(df, every_n=every_n).select("media_id", "frame_no")


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content", BinaryType()),
    ]
)


def binary_chunks(df: DataFrame, chunk_bytes: int = 256) -> DataFrame:
    """Fixed-size BINARY chunking: one input blob → N chunk rows (the
    1→N generator shape — sharding opaque payloads for transport or
    per-chunk hashing).  Format-agnostic byte windows; for AUDIO use
    :func:`audio_chunks_pcm`, which decodes first and chunks on frame
    boundaries (this byte chunker can split a 16-bit sample in half,
    which is fine for blobs and wrong for PCM).
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


PCM_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("sum_val", LongType()),
        StructField("min_val", LongType()),
        StructField("max_val", LongType()),
        StructField("peak_abs", LongType()),
        StructField("sum_sq", LongType()),
    ]
)


def audio_chunks_pcm(df: DataFrame, chunk_frames: int = 100) -> DataFrame:
    """SAMPLE-ALIGNED audio chunking over decoded PCM — the real
    utterance/window segmentation shape: each WAV payload is decoded
    (:func:`decode_wav` — RIFF walk + 16/8-bit PCM extraction, stdlib
    only), its samples grouped into FRAMES (one sample per channel), and
    split into consecutive ``chunk_frames``-frame chunks; a chunk never
    splits a frame, and the last chunk is the remainder.  Per chunk the
    kernel emits exact integer stats — sum, min, max, |peak|, Σv² (the
    integer core of RMS: rms = sqrt(sum_sq / (n_frames·channels)), left
    to the caller so every emitted column stays engine-exact).

    Undecodable / non-WAV payloads produce no rows (corrupt-record
    divert posture, /root/reference/src/sink/parquet.rs:254-285).
    Arrow-batched 1→N expansion: memory bounded by batch size, like the
    other multimodal kernels.  Replaces the byte-window stub the round-4
    review flagged (chunks were not sample-aligned)."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "chunk_idx", "n_frames", "sum_val",
                "min_val", "max_val", "peak_abs", "sum_sq",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                decoded = decode_wav(bytes(blob) if blob is not None else b"")
                if decoded is None:
                    continue  # divert, never fatal
                ch = max(1, decoded["channels"])
                samples = decoded["samples"]
                n_frames_total = len(samples) // ch
                step = chunk_frames * ch
                for idx in range(0, n_frames_total * ch, step):
                    # Clamp to whole frames: a data chunk whose byte length
                    # is not a multiple of the frame size would otherwise
                    # leak orphan partial-frame samples into the last
                    # chunk's stats while n_frames excluded that frame.
                    chunk = samples[idx: min(idx + step, n_frames_total * ch)]
                    rows["media_id"].append(mid)
                    rows["chunk_idx"].append(idx // step)
                    rows["n_frames"].append(len(chunk) // ch)
                    rows["sum_val"].append(sum(chunk))
                    rows["min_val"].append(min(chunk))
                    rows["max_val"].append(max(chunk))
                    rows["peak_abs"].append(max(abs(v) for v in chunk))
                    rows["sum_sq"].append(sum(v * v for v in chunk))
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(kernel, PCM_CHUNK_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ahash_hi", LongType()),
        StructField("ahash_lo", LongType()),
    ]
)


def image_ahash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual AVERAGE-HASH (aHash) over DECODED image pixels — the
    classic near-duplicate image fingerprint: downsample to a
    ``grid``×``grid`` brightness grid and emit one bit per cell
    (brighter than the image mean or not), so re-encoded / resized
    copies of the same picture collide on the same 64-bit hash.

    Every step is EXACT INTEGER arithmetic so an oracle can reproduce
    the hash bit-for-bit without decoding:

    - gray(x, y) = R + G + B (un-normalized integer sum; alpha ignored,
      single-channel images use the channel ×3),
    - pixel (x, y) belongs to cell (i, j) = ((grid·y)//h, (grid·x)//w),
    - bit(i, j) = 1  iff  cell_sum · (w·h) > total_sum · cell_n
      (cross-multiplied integers — no division, no floats; empty cells
      when w or h < grid contribute 0),
    - the 64 bits are emitted as TWO sub-2^32 BIGINT halves
      (``ahash_hi`` = bits 32..63, ``ahash_lo`` = bits 0..31) so neither
      engine ever touches the int64 sign bit (DuckDB errors on BIGINT
      overflow; Spark wraps — split halves sidestep both).

    Decode is the package's real stdlib PNG path (:func:`decode_png` —
    inflate + all five unfilters); undecodable rows are diverted (no
    output row — corrupt-record posture, /root/reference/src/sink/
    parquet.rs:254-285).  Arrow-batched mapInPandas, one output row per
    image: memory is bounded by batch size and the hash table downstream
    group-by is 2^64-sparse — at 100 TB the dedup reduces to a keyed
    aggregate on an 8-byte-equivalent key, the same shape as exact-hash
    dedup."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)
    # same bound as image_dhash: grid*grid bits must fit the two
    # sub-2^32 halves the cross-engine contract promises
    assert 2 <= grid <= 8, "ahash grid must keep grid*grid <= 64 bits"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "width", "height", "ahash_hi", "ahash_lo",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                dec = decode_png(bytes(blob) if blob is not None else b"")
                if dec is None:
                    continue  # divert, never fatal
                w, h, ch = dec["width"], dec["height"], dec["channels"]
                a = np.frombuffer(dec["pixels"], dtype=np.uint8)
                a = a.reshape(h, w, ch).astype(np.int64)
                if ch >= 3:
                    gray = a[:, :, 0] + a[:, :, 1] + a[:, :, 2]
                else:
                    gray = a[:, :, 0] * 3
                jj = (grid * np.arange(w)) // w
                ii = (grid * np.arange(h)) // h
                idx = (ii[:, None] * grid + jj[None, :]).ravel()
                flat = gray.ravel()
                # bincount weights are float64 but values stay integral
                # and < 2^53 (765 · w · h), so the cast back is exact.
                cs = np.bincount(idx, weights=flat, minlength=grid * grid)
                cs = cs.astype(np.int64)
                cn = np.bincount(idx, minlength=grid * grid).astype(np.int64)
                total = int(flat.sum())
                bits = (cs * (w * h)) > (total * cn)
                lo = hi = 0
                for k in range(min(32, grid * grid)):
                    if bits[k]:
                        lo |= 1 << k
                for k in range(32, grid * grid):
                    if bits[k]:
                        hi |= 1 << (k - 32)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["ahash_hi"].append(hi)
                rows["ahash_lo"].append(lo)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(kernel, AHASH_SCHEMA)


def _group_dedup(hashes, keys: list[str], skew_safe: bool = False):
    """Attach (group_n, canonical_id, is_dup) to a perceptual-hash table.

    Default shape (``skew_safe=False``): ONE unbounded window over the
    collision key — the r11 shape replacing persist + groupBy +
    join-back across all four perceptual dedups: the Python decode+hash
    pipeline evaluates ONCE with no cache write, and the only exchange
    is the window's hash partitioning.  The sf0.1 A/B (median-of-5,
    warm session) measured it 2-4x faster than the r10 persisted join
    (video 3.7 -> 1.8 s, image aHash 7.9 -> 2.1 s) and faster than the
    r9 unpersisted join (double decode), identical rows.  Skew note: a
    degenerate collision group lands in one window partition; rows
    buffer in Spark's spilling window array, so a giant duplicate
    cluster is a straggler, not an OOM.

    ``skew_safe=True`` (r11 VERDICT item 5): the corpus-scale shape for
    when one collision group can hold a meaningful fraction of the
    corpus (boilerplate thumbnails, silence audio).  The signature
    table is persisted once (decode still evaluates once), group stats
    come from a keyed aggregate — partial aggregation pre-combines the
    hot key per map task, so the exchange carries at most one row per
    (key, map partition) — and the stats attach via a join whose build
    side is one row per DISTINCT signature (broadcast when small; AQE
    skew-split otherwise).  No operator ever materializes a whole
    collision group in one task.  Costs one cache write + join vs the
    window, which is why it is a caller knob with the bench-comparable
    default rather than always-on; identical rows are pinned by a
    differential test over a 30%-degenerate corpus."""
    if skew_safe:
        from hotdog_spark.operators import track_persist

        sig = track_persist(hashes)
        stats = sig.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("group_n"),
            F.min("media_id").alias("canonical_id"),
        )
        return sig.join(stats, keys).select(
            "media_id", *keys, "group_n", "canonical_id"
        ).withColumn(
            "is_dup",
            (F.col("media_id") != F.col("canonical_id")).cast("long"),
        )

    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys)
    return hashes.select(
        "media_id",
        *keys,
        F.count(F.lit(1)).over(w).alias("group_n"),
        F.min("media_id").over(w).alias("canonical_id"),
    ).withColumn(
        "is_dup", (F.col("media_id") != F.col("canonical_id")).cast("long")
    )


def image_ahash_dedup(
    df: DataFrame, grid: int = 8, skew_safe: bool = False
) -> DataFrame:
    """aHash-keyed image dedup: hash every decodable image
    (:func:`image_ahash`), group identical hashes, and mark every
    non-canonical member (canonical = smallest media_id — the same
    deterministic choice the exact-dedup operators make).

    Plan shape at scale: one mapInPandas projection (decode + hash),
    then one windowed group attach on the two hash halves
    (:func:`_group_dedup` — single evaluation, single exchange).  No
    pairwise comparisons anywhere: like exact dedup, collisions ARE the
    candidate groups."""
    return _group_dedup(
        image_ahash(df, grid=grid), ["ahash_hi", "ahash_lo"],
        skew_safe=skew_safe,
    )


def image_dhash(df: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual DIFFERENCE-HASH (dHash) over decoded image pixels —
    the gradient sibling of :func:`image_ahash`: downsample to a
    (``grid``+1)×``grid`` brightness grid (9 columns × 8 rows at the
    default) and emit one bit per horizontal NEIGHBOR COMPARISON —
    bit(i, j) = 1 iff cell(i, j+1) is brighter than cell(i, j).  dHash
    survives global brightness/contrast shifts that flip aHash bits
    (the mean moves with the image; local gradients do not), so the two
    hashes catch different near-duplicate classes.

    Exact-integer contract (oracle-reproducible without decoding):

    - gray and cell binning as in aHash, but columns divide by grid+1:
      (x, y) → cell (i, j) = ((grid·y)//h, ((grid+1)·x)//w),
    - brighter-than = cross-multiplied mean comparison
      cs(i, j+1)·cn(i, j) > cs(i, j)·cn(i, j+1) — no division, no
      floats; any empty cell (w or h below the grid) makes both
      products 0 → bit 0,
    - grid² comparison bits packed as two sub-2^32 halves
      (``dhash_hi`` = bits 32.., ``dhash_lo`` = bits 0..31), bit
      k = i·grid + j for the j vs j+1 comparison.

    Same decode/divert posture and Arrow batch shape as
    :func:`image_ahash`; one output row per decodable image."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)
    # grid*grid comparison bits must fit the two sub-2^32 halves the
    # cross-engine contract promises: grid 9+ would overflow bit 63
    assert 2 <= grid <= 8, "dhash grid must keep grid*grid <= 64 bits"
    cols = grid + 1

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "width", "height", "dhash_hi", "dhash_lo",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                dec = decode_png(bytes(blob) if blob is not None else b"")
                if dec is None:
                    continue  # divert, never fatal
                w, h, ch = dec["width"], dec["height"], dec["channels"]
                a = np.frombuffer(dec["pixels"], dtype=np.uint8)
                a = a.reshape(h, w, ch).astype(np.int64)
                if ch >= 3:
                    gray = a[:, :, 0] + a[:, :, 1] + a[:, :, 2]
                else:
                    gray = a[:, :, 0] * 3
                jj = (cols * np.arange(w)) // w
                ii = (grid * np.arange(h)) // h
                idx = (ii[:, None] * cols + jj[None, :]).ravel()
                flat = gray.ravel()
                cs = np.bincount(idx, weights=flat, minlength=grid * cols)
                cs = cs.astype(np.int64).reshape(grid, cols)
                cn = np.bincount(idx, minlength=grid * cols)
                cn = cn.astype(np.int64).reshape(grid, cols)
                bits = cs[:, 1:] * cn[:, :-1] > cs[:, :-1] * cn[:, 1:]
                flatbits = bits.ravel()
                lo = hi = 0
                for k in range(min(32, grid * grid)):
                    if flatbits[k]:
                        lo |= 1 << k
                for k in range(32, grid * grid):
                    if flatbits[k]:
                        hi |= 1 << (k - 32)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["dhash_hi"].append(hi)
                rows["dhash_lo"].append(lo)
            yield pd.DataFrame(rows)

    staged = df.select("media_id", "content")
    return staged.mapInPandas(
        kernel,
        "media_id long, width int, height int, dhash_hi long, dhash_lo long",
    )


def image_dhash_dedup(
    df: DataFrame, grid: int = 8, skew_safe: bool = False
) -> DataFrame:
    """dHash-keyed image dedup: identical plan shape to
    :func:`image_ahash_dedup` (one Arrow projection, one windowed group
    attach — collisions ARE the candidate groups), keyed on the
    gradient hash instead of the mean hash."""
    return _group_dedup(
        image_dhash(df, grid=grid), ["dhash_hi", "dhash_lo"],
        skew_safe=skew_safe,
    )


def audio_energy_fingerprint(df: DataFrame, frame_samples: int = 16) -> DataFrame:
    """Perceptual AUDIO fingerprint over decoded PCM — the audio sibling
    of :func:`image_dhash` (and the integer skeleton of the
    Haitsma-Kalker / landmark fingerprints production systems use): cut
    the sample stream into fixed ``frame_samples`` frames, compute each
    frame's ENERGY (Σ s², exact BIGINT — 16-bit samples squared cannot
    overflow), and emit one bit per adjacent-frame comparison
    (energy rises → 1).  Re-encoded or gain-shifted-by-resampling copies
    keep their energy CONTOUR, so they collide; absolute-level changes
    that move every frame equally leave all gradient bits untouched.

    Exact-integer contract: only FULL frames count (the tail remainder
    is dropped — deterministic); comparisons are capped at 64 bits
    packed as two sub-2^32 halves (``afp_hi``/``afp_lo``, bit f =
    frame f+1 vs frame f), frames past the cap ignored; ``n_frames``
    rides along so different-length streams never collide on short
    prefixes.  Undecodable rows divert (no output row).

    One Arrow-batched projection; the dedup downstream is a keyed
    aggregate on (n_frames, hi, lo) — the exact-dedup plan class."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "n_frames", "afp_hi", "afp_lo",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                dec = decode_wav(bytes(blob) if blob is not None else b"")
                if dec is None:
                    continue  # divert, never fatal
                s = np.asarray(dec["samples"], dtype=np.int64)
                nf = len(s) // frame_samples
                if nf == 0:
                    continue
                e = (
                    (s[: nf * frame_samples] ** 2)
                    .reshape(nf, frame_samples)
                    .sum(axis=1)
                )
                bits = e[1:] > e[:-1]
                lo = hi = 0
                for f in range(min(32, len(bits))):
                    if bits[f]:
                        lo |= 1 << f
                for f in range(32, min(64, len(bits))):
                    if bits[f]:
                        hi |= 1 << (f - 32)
                rows["media_id"].append(mid)
                rows["n_frames"].append(nf)
                rows["afp_hi"].append(hi)
                rows["afp_lo"].append(lo)
            yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(
        kernel, "media_id long, n_frames long, afp_hi long, afp_lo long"
    )


def audio_fp_dedup(
    df: DataFrame, frame_samples: int = 16, skew_safe: bool = False
) -> DataFrame:
    """Energy-contour-keyed audio dedup: identical plan shape to the
    image perceptual dedups (one Arrow projection, one windowed group
    attach — collisions ARE the candidate groups)."""
    return _group_dedup(
        audio_energy_fingerprint(df, frame_samples=frame_samples),
        ["n_frames", "afp_hi", "afp_lo"],
        skew_safe=skew_safe,
    )


def video_frame_signature(df: DataFrame) -> DataFrame:
    """Per-video FRAME-CONTENT signature over the real AVI demux: walk
    the movi chunk list (:func:`iter_avi_frames`), read each frame
    payload, and emit the ordered sequence of exact per-frame byte sums
    — an integer frame checksum that depends on every payload byte, so
    the signature only matches if demux offsets, sizes and payload
    reads are all byte-exact.  (A production system would swap the
    checksum for a perceptual per-frame hash — the plumbing, ordering
    and grouping are identical; the synthetic constant-fill frames make
    any gradient-style hash degenerate, so the exact checksum is the
    honest choice here.)

    Returns (media_id, n_frames, frame_bytes, frame_sums array<long>).
    ``frame_bytes`` is the MAX frame payload size across the stream —
    order-independent and well-defined for variable-frame-size AVIs
    (for constant-size streams, like every synthetic fixture here, it
    equals the common size).  It is a coarse shape key only; the
    content key in :func:`video_signature_dedup` is the ordered
    frame-checksum signature.  Undecodable rows divert."""
    from hotdog_spark.dist import ensure_shipped

    ensure_shipped(df.sparkSession)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "n_frames", "frame_bytes", "frame_sums",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                content = bytes(blob) if blob is not None else b""
                sums, fb = [], -1
                for _fno, off, size in iter_avi_frames(content):
                    payload = content[off:off + size]
                    if len(payload) != size:
                        sums = []  # truncated frame: divert whole video
                        break
                    sums.append(sum(payload))
                    fb = max(fb, size)
                if not sums:
                    continue
                rows["media_id"].append(mid)
                rows["n_frames"].append(len(sums))
                rows["frame_bytes"].append(fb)
                rows["frame_sums"].append(sums)
            # all-diverted batches yield NOTHING: an empty frame_sums
            # column defaults to float64, which Arrow cannot convert to
            # list<long> (same guard as the KMV partials kernel)
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return df.select("media_id", "content").mapInPandas(
        kernel,
        "media_id long, n_frames long, frame_bytes long,"
        " frame_sums array<long>",
    )


def video_signature_dedup(df: DataFrame, skew_safe: bool = False) -> DataFrame:
    """Frame-signature-keyed VIDEO dedup (the video member of the
    perceptual-dedup trio with image a/dHash and the audio energy
    contour): identical content sequences collide on the md5 of the
    ordered frame-checksum string; one windowed group attach
    (:func:`_group_dedup`), the perceptual-dedup plan class."""
    sigs = video_frame_signature(df).withColumn(
        "sig",
        F.md5(
            F.concat_ws(
                ",", F.expr("transform(frame_sums, x -> CAST(x AS STRING))")
            )
        ),
    ).drop("frame_sums")
    return _group_dedup(
        sigs, ["n_frames", "frame_bytes", "sig"], skew_safe=skew_safe
    )
