"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages.

The header decode is REAL: PNG IHDR / JPEG SOF / GIF logical-screen
parsing for images, RIFF/WAVE ``fmt `` chunk walking for audio
(channels, sample rate, bits per sample), and MP4 box walking
(``ftyp`` brand + ``moov/mvhd`` timescale/duration) for video — all
pure Python, no media libraries needed. Only the pixel/sample math
(full raster/waveform decode) is out of scope for this container —
the feature vector is a deterministic md5-derived stand-in for an
embedding, with an engine-portable definition (hash of the payload's
lowercase hex encoding) so DuckDB oracles can reproduce it
byte-for-byte.
"""

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sniffed_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_status", T.StringType(), False),
    ]
)

# magic-byte prefixes → format (real logic, no external deps)
_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),           # wav/avi/webp container
    (b"%PDF", "pdf"),
    (b"\x00\x00\x00", "mp4ish"),
    (b"ID3", "mp3"),
    (b"OggS", "ogg"),
)

FEATURE_DIM = 16

# JPEG start-of-frame markers (baseline, progressive, lossless, ...)
_JPEG_SOF = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def sniff_format(payload: Optional[bytes]) -> Optional[str]:
    if not payload:
        return None
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def decode_image_header(payload: bytes) -> Optional[dict]:
    """Parse (width, height, bit_depth) from PNG/JPEG/GIF header bytes.

    Pure-Python byte-structure parse — the real decode kernel for the
    image metadata path; returns None when the payload is not a
    parseable image header (truncated, non-image, corrupt).
    """
    try:
        if payload.startswith(b"\x89PNG\r\n\x1a\n"):
            # 8-byte signature, 4-byte length, 'IHDR', W(4BE), H(4BE),
            # bit depth, color type, ...
            if len(payload) < 26 or payload[12:16] != b"IHDR":
                return None
            return {
                "width": int.from_bytes(payload[16:20], "big"),
                "height": int.from_bytes(payload[20:24], "big"),
                "bit_depth": payload[24],
            }
        if payload.startswith(b"\xff\xd8"):
            # walk JPEG segments until a start-of-frame marker
            pos = 2
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    return None
                marker = payload[pos + 1]
                if marker in _JPEG_SOF:
                    if pos + 9 > len(payload):
                        return None
                    return {
                        "width": int.from_bytes(
                            payload[pos + 7:pos + 9], "big"),
                        "height": int.from_bytes(
                            payload[pos + 5:pos + 7], "big"),
                        "bit_depth": payload[pos + 4],
                    }
                if marker == 0xD9 or marker == 0xDA:  # EOI / SOS
                    return None
                if 0xD0 <= marker <= 0xD7 or marker == 0x01:
                    pos += 2  # bare markers carry no length
                    continue
                pos += 2 + int.from_bytes(payload[pos + 2:pos + 4], "big")
            return None
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            if len(payload) < 11:
                return None
            return {
                "width": int.from_bytes(payload[6:8], "little"),
                "height": int.from_bytes(payload[8:10], "little"),
                "bit_depth": ((payload[10] >> 4) & 0x7) + 1,
            }
    except (IndexError, ValueError):
        return None
    return None


def decode_audio_header(payload: bytes) -> Optional[dict]:
    """Parse (channels, sample_rate, bit_depth) from a RIFF/WAVE
    header: walk chunks until ``fmt ``; None when not parseable."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            size = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if cid == b"fmt " and pos + 24 <= len(payload):
                return {
                    "channels": int.from_bytes(
                        payload[pos + 10:pos + 12], "little"),
                    "sample_rate": int.from_bytes(
                        payload[pos + 12:pos + 16], "little"),
                    "bit_depth": int.from_bytes(
                        payload[pos + 22:pos + 24], "little"),
                }
            pos += 8 + size + (size & 1)  # chunks are word-aligned
    except (IndexError, ValueError):
        return None
    return None


def decode_video_header(payload: bytes) -> Optional[dict]:
    """Parse duration from an MP4: top-level box walk to ``moov``,
    inner walk to ``mvhd`` (version 0/1); None when not parseable."""
    def walk(data, start, end):
        pos = start
        while pos + 8 <= end:
            size = int.from_bytes(data[pos:pos + 4], "big")
            btype = data[pos + 4:pos + 8]
            if size < 8:
                return None
            yield btype, pos + 8, min(pos + size, end)
            pos += size

    try:
        for btype, body, bend in walk(payload, 0, len(payload)) or ():
            if btype != b"moov":
                continue
            for itype, ibody, _ in walk(payload, body, bend) or ():
                if itype != b"mvhd":
                    continue
                version = payload[ibody]
                if version == 1:
                    timescale = int.from_bytes(
                        payload[ibody + 20:ibody + 24], "big")
                    duration = int.from_bytes(
                        payload[ibody + 24:ibody + 32], "big")
                else:
                    timescale = int.from_bytes(
                        payload[ibody + 12:ibody + 16], "big")
                    duration = int.from_bytes(
                        payload[ibody + 16:ibody + 20], "big")
                if not timescale:
                    return None
                return {"duration_ms": duration * 1000 // timescale,
                        "timescale": timescale}
    except (IndexError, ValueError, TypeError):
        return None
    return None


def _fake_feature(payload: bytes) -> list:
    """Deterministic stand-in feature: md5-derived unit-scale floats.

    Stands in for an embedding/pooled-pixels vector so the Spark-side
    plumbing (schema, batching, joins against embeddings) is fully
    exercisable without pixel libraries. Hashes the LOWERCASE HEX
    encoding of the payload (not the raw bytes) so a SQL oracle can
    reproduce it: ``md5(lower(hex(payload)))`` in DuckDB.
    """
    h = hashlib.md5(payload.hex().encode("ascii")).digest()
    return [((h[i % 16] / 255.0) * 2 - 1) for i in range(FEATURE_DIM)]


def extract_media_features(media: DataFrame) -> DataFrame:
    """binary payloads → per-media features via Arrow-batched mapInPandas.

    Image payloads (png/jpeg/gif) get a real header decode
    (width/height/bit depth, ``decode_status='decoded'``); every
    non-empty payload gets the deterministic embedding stand-in
    feature (``fake_decode`` for non-image formats).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, fmts, status = [], [], []
            widths, heights, depths = [], [], []
            chans, rates, durs = [], [], []
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                fmts.append(sniff_format(data))
                img = decode_image_header(data) if data else None
                aud = decode_audio_header(data) if data else None
                vid = decode_video_header(data) if data else None
                widths.append(img["width"] if img else None)
                heights.append(img["height"] if img else None)
                depths.append((img or aud or {}).get("bit_depth"))
                chans.append(aud["channels"] if aud else None)
                rates.append(aud["sample_rate"] if aud else None)
                durs.append(vid["duration_ms"] if vid else None)
                if not data:
                    feats.append(None)
                    status.append("empty")
                else:
                    feats.append(_fake_feature(data))
                    status.append(
                        "decoded" if (img or aud or vid) else "fake_decode")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0
                ).astype("int64"),
                "sniffed_format": fmts,
                "width": pd.array(widths, dtype="Int32"),
                "height": pd.array(heights, dtype="Int32"),
                "bit_depth": pd.array(depths, dtype="Int32"),
                "channels": pd.array(chans, dtype="Int32"),
                "sample_rate": pd.array(rates, dtype="Int32"),
                "duration_ms": pd.array(durs, dtype="Int64"),
                "feature": feats,
                "decode_status": status,
            })

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame, every_nth: int = 10, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video payloads.

    Emits (doc_id, media_ref, frame_index, frame_ref) rows — the real
    decoder would attach pixel tensors; here frame refs are derived
    deterministically so downstream joins/batching are testable.
    """
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "doc_id", "media_ref",
            F.explode(idx).alias("k"),
        )
        .select(
            "doc_id", "media_ref",
            (F.col("k") * every_nth).alias("frame_index"),
            F.concat_ws("#", "media_ref",
                        (F.col("k") * every_nth).cast("string")
                        ).alias("frame_ref"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic synthetic media payloads (fixtures + driver queries).
# Image rows carry REAL PNG/JPEG headers (four size variants) so the
# header-decode path is exercised end-to-end; audio/video rows carry
# an ID3 prefix. Every payload ends with the doc_id string so hashes
# are per-row unique.
# --------------------------------------------------------------------------

# (width, height, bit_depth) variants, indexed by (doc_id % 24) // 6
VARIANT_DIMS = ((640, 480, 8), (800, 600, 8), (1024, 768, 16), (1280, 720, 16))


def png_header(width: int, height: int, bit_depth: int) -> bytes:
    """Minimal-but-real PNG signature + IHDR chunk (CRC zeroed)."""
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([bit_depth, 6, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )


def jpeg_header(width: int, height: int) -> bytes:
    """Minimal-but-real JPEG SOI + APP0(JFIF) + SOF0 (precision 8)."""
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0\x00\x11\x08"
        + height.to_bytes(2, "big") + width.to_bytes(2, "big")
        + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0


def _image_header_for(doc_id: int) -> bytes:
    w, h, d = VARIANT_DIMS[(doc_id % 24) // 6]
    if doc_id % 6 == 0:
        return png_header(w, h, d)
    return jpeg_header(w, h)  # JPEG precision is always 8 in SOF0


# audio sample-rate variants, indexed by (doc_id % 24) // 6
VARIANT_RATES = (8000, 16000, 44100, 48000)


def wav_header(channels: int, sample_rate: int,
               bits: int = 16) -> bytes:
    """Minimal-but-real RIFF/WAVE header with a full fmt chunk."""
    block_align = channels * bits // 8
    return (
        b"RIFF" + (36).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")                      # PCM
        + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )


def mp4_header(duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal-but-real MP4: ftyp box + moov/mvhd (version 0)."""
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + (0).to_bytes(4, "big")
    mvhd_body = (
        bytes(4)                                  # version 0 + flags
        + bytes(8)                                # ctime, mtime
        + timescale.to_bytes(4, "big")
        + (duration_ms * timescale // 1000).to_bytes(4, "big")
        + bytes(108 - 8 - 4 - 8 - 8)              # rate..next_track_id
    )
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    return ftyp + moov


def _audio_header_for(doc_id: int) -> bytes:
    rate = VARIANT_RATES[(doc_id % 24) // 6]
    channels = 1 if doc_id % 6 < 3 else 2
    return wav_header(channels, rate)


def _video_duration_for(doc_id: int) -> int:
    return 1000 + (doc_id % 24) * 500


def synth_media_table(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media payloads for fixture docs.

    ``doc_id % 3``: 0 → image (png for %6==0, jpeg otherwise, real
    header from :data:`VARIANT_DIMS`), 1 → audio (real RIFF/WAVE fmt
    header, rate/channel variants), 2 → video (real MP4 ftyp+mvhd,
    duration variants). Every payload ends with the doc_id string so
    hashes are per-row unique.
    """
    payload = F.lit(None).cast("binary")
    for rem in range(24):
        if rem % 3 == 0:
            hdr = _image_header_for(rem)
        elif rem % 3 == 1:
            hdr = _audio_header_for(rem)
        else:
            hdr = mp4_header(_video_duration_for(rem))
        payload = F.when(
            F.col("doc_id") % 24 == rem,
            F.concat(F.lit(hdr),
                     F.encode(F.col("doc_id").cast("string"), "utf-8")),
        ).otherwise(payload)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img://"), F.col("doc_id")).alias("media_ref"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("media_type"),
        payload.alias("payload"),
    )
