"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages.

The header decode is REAL: PNG IHDR / JPEG SOF / GIF logical-screen
parsing in pure Python (no pixel libraries needed) yields width,
height and bit depth for image payloads. Only the pixel/sample math
(full raster decode) is out of scope for this container — the feature
vector is a deterministic md5-derived stand-in for an embedding, with
an engine-portable definition (hash of the payload's lowercase hex
encoding) so DuckDB oracles can reproduce it byte-for-byte.
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
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                fmts.append(sniff_format(data))
                hdr = decode_image_header(data) if data else None
                widths.append(hdr["width"] if hdr else None)
                heights.append(hdr["height"] if hdr else None)
                depths.append(hdr["bit_depth"] if hdr else None)
                if not data:
                    feats.append(None)
                    status.append("empty")
                else:
                    feats.append(_fake_feature(data))
                    status.append("decoded" if hdr else "fake_decode")
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


def synth_media_table(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media payloads for fixture docs.

    ``doc_id % 3``: 0 → image (png for %6==0, jpeg otherwise, with a
    real header from :data:`VARIANT_DIMS`), 1 → audio, 2 → video.
    """
    img_payload = F.lit(None).cast("binary")
    for rem in (0, 6, 12, 18, 3, 9, 15, 21):
        hdr = _image_header_for(rem)
        img_payload = F.when(
            F.col("doc_id") % 24 == rem,
            F.concat(F.lit(hdr),
                     F.encode(F.col("doc_id").cast("string"), "utf-8")),
        ).otherwise(img_payload)
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img://"), F.col("doc_id")).alias("media_ref"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("media_type"),
        F.when(F.col("doc_id") % 3 == 0, img_payload).otherwise(
            F.concat(F.lit(b"ID3"),
                     F.encode(F.col("doc_id").cast("string"), "utf-8"))
        ).alias("payload"),
    )
