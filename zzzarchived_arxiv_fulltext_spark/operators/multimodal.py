"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages. The
container ships no image/audio libraries, so the decode kernels are
STUBBED: format sniffing, batch shapes, schemas, partitioning and the
UDF plumbing are real and tested; the pixel/sample math raises
``NotImplementedError`` unless the optional dependency imports, with a
deterministic fake (hash-derived features) for tests and fixtures.
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


def sniff_format(payload: Optional[bytes]) -> Optional[str]:
    if not payload:
        return None
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def _decode_real(payload: bytes):  # pragma: no cover - env has no PIL
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires pillow, which this environment "
            "does not ship; use deterministic_fake=True"
        ) from exc
    raise NotImplementedError("decode kernel not wired in this build")


def _fake_feature(payload: bytes) -> list:
    """Deterministic stand-in feature: md5-derived unit-scale floats.

    Stands in for an embedding/pooled-pixels vector so the Spark-side
    plumbing (schema, batching, joins against embeddings) is fully
    exercisable without pixel libraries.
    """
    h = hashlib.md5(payload).digest()
    return [((h[i % 16] / 255.0) * 2 - 1) for i in range(FEATURE_DIM)]


def extract_media_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """binary payloads → per-media features via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, fmts, status = [], [], []
            for payload in pdf["payload"]:
                data = bytes(payload) if payload is not None else b""
                fmts.append(sniff_format(data))
                if not data:
                    feats.append(None)
                    status.append("empty")
                elif deterministic_fake:
                    feats.append(_fake_feature(data))
                    status.append("fake_decode")
                else:
                    try:
                        feats.append(_decode_real(data))
                        status.append("decoded")
                    except NotImplementedError:
                        feats.append(None)
                        status.append("decoder_unavailable")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0
                ).astype("int64"),
                "sniffed_format": fmts,
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


def synth_media_table(spark, docs: DataFrame) -> DataFrame:
    """Deterministic fake media payloads for fixture docs (test helper)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("img://"), F.col("doc_id")).alias("media_ref"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("media_type"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(b"\x89PNG\r\n\x1a\n"),
                     F.encode(F.col("doc_id").cast("string"), "utf-8")),
        ).otherwise(
            F.concat(F.lit(b"ID3"),
                     F.encode(F.col("doc_id").cast("string"), "utf-8"))
        ).alias("payload"),
    )
