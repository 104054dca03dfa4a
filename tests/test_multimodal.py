"""Multimodal tests: header decode is real (pure-Python PNG/JPEG/GIF
byte-structure parse); the feature vector is the documented
deterministic embedding stand-in."""

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.multimodal import (
    decode_image_header,
    extract_media_features,
    jpeg_header,
    png_header,
    sample_frames,
    sniff_format,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    return synth_media_table(spark, docs)


def test_sniff_format_magic_bytes():
    assert sniff_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0...") == "jpeg"
    assert sniff_format(b"ID3\x04tag") == "mp3"
    assert sniff_format(b"garbage") == "unknown"
    assert sniff_format(b"") is None
    assert sniff_format(None) is None


def test_png_header_decode():
    hdr = decode_image_header(png_header(640, 480, 8) + b"trailing")
    assert hdr == {"width": 640, "height": 480, "bit_depth": 8}
    hdr16 = decode_image_header(png_header(1024, 768, 16))
    assert hdr16 == {"width": 1024, "height": 768, "bit_depth": 16}
    # truncated / corrupt headers fail cleanly
    assert decode_image_header(b"\x89PNG\r\n\x1a\n\x00\x00") is None
    assert decode_image_header(b"\x89PNG\r\n\x1a\n" + b"x" * 20) is None


def test_jpeg_header_decode_walks_segments():
    hdr = decode_image_header(jpeg_header(1280, 720) + b"garbage")
    assert hdr == {"width": 1280, "height": 720, "bit_depth": 8}
    # SOI with no SOF
    assert decode_image_header(b"\xff\xd8\xff\xd9") is None
    assert decode_image_header(b"\xff\xd8zz") is None


def test_gif_header_decode():
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(
        2, "little") + bytes([0xF7]) + b"\x00\x00"
    assert decode_image_header(gif) == {
        "width": 320, "height": 200, "bit_depth": 8}
    assert decode_image_header(b"GIF89a\x01") is None


def test_wav_header_decode():
    from zzzarchived_arxiv_fulltext_spark.operators.multimodal import (
        decode_audio_header,
        wav_header,
    )

    hdr = decode_audio_header(wav_header(2, 44100) + b"datatrailing")
    assert hdr == {"channels": 2, "sample_rate": 44100, "bit_depth": 16}
    # a JUNK chunk before fmt is walked over (word-aligned)
    wav = (b"RIFF" + (99).to_bytes(4, "little") + b"WAVE"
           + b"JUNK" + (3).to_bytes(4, "little") + b"abc\x00"
           + wav_header(1, 8000)[12:])
    assert decode_audio_header(wav)["sample_rate"] == 8000
    assert decode_audio_header(b"RIFF\x00\x00\x00\x00AVI ") is None
    assert decode_audio_header(b"not riff") is None


def test_mp4_header_decode():
    from zzzarchived_arxiv_fulltext_spark.operators.multimodal import (
        decode_video_header,
        mp4_header,
    )

    hdr = decode_video_header(mp4_header(5500) + b"trailing junk")
    assert hdr["duration_ms"] == 5500 and hdr["timescale"] == 1000
    # other timescales round through correctly
    assert decode_video_header(mp4_header(1234, timescale=90000))[
        "duration_ms"] == 1234
    assert decode_video_header(b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00") \
        is None  # no moov
    assert decode_video_header(b"junk") is None


def test_feature_extraction_decodes_all_headers(media):
    rows = extract_media_features(media).collect()
    assert len(rows) == 30
    images = [r for r in rows if r["media_type"] == "image"]
    assert images
    for r in images:
        assert r["decode_status"] == "decoded"
        assert r["sniffed_format"] in ("png", "jpeg")
        assert (r["width"], r["height"]) in (
            (640, 480), (800, 600), (1024, 768), (1280, 720))
        assert r["bit_depth"] in (8, 16)
        assert r["channels"] is None and r["duration_ms"] is None
    audio = [r for r in rows if r["media_type"] == "audio"]
    assert audio
    for r in audio:
        assert r["decode_status"] == "decoded"
        assert r["sniffed_format"] == "riff"
        assert r["channels"] in (1, 2)
        assert r["sample_rate"] in (8000, 16000, 44100, 48000)
        assert r["bit_depth"] == 16 and r["width"] is None
    video = [r for r in rows if r["media_type"] == "video"]
    assert video
    for r in video:
        assert r["decode_status"] == "decoded"
        assert r["sniffed_format"] == "mp4ish"
        assert r["duration_ms"] >= 1000 and r["duration_ms"] % 500 == 0
        assert r["width"] is None and r["channels"] is None
    assert all(len(r["feature"]) == 16 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic: same payload → same feature
    again = {(r["doc_id"]): r["feature"]
             for r in extract_media_features(media).collect()}
    assert all(again[r["doc_id"]] == r["feature"] for r in rows)


def test_empty_payload_status(spark):
    df = spark.createDataFrame(
        [("d1", "ref1", "image", None)],
        "doc_id string, media_ref string, media_type string, payload binary",
    )
    row = extract_media_features(df).collect()[0]
    assert row["decode_status"] == "empty"
    assert row["feature"] is None and row["n_bytes"] == 0


def test_frame_sampling(media):
    frames = sample_frames(media, every_nth=5, max_frames=4)
    rows = frames.collect()
    assert rows and all(r["frame_index"] % 5 == 0 for r in rows)
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_ref"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 5, 10, 15] for v in per_media.values())
