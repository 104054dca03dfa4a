"""Multimodal plumbing tests (decode kernels stubbed, plumbing real)."""

import pytest
from pyspark.sql import functions as F

from zzzarchived_arxiv_fulltext_spark.operators.multimodal import (
    extract_media_features,
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


def test_feature_extraction_plumbing(media):
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    png = [r for r in rows if r["sniffed_format"] == "png"]
    assert png and all(len(r["feature"]) == 16 for r in png)
    assert all(r["decode_status"] == "fake_decode" for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic: same payload → same feature
    again = {(r["doc_id"]): r["feature"]
             for r in extract_media_features(media).collect()}
    assert all(again[r["doc_id"]] == r["feature"] for r in rows)


def test_real_decoder_is_cleanly_stubbed(media, spark):
    rows = extract_media_features(media, deterministic_fake=False).collect()
    assert all(r["decode_status"] == "decoder_unavailable" for r in rows)
    assert all(r["feature"] is None for r in rows)
    assert all(r["sniffed_format"] is not None for r in rows)  # sniff still real


def test_frame_sampling(media):
    frames = sample_frames(media, every_nth=5, max_frames=4)
    rows = frames.collect()
    assert rows and all(r["frame_index"] % 5 == 0 for r in rows)
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_ref"], []).append(r["frame_index"])
    assert all(sorted(v) == [0, 5, 10, 15] for v in per_media.values())
