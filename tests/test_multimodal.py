"""Multimodal binary-column operators: payload determinism, magic
sniffing, mapInPandas plumbing, decode stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from capstone_etl_spark.operators.multimodal import (
    FRAME_BYTES,
    binary_stats,
    decode_image,
    frame_samples,
    media_metadata,
    with_binary_payload,
)

SF_DIR = "/root/testdata/sf0.001"


def test_payload_is_deterministic_and_typed(spark):
    docs = spark.createDataFrame([(0, "abc"), (1, "xy"), (2, "q")], "doc_id long, text string")
    rows = {r.doc_id: r for r in with_binary_payload(docs).collect()}
    assert bytes(rows[0].payload) == b"IMG0abc" and rows[0].media_type == "image"
    assert bytes(rows[1].payload) == b"AUD0xy" and rows[1].media_type == "audio"
    assert bytes(rows[2].payload) == b"VID0q" and rows[2].media_type == "video"


def test_binary_stats_magic_and_fingerprint(spark):
    rows = {r.doc_id: r for r in binary_stats(spark, SF_DIR).collect()}
    r0 = rows[0]
    assert r0.magic_hex == b"IMG0".hex().upper()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    text0 = docs.filter(F.col("doc_id") == 0).collect()[0].text
    assert r0.fingerprint == hashlib.md5(b"IMG0" + text0.encode()).hexdigest()
    assert r0.n_bytes == len(text0) + 4


def test_media_metadata_schema_and_determinism(spark):
    a = media_metadata(spark, SF_DIR)
    assert a.columns == ["doc_id", "media_type", "width", "height", "duration_ms", "n_bytes"]
    r = {x.doc_id: x for x in a.collect()}
    assert all(16 <= x.width < 256 and 16 <= x.height < 256 for x in r.values())
    # images have no duration; audio/video duration scales with bytes
    for x in r.values():
        assert (x.duration_ms == 0) == (x.media_type == "image")
    # run twice → identical (pure function of bytes)
    r2 = {x.doc_id: x for x in media_metadata(spark, SF_DIR).collect()}
    assert r == r2


def test_frame_samples_one_to_many(spark):
    frames = frame_samples(spark, SF_DIR)
    stats = {r.doc_id: r for r in binary_stats(spark, SF_DIR).collect()}
    per_doc = {
        r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for doc_id, st in stats.items():
        assert per_doc[doc_id] == st.n_frames
    # every frame except possibly the last is exactly FRAME_BYTES
    short = frames.filter(F.col("frame_bytes") < FRAME_BYTES)
    last_per_doc = frames.groupBy("doc_id").agg(F.max("frame_idx").alias("mx"))
    joined = short.join(last_per_doc, "doc_id")
    assert joined.filter(F.col("frame_idx") != F.col("mx")).count() == 0


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"IMG0whatever")
