"""Multimodal binary-column operators: payload determinism, magic
sniffing, mapInPandas plumbing, real image decode (header parse +
optional PIL) with deterministic fallback."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from capstone_etl_spark.operators.multimodal import (
    FRAME_BYTES,
    META_SCHEMA,
    binary_stats,
    decode_image,
    extract_meta,
    frame_samples,
    media_metadata,
    with_binary_payload,
)

SF_DIR = "/root/testdata/sf0.001"


def make_png(width: int, height: int) -> bytes:
    """A real, spec-valid grayscale PNG built from the stdlib alone
    (signature + IHDR + zlib IDAT + IEND, each chunk CRC'd)."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))  # filter 0 + pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 10


def make_jpeg_header(width: int, height: int) -> bytes:
    """SOI + APP0 + SOF0 — the marker walk a dimension sniffer needs."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0


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


def test_decode_real_formats_header_path():
    assert decode_image(make_png(320, 240)) == (320, 240)
    assert decode_image(make_gif(64, 48)) == (64, 48)
    assert decode_image(make_jpeg_header(1920, 1080)) == (1920, 1080)


def test_decode_unknown_bytes_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"IMG0whatever")


def test_pil_path_when_available():
    PIL = pytest.importorskip("PIL")  # noqa: F841 - absent in this container
    # when a codec IS installed, PIL must agree with the header parse
    assert decode_image(make_png(17, 23)) == (17, 23)


def test_real_png_decodes_through_pipeline(spark):
    # A REAL PNG payload through the SAME mapInPandas stage the
    # registered query runs: true dimensions come out, duration 0;
    # synthetic junk in the same batch takes the deterministic fake.
    png = make_png(320, 240)
    df = spark.createDataFrame(
        [(1, "image", bytearray(png)), (2, "image", bytearray(b"IMG0junk"))],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r.doc_id: r for r in df.mapInPandas(extract_meta, META_SCHEMA).collect()}
    assert (rows[1].width, rows[1].height, rows[1].duration_ms) == (320, 240, 0)
    assert rows[1].n_bytes == len(png)
    # fallback row reproduces the oracle's md5 arithmetic
    h = hashlib.md5(b"IMG0junk").hexdigest()
    assert rows[2].width == 16 + int(h[:2], 16) % 240
    assert rows[2].height == 16 + int(h[2:4], 16) % 240


def _tiny_wav(n_frames=4410, rate=44100, channels=2) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * n_frames)
    return buf.getvalue()


def _tiny_mp4(width=640, height=360, timescale=1000, duration=2500) -> bytes:
    import struct as st

    def box(btype: bytes, body: bytes) -> bytes:
        return st.pack(">I", 8 + len(body)) + btype + body

    mvhd = bytes(4) + st.pack(">III", 0, 0, timescale) + st.pack(">I", duration) + bytes(80)
    tkhd = bytes(76) + st.pack(">II", width << 16, height << 16)
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd)))
    return box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def test_decode_audio_wav_header():
    from capstone_etl_spark.operators.multimodal import decode_audio

    ch, rate, dur = decode_audio(_tiny_wav())
    assert (ch, rate, dur) == (2, 44100, 100)
    with pytest.raises(NotImplementedError):
        decode_audio(b"AUD0 not really audio")


def test_decode_video_bmff_header():
    from capstone_etl_spark.operators.multimodal import decode_video

    w, h, dur = decode_video(_tiny_mp4())
    assert (w, h, dur) == (640, 360, 2500)
    with pytest.raises(NotImplementedError):
        decode_video(b"VID0 not really video")


def test_real_audio_video_decode_through_pipeline(spark):
    """Real WAV/MP4 bytes through the SAME mapInPandas stage the
    registered query runs — true header metadata comes out."""
    from capstone_etl_spark.operators.multimodal import META_SCHEMA, extract_meta

    df = spark.createDataFrame(
        [(1, "audio", bytearray(_tiny_wav())), (2, "video", bytearray(_tiny_mp4()))],
        "doc_id long, media_type string, payload binary",
    )
    rows = {r.doc_id: r for r in df.mapInPandas(extract_meta, META_SCHEMA).collect()}
    assert (rows[1].width, rows[1].height, rows[1].duration_ms) == (2, 44100, 100)
    assert (rows[2].width, rows[2].height, rows[2].duration_ms) == (640, 360, 2500)


def test_resize_geometry_preserves_aspect_and_caps(spark, sf_dir):
    """Thumbnail dims never exceed RESIZE_MAX, small media pass through
    unscaled, aspect ratio survives within integer-floor tolerance, and
    audio rows are excluded."""
    from capstone_etl_spark.operators.multimodal import RESIZE_MAX, media_resize

    rows = media_resize(spark, sf_dir).collect()
    assert rows and all(r.media_type in ("image", "video") for r in rows)
    for r in rows:
        assert 1 <= r.target_w <= max(r.width, RESIZE_MAX)
        assert 1 <= r.target_h <= max(r.height, RESIZE_MAX)
        if max(r.width, r.height) <= RESIZE_MAX:
            assert (r.target_w, r.target_h) == (r.width, r.height)
        else:
            assert max(r.target_w, r.target_h) <= RESIZE_MAX
            # integer-floor aspect: tw/th within one floor step of w/h
            assert abs(r.target_w * r.height - r.target_h * r.width) <= max(
                r.width, r.height
            )


def test_real_pixels_requires_pil_or_runs():
    """The real-resample path is LOUD about a missing codec: with PIL
    absent, media_resize(real_pixels=True) raises ImportError at call
    time (never a silent fingerprint-only run); with PIL present the
    same call must work (covered by the geometry test below)."""
    import capstone_etl_spark.operators.multimodal as mm

    if mm._PIL_Image is not None:
        pytest.skip("PIL installed — the raise branch is unreachable")
    with pytest.raises(ImportError):
        # the guard fires before any Spark work, so no session needed
        mm.media_resize(None, SF_DIR, real_pixels=True)


def test_pil_resize_digest_geometry_contract():
    """skip-if-PIL-absent: the REAL resample path decodes a spec-valid
    PNG, resamples to the requested geometry, and fingerprints the
    resized RGBA buffer — the digest must equal an independently
    computed PIL resize of the same bytes, proving the claimed
    'one-line swap' actually executes and honors (tw, th)."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    from capstone_etl_spark.operators.multimodal import pil_resize_digest

    png = make_png(100, 50)
    digest = pil_resize_digest(png, 64, 32)
    assert digest is not None
    with Image.open(io.BytesIO(png)) as im:
        expected = im.resize((64, 32))
        assert expected.size == (64, 32)
        assert digest == hashlib.md5(expected.convert("RGBA").tobytes()).hexdigest()
    # junk bytes: the real path declines and the caller falls back
    assert pil_resize_digest(b"IMG0junk", 4, 4) is None


def test_pil_resize_real_path_through_query(spark, sf_dir):
    """skip-if-PIL-absent: real_pixels=True through the registered
    mapInPandas stage — geometry columns are identical to the default
    path (the swap changes only the fingerprint source), and synthetic
    non-loadable payloads fall back to the bit-identical deterministic
    digest."""
    pytest.importorskip("PIL")
    from capstone_etl_spark.operators.multimodal import media_resize

    fake = {r.doc_id: r for r in media_resize(spark, sf_dir).collect()}
    real = {r.doc_id: r for r in media_resize(spark, sf_dir, real_pixels=True).collect()}
    assert set(fake) == set(real)
    for doc_id, f in fake.items():
        r = real[doc_id]
        assert (r.media_type, r.width, r.height, r.target_w, r.target_h) == (
            f.media_type, f.width, f.height, f.target_w, f.target_h,
        )


def test_default_resize_path_is_pil_independent(spark, sf_dir):
    """The REGISTERED query (real_pixels=False) must be bit-identical
    with or without PIL installed — its digest reads only (payload,
    geometry), never a codec. Pinned by recomputing every row's digest
    from the payload locally (the exact expression the oracle uses)."""
    from capstone_etl_spark.operators.multimodal import media_resize

    got = {r.doc_id: r for r in media_resize(spark, sf_dir).collect()}
    payloads = {
        r.doc_id: (bytes(r.payload), r.media_type)
        for r in with_binary_payload(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).collect()
        if r.media_type != "audio"
    }
    assert set(got) == set(payloads)
    for doc_id, row in got.items():
        raw, _mt = payloads[doc_id]
        expect = hashlib.md5(
            raw + f":{row.target_w}:{row.target_h}".encode()
        ).hexdigest()
        assert row.resized_md5 == expect


def make_wav(rate: int, n_frames: int, channels: int = 1) -> bytes:
    """A real PCM WAV from the stdlib alone (16-bit mono ramp)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            b"".join(
                struct.pack("<h", (i * 37) % 8000 - 4000)
                for i in range(n_frames * channels)
            )
        )
    return buf.getvalue()


def test_wav_resample_digest_real_path():
    """The stdlib real path runs unconditionally (wave + audioop are
    in this interpreter): digest equals an independent ratecv of the
    same frames, and the converted buffer has ~rate-ratio frames."""
    import io
    import wave

    audioop = pytest.importorskip("audioop")
    from capstone_etl_spark.operators.multimodal import (
        RESAMPLE_RATE_HZ,
        wav_resample_digest,
    )

    wav = make_wav(rate=8000, n_frames=800)
    digest = wav_resample_digest(wav, RESAMPLE_RATE_HZ)
    assert digest is not None
    with wave.open(io.BytesIO(wav)) as w:
        frames = w.readframes(w.getnframes())
        converted, _ = audioop.ratecv(frames, 2, 1, 8000, RESAMPLE_RATE_HZ, None)
    assert digest == hashlib.md5(converted).hexdigest()
    # 8 kHz -> 16 kHz ~doubles the frame count (16-bit mono: 2 bytes
    # per frame; ratecv's linear interpolation may hold back one
    # boundary frame, so allow one frame of slack)
    assert abs(len(converted) - 2 * len(frames)) <= 2
    # junk bytes: the real path declines and the caller falls back
    assert wav_resample_digest(b"AUD0junk", RESAMPLE_RATE_HZ) is None


def test_audio_resample_real_path_through_query(spark, sf_dir):
    """real_samples=True through the registered mapInPandas stage: the
    synthetic payloads aren't readable WAV, so every row falls back to
    the deterministic fingerprint — bit-identical to the default path
    (geometry columns and digests both)."""
    from capstone_etl_spark.operators.multimodal import audio_resample

    fake = {r.doc_id: r for r in audio_resample(spark, sf_dir).collect()}
    real = {r.doc_id: r for r in audio_resample(spark, sf_dir, real_samples=True).collect()}
    assert fake.keys() == real.keys() and len(fake) > 0
    for doc_id, f in fake.items():
        assert tuple(real[doc_id]) == tuple(f)


def test_audio_resample_sample_accounting(spark, sf_dir):
    from capstone_etl_spark.operators.multimodal import RESAMPLE_RATE_HZ, audio_resample

    for r in audio_resample(spark, sf_dir).collect():
        assert r.target_rate_hz == RESAMPLE_RATE_HZ
        assert r.est_samples_in == r.sample_rate_hz * r.duration_ms // 1000
        assert r.est_samples_out == RESAMPLE_RATE_HZ * r.duration_ms // 1000
