"""Multimodal plumbing tests — schema, Arrow batch shape, pruning-friendly
metadata ops.  Decoding itself is stubbed (no media libs in container)."""

from __future__ import annotations

import pytest

from lab_flink_repository_analytics_spark.datapipe import multimodal as MM


def _media(spark):
    rows = [
        ("m1", "image", "image/png", bytearray(b"\x89PNG fake"), 10, 10, None),
        ("m2", "image", "image/jpeg", bytearray(b"\xff\xd8 fake"), 20, 20, None),
        ("m3", "video", "video/mp4", bytearray(b"mp4 fake"), 64, 48, 3500),
        ("m4", "image", "image/png", None, None, None, None),  # null payload
        ("m5", "video", "video/mp4", bytearray(b"v"), 1, 1, None),  # no duration
        ("m6", "video", "video/mp4", bytearray(b"v"), 1, 1, 0),  # zero duration
    ]
    return spark.createDataFrame(rows, MM.MEDIA)


def test_extract_image_features_shape(spark):
    out = MM.extract_image_features(_media(spark)).collect()
    assert len(out) == 6
    by_id = {r["media_id"]: r for r in out}
    assert all(len(r["embedding"]) == MM.EMBED_DIM for r in out)
    assert all(-1.0 <= v < 1.0 for v in by_id["m1"]["embedding"])
    # deterministic: same payload -> same hash+embedding across runs
    again = {r["media_id"]: r for r in MM.extract_image_features(_media(spark)).collect()}
    assert again["m1"]["content_hash"] == by_id["m1"]["content_hash"]
    assert again["m1"]["embedding"] == by_id["m1"]["embedding"]
    # null payload handled (hash of empty)
    assert by_id["m4"]["content_hash"] == "d41d8cd98f00b204e9800998ecf8427e"


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"abc")
    h, w, _ = MM.decode_image(b"abc", deterministic_fake=True)
    assert 1 <= h <= 64 and 1 <= w <= 64


def test_video_frame_sampling_plan(spark):
    out = MM.sample_video_frames(_media(spark), every_ms=1000).collect()
    got = [(r["media_id"], r["frame_ts_ms"]) for r in out]
    assert got == [("m3", 0), ("m3", 1000), ("m3", 2000), ("m3", 3000)]


def test_media_summary(spark):
    out = {(r["kind"], r["mime"]): (r["n"], r["total_bytes"]) for r in MM.media_summary(_media(spark)).collect()}
    assert out[("video", "video/mp4")][0] == 3
    assert out[("image", "image/png")][0] == 2


def test_resize_images_shape_and_determinism(spark):
    out = {r["media_id"]: r for r in MM.resize_images(_media(spark), 8, 4).collect()}
    assert len(out) == 6
    for r in out.values():
        assert r["width"] == 8 and r["height"] == 4
        assert len(r["payload"]) == 8 * 4  # fixed-size fake re-encode
    again = {r["media_id"]: r for r in MM.resize_images(_media(spark), 8, 4).collect()}
    assert again["m1"]["payload"] == out["m1"]["payload"]  # deterministic
    # different target size -> different payload (size is in the seed)
    other = {r["media_id"]: r for r in MM.resize_images(_media(spark), 4, 8).collect()}
    assert other["m1"]["payload"] != out["m1"]["payload"]



def test_audio_segmentation_grid_and_clipping(spark):
    rows = [
        ("a1", "audio", "audio/wav", b"\x01\x02", None, None, 12_500),
        ("a2", "audio", "audio/wav", b"\x03", None, None, 5_000),
        ("a3", "audio", "audio/wav", b"", None, None, 0),      # no segments
        ("v1", "video", "video/mp4", b"\x04", None, None, 9_000),  # wrong kind
    ]
    media = spark.createDataFrame(rows, MM.MEDIA)
    segs = sorted(
        (r["media_id"], r["seg_start_ms"], r["seg_end_ms"])
        for r in MM.segment_audio(media, window_ms=5000).collect()
    )
    assert segs == [
        ("a1", 0, 5000), ("a1", 5000, 10000), ("a1", 10000, 12500),
        ("a2", 0, 5000),
    ]


def test_audio_feature_extraction_matches_segment_grid(spark):
    rows = [
        ("a1", "audio", "audio/wav", b"\x01\x02", None, None, 12_500),
        ("a2", "audio", "audio/wav", None, None, None, 5_000),  # null payload ok
    ]
    media = spark.createDataFrame(rows, MM.MEDIA)
    feats = MM.extract_audio_features(media, window_ms=5000).collect()
    grid = {(r["media_id"], r["seg_start_ms"], r["seg_end_ms"]) for r in
            MM.segment_audio(media, window_ms=5000).collect()}
    assert {(r["media_id"], r["seg_start_ms"], r["seg_end_ms"]) for r in feats} == grid
    for r in feats:
        assert len(r["features"]) == MM.EMBED_DIM
    # determinism: same payload+segment → same vector, different segment → different
    by_key = {(r["media_id"], r["seg_start_ms"]): r["features"] for r in feats}
    assert by_key[("a1", 0)] != by_key[("a1", 5000)]
    again = {(r["media_id"], r["seg_start_ms"]): r["features"]
             for r in MM.extract_audio_features(media, window_ms=5000).collect()}
    assert again == by_key


def test_perceptual_hash_deterministic_and_hex(spark):
    rows = [
        ("m1", "image", "image/png", bytearray(b"payloadA"), 8, 8, None),
        ("m2", "image", "image/png", bytearray(b"payloadA"), 8, 8, None),  # dup
        ("m3", "image", "image/png", bytearray(b"payloadB"), 8, 8, None),
        ("a1", "audio", "audio/wav", bytearray(b"x"), None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA)
    hashes = {r["media_id"]: r["phash"] for r in MM.perceptual_hashes(media).collect()}
    assert set(hashes) == {"m1", "m2", "m3"}  # audio row excluded
    assert hashes["m1"] == hashes["m2"]  # same payload → same hash
    assert hashes["m1"] != hashes["m3"]
    assert all(len(h) == 16 and int(h, 16) >= 0 for h in hashes.values())


def test_phash_near_dup_pairs_band_and_verify(spark):
    rows = [
        ("m1", "image", "image/png", bytearray(b"payloadA"), 8, 8, None),
        ("m2", "image", "image/png", bytearray(b"payloadA"), 8, 8, None),
        ("m3", "image", "image/png", bytearray(b"payloadB"), 8, 8, None),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA)
    hashes = MM.perceptual_hashes(media)
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in MM.phash_near_dup_pairs(hashes).collect()}
    assert pairs.get(("m1", "m2")) == 0  # exact dup found at distance 0
    # unrelated pair appears only if it crosses the (unlikely) threshold
    for (i, j), d in pairs.items():
        assert d <= 8


# ---------------------------------------------------------------------------
# REAL stdlib decode paths: 24-bit BMP and 16-bit PCM WAV


def make_bmp(rows):
    """Build an uncompressed bottom-up 24-bit BMP from grayscale rows."""
    import struct

    h, w = len(rows), len(rows[0])
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for r in reversed(rows):  # bottom-up storage
        line = bytearray()
        for v in r:
            line += bytes([v, v, v])  # B=G=R → luma == v
        line += b"\x00" * (stride - len(line))
        body += line
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return bytes(hdr + info + body)


def make_wav(samples, rate=8000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_decode_bmp_real_pixels():
    rows = [[0, 50, 100, 150], [200, 250, 10, 20], [30, 40, 60, 70]]
    payload = make_bmp(rows)
    h, w, got = MM.decode_bmp(payload)
    assert (h, w) == (3, 4)
    assert got == rows  # exact luma round-trip (B=G=R)
    # decode_image auto-detects BMP and takes the real path, fake or not
    assert MM.decode_image(payload) == (3, 4, rows)


def test_decode_wav_real_samples():
    samples = [0, 1000, -1000, 32000, -32000, 5]
    rate, ch, got = MM.decode_wav(make_wav(samples))
    assert (rate, ch) == (8000, 1)
    assert got == samples


def test_bmp_real_path_through_mapinpandas(spark):
    # half black / half white image: aHash = exactly the bright half set
    rows = [[0] * 8 if y < 4 else [255] * 8 for y in range(8)]
    payload = make_bmp(rows)
    media = spark.createDataFrame(
        [("b1", "image", "image/bmp", bytearray(payload), 8, 8, None)], MM.MEDIA
    )
    [ph] = MM.perceptual_hashes(media).collect()
    # grid is row-major top-down: rows 0-3 dark (bits clear), 4-7 bright
    assert int(ph["phash"], 16) == 0xFFFFFFFF00000000
    [feat] = MM.extract_image_features(media).collect()
    emb = feat["embedding"]
    assert len(emb) == MM.EMBED_DIM
    # 4x4 pooled: first 8 cells dark (-1.0), last 8 bright (~0.99)
    assert all(v == -1.0 for v in emb[:8])
    assert all(v > 0.9 for v in emb[8:])


def test_wav_real_path_through_mapinpandas(spark):
    import math

    rate = 8000
    # 2 s: first second silence, second second a loud 440 Hz tone
    samples = [0] * rate + [
        int(20000 * math.sin(2 * math.pi * 440 * i / rate)) for i in range(rate)
    ]
    media = spark.createDataFrame(
        [("a1", "audio", "audio/wav", bytearray(make_wav(samples, rate)), None, None, 2000)],
        MM.MEDIA,
    )
    out = {r["seg_start_ms"]: r for r in MM.extract_audio_features(media, window_ms=1000).collect()}
    assert set(out) == {0, 1000}
    silent, loud = out[0]["features"], out[1000]["features"]
    assert silent[9] == 0.0  # RMS of silence
    assert loud[9] > 0.3  # RMS of the tone (~0.43 full scale)
    assert loud[11] > 0.5  # peak
    assert silent[10] == 0.0 and loud[10] > 0.05  # zero-crossing rate
