"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schemas, Arrow-batched
pandas UDFs over ``mapInPandas``, partition sizing.  Two REAL decode
paths run in-sandbox with pure stdlib: uncompressed 24-bit BMP
(``decode_bmp``, struct-parsed) and 16-bit PCM WAV (``decode_wav``, via
``wave``) — payloads are sniffed by magic bytes and decoded for real
wherever they appear.  Every other format is STUBBED (no PIL/ffmpeg in
this container): those decode functions raise ``NotImplementedError``
unless ``deterministic_fake=True``, which substitutes a reproducible
md5-derived payload so the pipeline shape stays testable end-to-end.

Design for 100 TB of media:

* binary payloads stay in their own column so column pruning skips them
  for metadata-only queries (parquet reads only requested columns)
* ``mapInPandas`` processes Arrow record batches — decode cost amortizes
  per batch; ``spark.sql.files.maxPartitionBytes`` bounds partition memory
  since one input split holds whole payloads
* derived features (embeddings, thumbnails) are written to a separate
  table keyed by content hash, so re-featurization doesn't rewrite media
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: A media row: opaque payload + typed metadata.
MEDIA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", StringType()),
        StructField("content_hash", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

EMBED_DIM = 16


def _fake_embedding(payload: bytes, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic stand-in feature vector: md5-seeded bytes → [-1, 1)."""
    h = hashlib.md5(payload or b"").digest()
    vals = []
    i = 0
    while len(vals) < dim:
        b = h[i % len(h)]
        vals.append((b - 128) / 128.0)
        i += 1
        h = hashlib.md5(h).digest() if i % len(h) == 0 else h
    return vals


def is_bmp(payload: bytes) -> bool:
    return bool(payload) and payload[:2] == b"BM"


def is_wav(payload: bytes) -> bool:
    return (
        bool(payload)
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    )


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[int]]]:
    """REAL pure-stdlib decode of an uncompressed 24-bit BMP
    (BITMAPINFOHEADER) → (height, width, top-down grayscale rows 0-255).

    Handles both bottom-up (positive height, the common layout) and
    top-down (negative height) pixel order, and the 4-byte row padding.
    Grayscale = integer ITU-R 601 luma.  Runs inside the same Arrow
    batches as the stubbed decoders — swap point unchanged.
    """
    import struct

    if not is_bmp(payload):
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got {bpp}bpp/comp={comp})")
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows: list[list[int]] = []
    for r in range(h):
        src = r if top_down else h - 1 - r
        base = pixel_off + src * stride
        row = []
        for c in range(w):
            b, g, rr = payload[base + 3 * c : base + 3 * c + 3]
            row.append((299 * rr + 587 * g + 114 * b) // 1000)
        rows.append(row)
    return h, w, rows


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL pure-stdlib decode of 16-bit PCM WAV via ``wave`` →
    (sample_rate, n_channels, mono-mixed int16 samples)."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        ch, sw, rate, n = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        raw = wf.readframes(n)
    if sw != 2:
        raise NotImplementedError(f"only 16-bit PCM WAV (got sampwidth={sw})")
    vals = struct.unpack(f"<{len(raw) // 2}h", raw)
    if ch > 1:
        vals = [sum(vals[i : i + ch]) // ch for i in range(0, len(vals), ch)]
    return rate, ch, list(vals)


def _box_grid(rows: list[list[int]], g: int) -> list[int]:
    """Average-pool pixel rows down to a ``g×g`` grid (row-major)."""
    h, w = len(rows), len(rows[0])
    out = []
    for gy in range(g):
        y0, y1 = gy * h // g, max(gy * h // g + 1, (gy + 1) * h // g)
        for gx in range(g):
            x0, x1 = gx * w // g, max(gx * w // g + 1, (gx + 1) * w // g)
            s = sum(rows[y][x] for y in range(y0, y1) for x in range(x0, x1))
            out.append(s // ((y1 - y0) * (x1 - x0)))
    return out


def _bmp_embedding(payload: bytes, dim: int = EMBED_DIM) -> list[float]:
    """REAL image feature vector: decode → grayscale → 4×4 box-average →
    [-1, 1) floats (dim=16).  The swap point for a learned encoder."""
    _, _, rows = decode_bmp(payload)
    g = int(dim**0.5)
    return [(p - 128) / 128.0 for p in _box_grid(rows, g)]


def _wav_segment_features(
    samples: list[int], rate: int, start_ms: int, end_ms: int, dim: int = EMBED_DIM
) -> list[float]:
    """REAL audio features for one segment: 8 coarse-band RMS energies +
    mean, RMS, zero-crossing rate, peak — padded to ``dim``.  All values
    normalized to int16 full scale."""
    lo = min(len(samples), start_ms * rate // 1000)
    hi = min(len(samples), end_ms * rate // 1000)
    seg = samples[lo:hi] or [0]
    n = len(seg)
    feats: list[float] = []
    for b in range(8):  # coarse time-band energies
        s = seg[b * n // 8 : max(b * n // 8 + 1, (b + 1) * n // 8)]
        feats.append((sum(x * x for x in s) / len(s)) ** 0.5 / 32768.0)
    feats.append(sum(seg) / n / 32768.0)
    feats.append((sum(x * x for x in seg) / n) ** 0.5 / 32768.0)
    feats.append(
        sum(1 for i in range(1, n) if (seg[i - 1] < 0) != (seg[i] < 0)) / max(1, n - 1)
    )
    feats.append(max(abs(x) for x in seg) / 32768.0)
    feats += [0.0] * (dim - len(feats))
    return feats[:dim]


def decode_image(payload: bytes, deterministic_fake: bool = False):
    """Decode an image payload to (height, width, pixel rows).

    BMP payloads decode FOR REAL (:func:`decode_bmp`, pure stdlib).
    Other formats need PIL/opencv (not in this container): stubbed — the
    fake mode returns md5-derived dimensions so plumbing is testable.
    """
    if is_bmp(payload):
        return decode_bmp(payload)
    if not deterministic_fake:
        raise NotImplementedError(
            "non-BMP image decoding requires PIL/opencv; "
            "run with deterministic_fake=True"
        )
    h = hashlib.md5(payload or b"").digest()
    return (h[0] % 64 + 1, h[1] % 64 + 1, None)


def extract_image_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """media rows → (media_id, content_hash, embedding) via mapInPandas.

    The UDF sees Arrow batches of whole payloads; output schema is fixed
    (IMAGE_FEATURES).  With a real decoder only ``_fake_embedding`` /
    ``decode_image`` change — the Spark plumbing stays identical.
    """

    def _embed(p: bytes | None) -> list[float]:
        p = p if p is not None else b""
        if is_bmp(p):  # real stdlib decode, fake or not
            return _bmp_embedding(p)
        if deterministic_fake:
            return _fake_embedding(p)
        raise NotImplementedError(
            "non-BMP image decoding requires PIL/opencv; "
            "run with deterministic_fake=True"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embeddings = [_embed(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content_hash": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "embedding": embeddings,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = True
) -> DataFrame:
    """video rows → one row per sampled frame timestamp.

    Frame *extraction* is stubbed (needs ffmpeg); the frame-timestamp plan
    (explode over a generated sequence, bounded by duration metadata) is
    the real Spark shape and runs without touching payloads — column
    pruning drops the binary column entirely.
    """
    if not deterministic_fake:
        raise NotImplementedError("frame extraction requires ffmpeg")
    frames = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
    return (
        # a video with NULL/zero duration has no frames to sample — filter,
        # don't emit a phantom frame-0 row for it
        media.filter(
            (F.col("kind") == "video")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select("media_id", F.explode(frames).alias("frame_ts_ms"))
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Catalog rollup: counts + payload volume per (kind, mime)."""
    return media.groupBy("kind", "mime").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
    )


RESIZED_IMAGE = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    deterministic_fake: bool = True,
) -> DataFrame:
    """media rows → fixed-size image payloads via mapInPandas.

    STUB pixel work (no PIL/opencv in this container): the fake re-encode
    is an md5 stretch of the payload to a deterministic ``width*height``-
    seeded byte string, so batch shapes, schema, and partition behavior —
    the Spark-side contract — are real and tested.  Swapping in
    ``PIL.Image.resize`` changes only ``_resize_payload``.
    """
    try:  # pragma: no cover - not installed in this container
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    def _resize_payload(p: bytes) -> bytes:
        if have_pil and not deterministic_fake:  # pragma: no cover
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(p)).resize((width, height))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        if not deterministic_fake:
            raise NotImplementedError(
                "image resizing requires PIL; run with deterministic_fake=True"
            )
        seed = hashlib.md5((p or b"") + f"{width}x{height}".encode()).digest()
        reps = (width * height) // len(seed) + 1
        return (seed * reps)[: width * height]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "payload": [
                        _resize_payload(p if p is not None else b"")
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=RESIZED_IMAGE
    )


AUDIO_SEGMENT_FEATURES = StructType(
    [
        StructField("media_id", StringType()),
        StructField("seg_start_ms", IntegerType()),
        StructField("seg_end_ms", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def segment_audio(media: DataFrame, window_ms: int = 5000) -> DataFrame:
    """audio rows → one row per fixed-length segment (ASR-style chunking).

    Pure metadata plan: segment boundaries come from ``duration_ms`` via an
    exploded sequence, the tail segment is clipped to the duration, and the
    binary payload is never touched — column pruning drops it from the scan
    (same shape as :func:`sample_video_frames`).
    """
    starts = F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(window_ms))
    return (
        media.filter(
            (F.col("kind") == "audio")
            & F.col("duration_ms").isNotNull()
            & (F.col("duration_ms") > 0)
        )
        .select("media_id", "duration_ms", F.explode(starts).alias("seg_start_ms"))
        .select(
            "media_id",
            "seg_start_ms",
            F.least(
                F.col("seg_start_ms") + F.lit(window_ms), F.col("duration_ms")
            ).alias("seg_end_ms"),
        )
    )


def extract_audio_features(
    media: DataFrame, window_ms: int = 5000, deterministic_fake: bool = True
) -> DataFrame:
    """audio rows → per-segment feature vectors (MFCC-shaped) via
    mapInPandas.

    16-bit PCM WAV payloads decode FOR REAL (:func:`decode_wav`, pure
    stdlib): per-segment coarse-band energies, RMS, zero-crossing rate,
    peak.  Other codecs are STUBBED (need librosa/ffmpeg, absent here):
    fake mode derives per-segment vectors from md5(payload ‖ segment
    index), so the batch shape, schema, and partitioning are the real
    plumbing a decoder drops into.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "seg_start_ms": [],
                "seg_end_ms": [],
                "features": [],
            }
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if dur is None or dur <= 0:
                    continue
                p = payload if payload is not None else b""
                wav = None
                if is_wav(p):
                    rate, _, samples = decode_wav(p)
                    wav = (rate, samples)
                elif not deterministic_fake:
                    raise NotImplementedError(
                        "non-WAV audio decoding requires librosa/ffmpeg; "
                        "run with deterministic_fake=True"
                    )
                for i, start in enumerate(range(0, int(dur), window_ms)):
                    end = min(start + window_ms, int(dur))
                    out["media_id"].append(mid)
                    out["seg_start_ms"].append(start)
                    out["seg_end_ms"].append(end)
                    out["features"].append(
                        _wav_segment_features(wav[1], wav[0], start, end)
                        if wav is not None
                        else _fake_embedding(p + i.to_bytes(4, "big"))
                    )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(batches, schema=AUDIO_SEGMENT_FEATURES)
    )


PHASH = StructType(
    [
        StructField("media_id", StringType()),
        StructField("phash", StringType()),  # 16 hex chars = 64-bit aHash
    ]
)


def _ahash64(pixels) -> int:
    """64-bit average hash of an 8x8 grayscale grid: bit i set iff pixel i
    is above the grid mean — the standard aHash; REAL math, fake pixels."""
    mean = sum(pixels) / len(pixels)
    h = 0
    for i, p in enumerate(pixels):
        if p > mean:
            h |= 1 << i
    return h


def _fake_gray_grid(payload: bytes) -> list[int]:
    """Deterministic md5-derived stand-in for decode→grayscale→8x8 resize.
    Crucially, similarity is PAYLOAD-determined: near-identical payloads
    (same md5) give identical grids, so dedup semantics are exercised."""
    d = hashlib.md5(payload or b"").digest() + hashlib.md5(
        (payload or b"") + b"#"
    ).digest() + hashlib.md5((payload or b"") + b"##").digest() + hashlib.md5(
        (payload or b"") + b"###"
    ).digest()
    return list(d)  # 64 bytes → 64 "pixels"


def perceptual_hashes(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """(media_id, phash) for every image row — Arrow-batched ``mapInPandas``
    over the payload column.  BMP payloads take the REAL path
    (decode → grayscale → 8×8 box-average → aHash); other formats use the
    md5 stand-in grid (swap for a PIL decode+resize on real images)."""

    def _grid(p: bytes | None) -> list[int]:
        p = p if p is not None else b""
        if is_bmp(p):
            _, _, rows = decode_bmp(p)
            return _box_grid(rows, 8)
        if deterministic_fake:
            return _fake_gray_grid(p)
        raise NotImplementedError(
            "non-BMP image decoding requires PIL/opencv; "
            "run with deterministic_fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [format(_ahash64(_grid(p)), "016x") for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": hashes})

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(run, PHASH)


def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image pairs by Hamming distance over the 64-bit
    perceptual hash, banded to avoid the all-pairs join: split the hash
    into 4 × 16-bit bands — any pair within Hamming ≤ 8 OVER A MATCHING
    BAND is a candidate (pigeonhole: distance ≤ max_hamming with
    ``bands > max_hamming/ (64/bands)``... the standard multi-index trick),
    then verify the exact distance in codegen (``bit_count(xor)``).

    With the default ``max_hamming=8`` and 4 bands, any pair at distance
    ≤ 8 that concentrates ≤ 2 flips per band in three bands still shares
    NO band only if every band differs — pairs must share at least one
    exact 16-bit band to be found (distance spread across all 4 bands is
    missed; tighten with 8 bands for recall on higher thresholds)."""
    # hex → signed 64-bit via two 32-bit halves (a single conv→bigint cast
    # would overflow ANSI arithmetic when the top bit is set; shiftleft
    # wraps to negative harmlessly — xor/bit_count/band-mask are bitwise)
    h = hashes.select(
        "media_id",
        F.expr(
            "shiftleft(CAST(conv(substr(phash, 1, 8), 16, 10) AS BIGINT), 32)"
            " | CAST(conv(substr(phash, 9, 8), 16, 10) AS BIGINT)"
        ).alias("h64"),
    )
    bands = h.select(
        "media_id",
        "h64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(f"(h64 >> {16 * i}) & 65535").alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("media_id", "h64", "bk.band", "bk.key")
    a = bands.select(
        F.col("media_id").alias("id1"),
        F.col("h64").alias("h1"),
        "band",
        "key",
    )
    b = bands.select(
        F.col("media_id").alias("id2"),
        F.col("h64").alias("h2"),
        "band",
        "key",
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.expr("bit_count(h1 ^ h2)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
