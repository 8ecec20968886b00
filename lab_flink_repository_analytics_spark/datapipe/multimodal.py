"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schemas, Arrow-batched
pandas UDFs over ``mapInPandas``, partition sizing — while the actual
media decoding is STUBBED (this container has no image/audio libraries):
each decode function raises ``NotImplementedError`` unless
``deterministic_fake=True``, which substitutes a reproducible md5-derived
payload so the pipeline shape is testable end-to-end.

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


def decode_image(payload: bytes, deterministic_fake: bool = False):
    """Decode an image payload to (height, width, pixel array).

    STUB: real decoding needs PIL/opencv (not in this container).  The
    fake mode returns md5-derived dimensions so plumbing is testable.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; run with deterministic_fake=True"
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

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embeddings = [
                _fake_embedding(p if p is not None else b"")
                if deterministic_fake
                else decode_image(p)
                for p in pdf["payload"]
            ]
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

    Decode is STUBBED (needs librosa/ffmpeg, absent here): fake mode
    derives per-segment vectors from md5(payload ‖ segment index), so the
    batch shape, schema, and partitioning are the real plumbing a decoder
    drops into.  Payloads ride into the UDF only because the (stub)
    decoder needs them — the segment grid itself comes from metadata.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "audio decoding requires librosa/ffmpeg; run with deterministic_fake=True"
        )

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
                for i, start in enumerate(range(0, int(dur), window_ms)):
                    out["media_id"].append(mid)
                    out["seg_start_ms"].append(start)
                    out["seg_end_ms"].append(min(start + window_ms, int(dur)))
                    out["features"].append(
                        _fake_embedding(p + i.to_bytes(4, "big"))
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
    over the payload column; swap ``_fake_gray_grid`` for a PIL
    decode+resize to run on real images."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; run with deterministic_fake=True"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                format(_ahash64(_fake_gray_grid(p)), "016x")
                for p in pdf["payload"]
            ]
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
