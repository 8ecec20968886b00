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
