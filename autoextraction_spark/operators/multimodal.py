"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so DECODING is stubbed: the
Spark-side plumbing (schemas, partitioning, UDF signatures, batch shapes) is
real and tested; the pixel/sample math is a deterministic fake behind
``_decode_image_real`` which raises NotImplementedError until PIL/ffmpeg are
present (import-gated).

At 100 TB the rules encoded here: binary payloads never enter a shuffle
(feature-extract FIRST, then drop the payload), batch sizes bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch``, one decoder init per
worker (iterator form).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoders, absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

MEDIA_SCHEMA = (
    "url string, kind string, payload binary, "
    "media_w int, media_h int, duration_ms int"
)
IMAGE_FEATURES_SCHEMA = (
    "url string, width int, height int, n_channels int, features array<float>"
)
FRAME_SAMPLE_SCHEMA = "url string, frame_idx int, frame_ts_ms int, frame binary"


def media_table(pages: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the corpus: every 3rd page
    carries an 'image', every 7th a 'video' (payload = fake bytes)."""
    doc_id = F.col("doc_id")
    kind = (
        F.when(doc_id % 7 == 0, F.lit("video"))
        .when(doc_id % 3 == 0, F.lit("image"))
        .otherwise(F.lit(None))
    )
    return (
        pages.select(
            "url",
            kind.alias("kind"),
            F.encode(F.concat(F.lit("payload:"), F.col("url")), "utf-8").alias("payload"),
            ((doc_id % 8 + 1) * 64).cast("int").alias("media_w"),
            ((doc_id % 5 + 1) * 64).cast("int").alias("media_h"),
            F.when(doc_id % 7 == 0, (doc_id % 30 + 1) * 1000)
            .otherwise(F.lit(None))
            .cast("int")
            .alias("duration_ms"),
        )
        .filter(F.col("kind").isNotNull())
    )


def _decode_image_real(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Real decoder — requires PIL. STUB: not available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/pillow; install it and wire Image.open "
        "here — the surrounding Spark plumbing is decode-library agnostic"
    )


def _decode_image_fake(payload: bytes, w: int, h: int) -> tuple[int, int, int, list[float]]:
    """Deterministic fake: 8 'features' from the payload digest — keeps the
    pipeline testable end-to-end without pixel libraries. b/256 is an exact
    binary fraction, so the value is bit-identical in any engine."""
    digest = hashlib.md5(payload).digest()
    feats = [b / 256.0 for b in digest[:8]]
    return w, h, 3, feats


def extract_image_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """image rows -> (url, width, height, n_channels, features array<float>).

    Iterator-of-batches form: a real model/decoder would be loaded ONCE per
    python worker here, not per batch.
    """
    images = media.filter(F.col("kind") == "image").select(
        "url", "payload", "media_w", "media_h"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one-time per-worker decoder init would go here
        for pdf in batches:
            out = []
            for url, payload, w, h in zip(
                pdf["url"], pdf["payload"], pdf["media_w"], pdf["media_h"]
            ):
                if use_real_decoder:
                    width, height, ch, feats = _decode_image_real(bytes(payload))
                else:
                    width, height, ch, feats = _decode_image_fake(bytes(payload), w, h)
                out.append((url, width, height, ch, feats))
            yield pd.DataFrame(
                out, columns=["url", "width", "height", "n_channels", "features"]
            )

    return images.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """video rows -> one row per sampled frame (deterministic fake frames).

    The explode happens JVM-side from duration metadata; only the (stubbed)
    per-frame decode is Python.
    """
    videos = media.filter(F.col("kind") == "video")
    idx = F.explode(
        F.sequence(F.lit(0), F.floor(F.col("duration_ms") / every_ms).cast("int"))
    ).alias("frame_idx")
    frames = videos.select("url", "payload", "duration_ms", idx).withColumn(
        "frame_ts_ms", F.col("frame_idx") * every_ms
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    # fake frame bytes: deterministic function of (url, idx)
                    "frame": [
                        hashlib.md5(f"{u}#{i}".encode()).digest()
                        for u, i in zip(pdf["url"], pdf["frame_idx"])
                    ],
                }
            )

    return frames.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)
