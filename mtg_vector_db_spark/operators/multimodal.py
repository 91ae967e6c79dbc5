"""Multimodal (image/audio/video) column plumbing.

Beyond the reference surface (BASELINE.json north-star): a 100 TB training
pipeline carries media as opaque ``binary`` payload columns plus typed
metadata, processed by Arrow-batched Python kernels. The Spark-side
plumbing here — schema, batch iteration via mapInPandas, partition-size
control — is real and tested; the actual codec calls are stubbed behind
``decode_backend`` because media libraries are not available in this
environment (a deterministic fake keeps the pipeline testable end-to-end).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)


def fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a codec: derives pseudo 'decoded'
    metadata + an 8-byte content feature from the payload bytes.
    Replace with a real decoder (PIL/ffmpeg/...) via ``decode_backend``."""
    h = hashlib.md5(payload or b"").digest()
    return {
        "feature_hex": h[:8].hex(),
        "decoded_w": 16 + h[0] % 64,
        "decoded_h": 16 + h[1] % 64,
        "n_bytes": len(payload or b""),
    }


def real_decode(payload: bytes, media_type: str) -> dict:
    """The genuine decode hook — requires media libraries absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "pass decode_backend=fake_decode or a real decoder"
    )


def decode_features(
    media: DataFrame,
    decode_backend: Callable[[bytes, str], dict] = fake_decode,
    batch_hint: int | None = None,
) -> DataFrame:
    """Extract per-item features from binary payloads via mapInPandas.

    One Arrow batch per iteration; payload bytes never transit the driver.
    At scale, repartition upstream so each task holds
    O(executor-memory / max-payload) rows.
    """

    out_schema = (
        "doc_id long, media_type string, n_bytes long, "
        "feature_hex string, decoded_w int, decoded_h int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_backend(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "feature_hex": [f["feature_hex"] for f in feats],
                    "decoded_w": [f["decoded_w"] for f in feats],
                    "decoded_h": [f["decoded_h"] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (doc, frame_ts).
    Pure DataFrame op (sequence+explode) — the decode of each frame is then
    a decode_features pass; at scale the explode is what distributes frame
    work across executors."""
    return media.filter(F.col("media_type") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image resize kernel: a (w*h)-shaped
    pseudo-bitmap derived from the payload digest. Replace with PIL/opencv
    via the ``resize_backend`` hook."""
    seed = hashlib.md5((payload or b"") + f"{w}x{h}".encode()).digest()
    reps = (w * h * 3) // len(seed) + 1
    return (seed * reps)[: w * h * 3]


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_backend: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Image resize pass: binary in, binary out, Arrow-batched; output rows
    keep (doc_id, media_type) and gain the resized payload + dims. The
    payload column never leaves the executors."""

    out_schema = "doc_id long, media_type string, payload binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": [
                        resize_backend(p, width, height) for p in pdf["payload"]
                    ],
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, schema=out_schema
    )


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking plan: one row per (doc, chunk_start) — the explode is
    what spreads per-chunk decode/feature work across executors, same shape
    as :func:`frame_sample_plan`."""
    chunks = media.filter(F.col("media_type") == "audio").select(
        "doc_id",
        "duration_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(chunk_ms),
            )
        ).alias("chunk_start_ms"),
    )
    return chunks.select(
        "doc_id",
        "chunk_start_ms",
        F.least(
            F.col("duration_ms") - F.col("chunk_start_ms"), F.lit(chunk_ms)
        ).alias("chunk_len_ms"),
    )
