"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the DECODE step is stubbed
(deterministic fake features derived from the bytes, or
NotImplementedError in strict mode) — but the Spark-side plumbing is real
and tested: schema, batch iteration, partition sizing, UDF signatures
match what a real decoder (PIL/torchaudio/ffmpeg) would drop into.

Scale notes: media rows are large -> repartition by size budget before
mapInPandas (maxRecordsPerBatch keeps Arrow batches bounded); feature
extraction is embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, "
    "width int, height int, duration_ms int"
)
FEATURE_SCHEMA = "media_id long, media_type string, n_bytes long, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame_ts_ms int, frame array<float>"

FEATURE_DIM = 16


def _fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: expand the md5
    of the payload into `dim` floats in [0, 1). REPLACE with a real
    decode (PIL.Image.open / librosa.load) where the libs exist."""
    h = hashlib.md5(payload).digest()
    reps = (dim * 4 + len(h) - 1) // len(h)
    buf = (h * reps)[: dim * 4]
    raw = np.frombuffer(buf, dtype=np.uint32).astype(np.float64)
    return (raw / 2**32).astype(np.float32)


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Binary payload -> fixed-dim feature vector via mapInPandas.
    strict=True raises NotImplementedError where the real decoder would
    run (making the stub boundary explicit)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media decode requires PIL/librosa/ffmpeg — not in this "
                    "container; wire the real decoder here"
                )
            feats = [
                _fake_feature(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame at
    a fixed timestamp stride. The frame decode itself is the stub
    (deterministic fake pixels keyed on (payload, frame_idx))."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized row expansion (np.repeat/arange, no iterrows);
            # only the per-frame decode call itself remains a loop — that
            # is where the real ffmpeg/PIL call goes
            dur = pd.to_numeric(pdf["duration_ms"], errors="coerce").fillna(
                0).astype(np.int64).to_numpy()
            n = np.minimum(max_frames, np.maximum(1, dur // every_ms))
            row_idx = np.repeat(np.arange(len(pdf)), n)
            prefix = np.cumsum(n) - n
            frame_idx = np.arange(int(n.sum())) - np.repeat(prefix, n)
            payloads = pdf["payload"].to_numpy()
            frames = [
                _fake_feature(
                    bytes(payloads[r]) + int(f).to_bytes(4, "little")
                ).tolist()
                for r, f in zip(row_idx, frame_idx)
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy()[row_idx],
                "frame_idx": frame_idx.astype(np.int32),
                "frame_ts_ms": (frame_idx * every_ms).astype(np.int32),
                "frame": pd.Series(frames, dtype=object),
            })

    return media.filter(F.col("media_type") == "video").mapInPandas(
        run, FRAME_SCHEMA
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        types = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                h = hashlib.md5(f"{seed}:{i}".encode()).digest()
                payload = h * (8 + i % 8)
                t = types[i % 3]
                rows.append(
                    (
                        int(i), t, payload,
                        64 + int(i) % 256 if t == "image" else None,
                        64 + int(i) % 128 if t == "image" else None,
                        (1000 + int(i) * 37 % 9000) if t != "image" else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "payload", "width", "height",
                    "duration_ms",
                ],
            )

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def resize_images(media: DataFrame, target_w: int = 64,
                  target_h: int = 64, strict: bool = False) -> DataFrame:
    """Image-resize plumbing: one row per image with the target geometry
    and a resized payload. The PIXEL work is the stub (deterministic
    bytes keyed on payload+geometry — REPLACE with PIL.Image.resize where
    the lib exists); the Spark-side contract is real: schema, Arrow batch
    iteration, output size metadata, non-image rows filtered."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode/resize requires PIL — not in this "
                    "container; wire Image.open(...).resize((w, h)) here"
                )
            payloads = [
                _fake_feature(
                    bytes(p) + target_w.to_bytes(2, "little")
                    + target_h.to_bytes(2, "little"),
                    dim=target_w * target_h // 16,
                ).tobytes()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": np.int32(target_w),
                "height": np.int32(target_h),
                "payload": pd.Series(payloads, dtype=object),
            })

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, "media_id long, width int, height int, payload binary"
    )
