"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries, so two tiers exist:

- IMAGES in raw PPM (P6) decode FOR REAL — a stdlib+numpy codec
  (ppm_decode/ppm_encode) feeds genuine pixel features and a genuine
  nearest-neighbor resize; synthetic_media generates its image payloads
  as real PPMs so the pixel paths are tested on actual pixel values.
- VIDEOS in the PPMV container (a 2-line header + concatenated P6
  frames — the post-decode interchange a real pipeline gets out of
  ffmpeg) decode FOR REAL too: sample_frames maps each sampled
  timestamp to its source frame and emits that frame's genuine pixel
  feature; extract_features averages the per-frame features.
- AUDIO (and non-PPM/PPMV formats) stays stubbed: deterministic fake
  features derived from the bytes, or NotImplementedError in strict
  mode — that is where torchaudio/ffmpeg would drop in. The Spark-side
  plumbing (schema, Arrow batch iteration, partition sizing, UDF
  signatures) is identical for both tiers.

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


def ppm_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6). Stdlib-only; the raw format
    real pipelines use as the post-decode interchange."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(pixels.astype(np.uint8)).tobytes()


def _ppm_parse_at(payload: bytes, off: int) -> tuple[np.ndarray | None, int]:
    """Parse one binary PPM (P6) starting at byte offset `off` ->
    ((h, w, 3) uint8, offset past the image), or (None, off) when the
    bytes there are not a P6 image. Handles whitespace + '#' comments
    per the netpbm spec; maxval must be 255. Offset-aware so PPM images
    can be CONCATENATED (the PPMV frame container below)."""
    if payload[off:off + 2] != b"P6":
        return None, off
    vals, i, n = [], off + 2, len(payload)
    while len(vals) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            j = payload.find(b"\n", i)
            i = n if j < 0 else j + 1
            continue
        if c.isspace():
            i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        tok = payload[i:j]
        if not tok.isdigit():
            return None, off
        vals.append(int(tok))
        i = j
    if len(vals) < 3 or vals[2] != 255:
        return None, off
    i += 1  # the single whitespace after maxval
    w, h = vals[0], vals[1]
    raw = payload[i:i + w * h * 3]
    if len(raw) != w * h * 3:
        return None, off
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    return px, i + w * h * 3


def ppm_decode(payload: bytes) -> np.ndarray | None:
    """Binary PPM (P6) -> (h, w, 3) uint8, or None when the payload is
    not a P6 image (caller falls back to the stub tier)."""
    px, _ = _ppm_parse_at(payload, 0)
    return px


PPMV_MAGIC = b"PPMV\n"


def ppmv_encode(frames: list[np.ndarray], frame_ms: int) -> bytes:
    """Trivial stdlib video container: 'PPMV\\n<n_frames> <frame_ms>\\n'
    followed by the frames as concatenated binary PPMs (each frame is
    self-delimiting via its own header). This is the post-decode
    interchange a real pipeline gets out of ffmpeg; it lets the frame
    paths run on actual pixels in a container with no media libs."""
    head = b"PPMV\n%d %d\n" % (len(frames), frame_ms)
    return head + b"".join(ppm_encode(f) for f in frames)


def ppmv_decode(payload: bytes) -> tuple[list[np.ndarray], int] | None:
    """PPMV -> (frames, frame_ms), or None when the payload is not a
    PPMV container (caller falls back to the stub tier)."""
    if not payload.startswith(PPMV_MAGIC):
        return None
    j = payload.find(b"\n", len(PPMV_MAGIC))
    if j < 0:
        return None
    parts = payload[len(PPMV_MAGIC):j].split()
    if len(parts) != 2 or not all(p.isdigit() for p in parts):
        return None
    nf, frame_ms = int(parts[0]), int(parts[1])
    if nf < 1 or frame_ms < 1:
        return None
    off, frames = j + 1, []
    for _ in range(nf):
        px, off = _ppm_parse_at(payload, off)
        if px is None:
            return None
        frames.append(px)
    return frames, frame_ms


def _image_feature(pixels: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real pixel features from a decoded image: per-channel mean/std
    (6), an 8-bin grayscale histogram (8), aspect ratio and log-scaled
    pixel count (2) — dim floats, all from actual pixel values."""
    px = pixels.astype(np.float64)
    means = px.reshape(-1, 3).mean(axis=0) / 255.0
    stds = px.reshape(-1, 3).std(axis=0) / 255.0
    gray = px.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    hist = hist / gray.size
    h, w, _ = pixels.shape
    extra = np.asarray([w / h, np.log1p(h * w) / 20.0])
    out = np.concatenate([means, stds, hist, extra])[:dim]
    return out.astype(np.float32)


def resize_nearest(pixels: np.ndarray, target_w: int,
                   target_h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy indexing (the geometry
    contract a PIL resize would satisfy)."""
    h, w, _ = pixels.shape
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return pixels[ys][:, xs]


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """Binary payload -> fixed-dim feature vector via mapInPandas.
    strict=True raises NotImplementedError where the real decoder would
    run (making the stub boundary explicit)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for t, p in zip(pdf["media_type"], pdf["payload"]):
                payload = bytes(p)
                if t == "image":
                    px = ppm_decode(payload)
                    if px is not None:
                        feats.append(_image_feature(px).tolist())  # REAL
                        continue
                elif t == "video":
                    v = ppmv_decode(payload)
                    if v is not None:
                        # REAL: mean of per-frame pixel features
                        fs = np.stack([_image_feature(f) for f in v[0]])
                        feats.append(fs.mean(axis=0).astype(
                            np.float32).tolist())
                        continue
                if strict:
                    raise NotImplementedError(
                        f"decode of {t!r} media requires "
                        "PIL/librosa/ffmpeg — not in this container "
                        "(raw PPM images and PPMV videos decode for "
                        "real); wire the real decoder here"
                    )
                feats.append(_fake_feature(payload).tolist())
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
                  max_frames: int = 8, strict: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame at a fixed
    timestamp stride. PPMV payloads decode FOR REAL — the sampled
    timestamp maps to its source frame (min(ts // frame_ms, n-1)) and
    the output is that frame's genuine pixel feature. Other containers
    fall back to the deterministic stub keyed on (payload, frame_idx),
    or raise in strict mode (the ffmpeg drop-in point)."""

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
            # decode each video payload once per row, not once per frame
            decoded: dict[int, tuple[list, int] | None] = {}
            frames = []
            for r, f in zip(row_idx, frame_idx):
                if r not in decoded:
                    decoded[r] = ppmv_decode(bytes(payloads[r]))
                v = decoded[r]
                if v is not None:
                    vf, frame_ms = v
                    src = min(int(f) * every_ms // frame_ms, len(vf) - 1)
                    frames.append(_image_feature(vf[src]).tolist())  # REAL
                elif strict:
                    raise NotImplementedError(
                        "frame decode of this video container requires "
                        "ffmpeg — not in this container (PPMV decodes "
                        "for real); wire the real decoder here"
                    )
                else:
                    frames.append(_fake_feature(
                        bytes(payloads[r]) + int(f).to_bytes(4, "little")
                    ).tolist())
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
                t = types[i % 3]
                if t == "image":
                    # REAL raw-PPM payload: deterministic gradient +
                    # per-id phase, so pixel-level assertions have exact
                    # expected values
                    w = 64 + int(i) % 256
                    hgt = 64 + int(i) % 128
                    yy, xx = np.mgrid[0:hgt, 0:w]
                    base = (yy * 3 + xx * 5 + int(i) * 7) % 256
                    px = np.stack(
                        [base, (base + 85) % 256, (base + 170) % 256],
                        axis=2).astype(np.uint8)
                    payload = ppm_encode(px)
                    rows.append((int(i), t, payload, w, hgt, None))
                    continue
                if t == "video":
                    # REAL PPMV payload: deterministic per-(id, frame)
                    # gradient frames, so frame-level assertions have
                    # exact expected pixel values
                    frame_ms = 250
                    nf = 4 + int(i) % 5
                    yy, xx = np.mgrid[0:12, 0:16]
                    vid = []
                    for f in range(nf):
                        base = (yy * 3 + xx * 5 + int(i) * 7 + f * 11) % 256
                        vid.append(np.stack(
                            [base, (base + 85) % 256, (base + 170) % 256],
                            axis=2).astype(np.uint8))
                    rows.append((int(i), t, ppmv_encode(vid, frame_ms),
                                 16, 12, nf * frame_ms))
                    continue
                h = hashlib.md5(f"{seed}:{i}".encode()).digest()
                payload = h * (8 + i % 8)
                rows.append(
                    (
                        int(i), t, payload,
                        None,
                        None,
                        (1000 + int(i) * 37 % 9000),
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
    """Image resize: raw-PPM payloads decode and resize FOR REAL
    (nearest-neighbor numpy indexing, re-encoded as PPM); other image
    encodings fall back to a deterministic stub payload (or raise in
    strict mode — that is the PIL.Image.resize drop-in point). Schema,
    Arrow batch iteration, size metadata and the non-image filter are
    the same for both tiers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                payload = bytes(p)
                px = ppm_decode(payload)
                if px is not None:
                    payloads.append(ppm_encode(
                        resize_nearest(px, target_w, target_h)))  # REAL
                elif strict:
                    raise NotImplementedError(
                        "decode/resize of non-PPM images requires PIL — "
                        "not in this container; wire "
                        "Image.open(...).resize((w, h)) here"
                    )
                else:
                    payloads.append(_fake_feature(
                        payload + target_w.to_bytes(2, "little")
                        + target_h.to_bytes(2, "little"),
                        dim=target_w * target_h // 16,
                    ).tobytes())
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": np.int32(target_w),
                "height": np.int32(target_h),
                "payload": pd.Series(payloads, dtype=object),
            })

    return media.filter(F.col("media_type") == "image").mapInPandas(
        run, "media_id long, width int, height int, payload binary"
    )
