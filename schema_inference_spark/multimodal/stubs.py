"""Multimodal column plumbing: decode / feature-extract / resize / frame-sample.

Images, audio and video are opaque ``binary`` columns with typed metadata;
the transforms run as Arrow-batched ``mapInPandas`` so the Spark-side
contract (schemas, batch shapes, partitioning-by-bytes) is real and tested.

The sandbox has no PIL/ffmpeg/librosa, so the *decoders* follow the
engine's codec policy: the in-repo deterministic codec handles the engine's
own containers, and anything else raises ``NotImplementedError`` with the
library that a production build would plug in. Swapping the decode lambda
is the only change needed for real payloads.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from schema_inference_spark.datagen import codec

IMAGE_FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean_luma double, std_luma double, edge_energy double"
)


def _decode_or_raise(buf: bytes) -> np.ndarray:
    if buf is not None and len(buf) >= 4 and buf[:4] in codec.MAGIC:
        return codec.decode_image(buf)[2]
    raise NotImplementedError(
        "non-engine container: plug in PIL.Image.open / turbojpeg here for "
        "real PNG/JPEG/WebP payloads"
    )


def extract_image_features(images: DataFrame) -> DataFrame:
    """Per-image features (mean/std luma, gradient energy) via one
    mapInPandas pass over (image_id, bytes)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in ("image_id", "w", "h", "mean_luma", "std_luma", "edge_energy")}
            for image_id, buf in zip(b["image_id"], b["bytes"]):
                try:
                    px = _decode_or_raise(buf).astype(np.float64)
                except (ValueError, NotImplementedError):
                    continue
                gy, gx = np.gradient(px)
                out["image_id"].append(image_id)
                out["h"].append(px.shape[0])
                out["w"].append(px.shape[1])
                out["mean_luma"].append(float(px.mean()))
                out["std_luma"].append(float(px.std()))
                out["edge_energy"].append(float(np.mean(np.abs(gx) + np.abs(gy))))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int"


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize, re-encoded with the engine codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("image_id", "bytes", "w", "h")}
            for image_id, buf in zip(b["image_id"], b["bytes"]):
                try:
                    px = _decode_or_raise(buf)
                except (ValueError, NotImplementedError):
                    continue
                ys = (np.arange(out_h) * px.shape[0] // out_h).clip(0, px.shape[0] - 1)
                xs = (np.arange(out_w) * px.shape[1] // out_w).clip(0, px.shape[1] - 1)
                resized = px[np.ix_(ys, xs)]
                rows["image_id"].append(image_id)
                rows["bytes"].append(codec.encode_image(resized, "png"))
                rows["w"].append(out_w)
                rows["h"].append(out_h)
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(run, RESIZED_SCHEMA)


FRAME_SAMPLE_SCHEMA = "video_id string, frame_index int, frame_bytes binary"


def sample_video_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video binary columns.

    The engine has no video container; a production build decodes with
    PyAV/ffmpeg inside the same batch loop. The plumbing (schema, batch
    iteration, 1->N row expansion) is exercised by treating the payload as
    a concatenation of engine-codec frames when it parses, else raising."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k: [] for k in ("video_id", "frame_index", "frame_bytes")}
            for video_id, buf in zip(b["video_id"], b["bytes"]):
                frames = _split_concatenated_frames(buf)
                for idx in range(0, len(frames), every_n):
                    rows["video_id"].append(video_id)
                    rows["frame_index"].append(idx)
                    rows["frame_bytes"].append(frames[idx])
            yield pd.DataFrame(rows)

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def _split_concatenated_frames(buf: bytes) -> list[bytes]:
    """Split a naive concatenation of engine-codec frames (each frame is
    self-delimiting only via decode; we scan for magics)."""
    if buf is None or len(buf) < 4:
        return []
    if buf[:4] not in codec.MAGIC:
        raise NotImplementedError("non-engine video container: plug in PyAV/ffmpeg here")
    frames, offsets = [], []
    for i in range(len(buf) - 3):
        if buf[i : i + 4] in codec.MAGIC:
            offsets.append(i)
    offsets.append(len(buf))
    for a, b in zip(offsets, offsets[1:]):
        frames.append(buf[a:b])
    return frames


def frame_concat(frame_bufs: list[bytes]) -> bytes:
    """Test helper: build a 'video' payload from engine-codec frames."""
    return b"".join(frame_bufs)


# --- audio ------------------------------------------------------------------

AUDIO_MAGIC = b"FPCM"  # engine audio container: magic + uint32 rate + int16 LE samples

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, sample_rate int, n_samples long, duration_sec double, "
    "rms double, peak double, zero_crossing_rate double"
)


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """Engine audio codec: FPCM + uint32 LE rate + int16 LE samples."""
    pcm = np.clip(np.asarray(samples), -1.0, 1.0)
    ints = np.round(pcm * 32767.0).astype("<i2")
    return AUDIO_MAGIC + int(sample_rate).to_bytes(4, "little") + ints.tobytes()


def _decode_audio_or_raise(buf: bytes) -> tuple[int, np.ndarray]:
    if buf is not None and len(buf) >= 8 and buf[:4] == AUDIO_MAGIC:
        rate = int.from_bytes(buf[4:8], "little")
        samples = np.frombuffer(buf[8:], dtype="<i2").astype(np.float64) / 32767.0
        return rate, samples
    raise NotImplementedError(
        "non-engine audio container: plug in soundfile/librosa here for "
        "real WAV/FLAC/MP3 payloads"
    )


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """Per-clip audio features (duration, RMS, peak, zero-crossing rate)
    via one Arrow-batched mapInPandas pass over (audio_id, bytes) — the
    audio analog of extract_image_features; same schema/batch/partitioning
    contract, numpy math over decoded samples."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "audio_id", "sample_rate", "n_samples", "duration_sec",
            "rms", "peak", "zero_crossing_rate",
        )
        for b in batches:
            out = {k: [] for k in cols}
            for audio_id, buf in zip(b["audio_id"], b["bytes"]):
                try:
                    rate, s = _decode_audio_or_raise(buf)
                except (ValueError, NotImplementedError):
                    continue
                if len(s) == 0 or rate <= 0:
                    continue
                out["audio_id"].append(audio_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(s))
                out["duration_sec"].append(len(s) / rate)
                out["rms"].append(float(np.sqrt(np.mean(s * s))))
                out["peak"].append(float(np.max(np.abs(s))))
                out["zero_crossing_rate"].append(
                    float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
                )
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


VIDEO_FEATURES_SCHEMA = (
    "video_id string, n_frames int, mean_luma double, "
    "mean_frame_delta double, max_frame_delta double"
)


def extract_video_features(videos: DataFrame) -> DataFrame:
    """Temporal per-video features over the engine frame container:
    frame count, mean luma, and inter-frame luma deltas (the scene-change /
    frozen-frame signals a video QC pipeline thresholds on). One
    Arrow-batched mapInPandas pass; frames decode with the engine codec,
    foreign containers raise at the documented PyAV/ffmpeg swap point and
    are skipped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("video_id", "n_frames", "mean_luma", "mean_frame_delta", "max_frame_delta")
        for b in batches:
            out = {k: [] for k in cols}
            for video_id, buf in zip(b["video_id"], b["bytes"]):
                try:
                    frames = _split_concatenated_frames(buf)
                except NotImplementedError:
                    continue
                pixels = []
                for fr in frames:
                    try:
                        pixels.append(codec.decode_image(fr)[2].astype(np.float64))
                    except (ValueError, struct.error, zlib.error):
                        continue
                if not pixels:
                    continue
                lumas = [float(p.mean()) for p in pixels]
                deltas = [
                    float(np.mean(np.abs(a - b_)))
                    for a, b_ in zip(pixels, pixels[1:])
                    if a.shape == b_.shape
                ]
                out["video_id"].append(video_id)
                out["n_frames"].append(len(pixels))
                out["mean_luma"].append(float(np.mean(lumas)))
                out["mean_frame_delta"].append(float(np.mean(deltas)) if deltas else 0.0)
                out["max_frame_delta"].append(float(np.max(deltas)) if deltas else 0.0)
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes").mapInPandas(run, VIDEO_FEATURES_SCHEMA)
