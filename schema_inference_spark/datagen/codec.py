"""Deterministic stand-in image codec.

The sandbox has no PIL/libjpeg, so the engine ships a tiny self-contained
codec with the *shape* of a real one: a lossless container ("FPNG"/"FWBP")
and a lossy, quantizing container ("FJPG") whose quantization step controls
PSNR. Every byte is a pure function of (image_id, w, h, fmt, quality), so
tests and benches are reproducible with no external data.

In production this module is the ONLY swap point: replace ``encode_image`` /
``decode_image`` with PIL/turbojpeg calls — the Spark-side plumbing
(BinaryType column, Arrow-batched mapInPandas, schema of the decode output)
is identical. PSNR math below is the real thing.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

MAGIC = {b"FPNG": "png", b"FJPG": "jpeg", b"FWBP": "webp"}
MAGIC_FOR = {v: k for k, v in MAGIC.items()}

# Lossy quantization steps: q=4 -> ~47 dB (comfortably above the 40 dB
# gate), q=32 -> ~29 dB (comfortably below). MSE of uniform quantization
# with step q is ~q^2/12.
GOOD_QUALITY_STEP = 4
BAD_QUALITY_STEP = 32


def _seed_for(image_id: str) -> int:
    return int.from_bytes(hashlib.md5(image_id.encode()).digest()[:8], "big")


def reference_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """The deterministic source pattern for an image id — the sandbox analog
    of 'the reference decode' the PSNR invariant compares against."""
    rng = np.random.default_rng(_seed_for(image_id))
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def phash_of(pixels: np.ndarray) -> int:
    """Deterministic 60-bit perceptual-hash stand-in (content hash of the
    2x2-block means, so near-identical pixels collide)."""
    h, w = pixels.shape
    blocks = pixels[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    coarse = (blocks // 16).astype(np.uint8).tobytes()
    return int.from_bytes(hashlib.md5(coarse).digest()[:8], "big") >> 4


def encode_image(pixels: np.ndarray, fmt: str, quality_step: int = GOOD_QUALITY_STEP) -> bytes:
    """Encode a (h, w) uint8 array. 'png'/'webp' lossless, 'jpeg' lossy."""
    h, w = pixels.shape
    magic = MAGIC_FOR[fmt]
    if fmt == "jpeg":
        q = quality_step
        quantized = ((pixels.astype(np.int32) // q) * q + q // 2).clip(0, 255).astype(np.uint8)
        payload = zlib.compress(quantized.tobytes(), 1)
        return magic + struct.pack("<HHB", w, h, q) + payload
    payload = zlib.compress(pixels.tobytes(), 1)
    return magic + struct.pack("<HH", w, h) + payload


def decode_image(buf: bytes) -> tuple[int, int, np.ndarray]:
    """Decode to (w, h, pixels). Raises ValueError on corrupt/truncated data."""
    if buf is None or len(buf) < 8:
        raise ValueError("truncated image buffer")
    magic, fmt = buf[:4], MAGIC.get(buf[:4])
    if fmt is None:
        raise ValueError(f"bad magic {magic!r}")
    if fmt == "jpeg":
        w, h, _q = struct.unpack("<HHB", buf[4:9])
        raw = zlib.decompress(buf[9:])
    else:
        w, h = struct.unpack("<HH", buf[4:8])
        raw = zlib.decompress(buf[8:])
    if len(raw) != w * h:
        raise ValueError("payload size mismatch")
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    if a.shape != b.shape:
        return 0.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
