"""Multimodal columns: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns with a sidecar metadata
struct, processed with Arrow-batched ``mapInPandas`` kernels. The image
decoder is real when Pillow is importable (JPEG/PNG/etc. via
``_decode_image_pil``) and falls back to the deterministic SIMG stub
container otherwise — this sandbox has no Pillow/ffmpeg, so tests here run
the stub path, while a deployed cluster with Pillow gets real decoding with
zero code change (the kernel calls one dispatcher, ``decode_image_bytes``,
in both modes). Everything Spark-side (schemas, batch shapes, partitioning,
UDF signatures, null handling) is identical in both modes and tested.

The stub "image" format (testable end-to-end):
  bytes 0-3   magic  b"SIMG"
  bytes 4-7   width  (big-endian uint32)
  bytes 8-11  height (big-endian uint32)
  bytes 12+   payload (width*height luma bytes, possibly truncated)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"SIMG"

try:  # optional dependency: real codec when deployed with Pillow
    from PIL import Image as _PILImage
except ImportError:  # sandbox path: SIMG stub container only
    _PILImage = None

#: output schema of decode_image_features
IMAGE_FEATURES_SCHEMA = (
    "key string, width int, height int, n_bytes long, valid boolean, "
    "mean_luma double, phash string"
)


def encode_stub_image(key: str, width: int, height: int) -> bytes:
    """Deterministic synthetic image bytes (generator side)."""
    rng = np.random.default_rng(
        int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big"))
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes()
    return MAGIC + struct.pack(">II", width, height) + payload


def _decode_image_stub(blob: bytes) -> dict | None:
    """STUB decoder (stands in for Pillow/OpenCV — not installed here).

    Real deployments replace this body with e.g. ``PIL.Image.open``; the
    return contract (dict of typed features or None for undecodable) is what
    the Spark plumbing depends on, and that contract is exercised by tests.
    """
    if blob is None or len(blob) < 12 or blob[:4] != MAGIC:
        return None
    width, height = struct.unpack(">II", blob[4:12])
    payload = np.frombuffer(blob[12:12 + width * height], dtype=np.uint8)
    if payload.size == 0:
        return None
    mean = float(payload.mean())
    # perceptual-hash stand-in: 8x8 downsample sign bits of the luma grid
    grid = payload[: (payload.size // 64) * 64]
    if grid.size >= 64:
        coarse = grid.reshape(64, -1).mean(axis=1)
        bits = (coarse > coarse.mean()).astype(np.uint8)
        phash = np.packbits(bits).tobytes().hex()
    else:
        phash = ""
    return {"width": int(width), "height": int(height), "mean_luma": mean, "phash": phash}


def _decode_image_pil(blob: bytes) -> dict | None:
    """Real decoder (Pillow): JPEG/PNG/WebP/... → the same feature contract
    as the stub. Average-hash phash: 8×8 block-mean sign bits over the
    grayscale plane — the standard aHash."""
    import io

    try:
        with _PILImage.open(io.BytesIO(blob)) as im:
            width, height = im.size
            arr = np.asarray(im.convert("L"), dtype=np.uint8)
    except Exception:  # undecodable bytes → None, same as the stub contract
        return None
    if arr.size == 0:
        return None
    mean = float(arr.mean())
    h, w = arr.shape
    if h >= 8 and w >= 8:
        gh, gw = h // 8, w // 8
        coarse = arr[: gh * 8, : gw * 8].reshape(8, gh, 8, gw).mean(axis=(1, 3))
        bits = (coarse > coarse.mean()).astype(np.uint8)
        phash = np.packbits(bits.ravel()).tobytes().hex()
    else:
        phash = ""
    return {"width": int(width), "height": int(height), "mean_luma": mean, "phash": phash}


def decode_image_bytes(blob: bytes | None) -> dict | None:
    """One dispatcher for both modes (identical kernel code path): the SIMG
    stub container decodes everywhere; anything else decodes iff Pillow is
    importable. Returns the typed feature dict or None for undecodable."""
    if blob is None or len(blob) < 4:
        return None
    if blob[:4] == MAGIC:
        return _decode_image_stub(blob)
    if _PILImage is not None:
        return _decode_image_pil(blob)
    return None


def decode_image_features(images: DataFrame, key_col: str = "key", blob_col: str = "image") -> DataFrame:
    """Arrow-batched feature extraction over a binary image column."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for key, blob in zip(pdf[key_col], pdf[blob_col]):
                blob = bytes(blob) if blob is not None else None
                feat = decode_image_bytes(blob)
                out.append({
                    "key": key,
                    "width": feat["width"] if feat else None,
                    "height": feat["height"] if feat else None,
                    "n_bytes": len(blob) if blob is not None else 0,
                    "valid": feat is not None,
                    "mean_luma": feat["mean_luma"] if feat else None,
                    "phash": feat["phash"] if feat else None,
                })
            yield pd.DataFrame(out)

    return images.select(key_col, blob_col).mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index.

    The decode itself is stubbed (no ffmpeg here) — frame count is read from
    the metadata column; the explode/partitioning shape is the real part.
    """
    return (
        videos.withColumn(
            "frame_idx",
            F.explode(F.expr(f"sequence(0, greatest(n_frames - 1, 0), {every_n})")),
        )
        .withColumn("frame_key", F.concat_ws("#", "key", F.col("frame_idx").cast("string")))
    )
