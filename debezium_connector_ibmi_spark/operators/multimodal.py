"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The Spark-side machinery (schemas, batch iteration, partitioning,
UDF signatures) is real and tested; the codec step is a STUB — the
container has no image/audio libraries, so decode is either a
deterministic fake (default, testable end-to-end) or
``NotImplementedError`` (strict mode). Swapping in PIL/librosa later
changes only ``_decode_image_bytes`` / ``_decode_audio_bytes``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("source_url", T.StringType()),
    ]
)

IMAGE_META_SCHEMA = (
    "media_id long, width int, height int, n_bytes int, phash string"
)
AUDIO_META_SCHEMA = "media_id long, sample_rate int, n_samples long, rms_x1000 long"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame_phash string"
RESIZE_SCHEMA = (
    "media_id long, width int, height int, out_width int, "
    "out_height int, out_n_bytes long, resized_phash string"
)

STRICT = False  # True -> raise instead of deterministic fake


def _require_codec(kind: str):
    if STRICT:
        raise NotImplementedError(
            f"no {kind} codec in this environment; deterministic fake "
            "disabled (operators.multimodal.STRICT=True)"
        )


def _decode_image_bytes(b: bytes) -> tuple[int, int, str]:
    """STUB decode: deterministic fake dims + perceptual-hash stand-in
    derived from the bytes (import-gate a real codec here)."""
    try:  # real codec if ever available
        from PIL import Image  # noqa: F401
        import io

        img = Image.open(io.BytesIO(b))
        return img.width, img.height, format(hash(img.tobytes()) & 0xFFFF, "04x")
    except Exception:
        _require_codec("image")
        import hashlib

        h = hashlib.md5(b).hexdigest()
        return (
            int(h[:4], 16) % 1920 + 1,
            int(h[4:8], 16) % 1080 + 1,
            h[8:16],
        )


def _decode_audio_bytes(b: bytes) -> tuple[int, int, int]:
    _require_codec("audio")
    import hashlib

    h = hashlib.md5(b).hexdigest()
    return 16000, len(b) // 2, int(h[:4], 16)


def image_metadata(media: DataFrame) -> DataFrame:
    """Decode/inspect image payloads per Arrow batch (mapInPandas —
    one Python worker per partition, batches of
    spark.sql.execution.arrow.maxRecordsPerBatch rows)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_image_bytes)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": pdf["payload"].map(len),
                    "phash": [d[2] for d in decoded],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        op, schema=IMAGE_META_SCHEMA
    )


def audio_features(media: DataFrame) -> DataFrame:
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(_decode_audio_bytes)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [d[0] for d in decoded],
                    "n_samples": [d[1] for d in decoded],
                    "rms_x1000": [d[2] for d in decoded],
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        op, schema=AUDIO_META_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling stand-in: emits one row per sampled frame —
    exercising the 1-to-N mapInPandas shape real video decode needs."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_phash": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _require_codec("video")
                n_frames = max(1, len(payload) // 1000)
                for idx in range(0, n_frames, every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    # text-suffixed digest: deterministic AND
                    # reproducible by any ANSI engine (the raw-byte
                    # suffix variant isn't md5-able as VARCHAR)
                    out["frame_phash"].append(
                        hashlib.md5(
                            payload + f":{idx}".encode()
                        ).hexdigest()[:8]
                    )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        op, schema=FRAME_SAMPLE_SCHEMA
    )


def resize_images(media: DataFrame, max_dim: int = 512) -> DataFrame:
    """Aspect-preserving bounded resize (integer arithmetic, never
    upscales) — the thumbnail/normalization step of an image pipeline.
    Real plumbing, STUB codec like the rest of this module: input
    dims come from the (env-gated fake) decode, the output "pixels"
    are stood in by out_n_bytes = out_w*out_h*3 and a digest of
    (payload, out dims); swapping in PIL changes only the decode and
    the emitted bytes, not the Spark shape."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        out_cols = (
            "media_id", "width", "height", "out_width", "out_height",
            "out_n_bytes", "resized_phash",
        )
        for pdf in batches:
            out = {c: [] for c in out_cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _ = _decode_image_bytes(payload)
                m = max(w, h)
                if m <= max_dim:
                    ow, oh = w, h
                else:
                    ow = max(1, w * max_dim // m)
                    oh = max(1, h * max_dim // m)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["out_n_bytes"].append(ow * oh * 3)
                out["resized_phash"].append(
                    hashlib.md5(
                        payload + f":{ow}x{oh}".encode()
                    ).hexdigest()[:8]
                )
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        op, schema=RESIZE_SCHEMA
    )
