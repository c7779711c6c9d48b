"""Multimodal (image/audio/video) column plumbing.

Design (SURVEY.md §2 Part C / task north star): media travels as opaque
``binary`` payload columns with typed metadata columns beside them; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas
functions over ``mapInPandas`` so each executor processes whole record
batches without driver involvement.

The container has no image/audio codecs, so the *decode kernel* is stubbed:
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case it derives deterministic pseudo-metadata from the payload bytes (md5-
seeded), keeping every Spark-side contract — schema, batch iteration,
partitioning — real and testable.

Scale notes: payload bytes never pass through Python row-by-row (Arrow
batches), never collect to the driver, and metadata-only queries prune the
binary column at the parquet scan. At 100 TB, media payloads should live in
their own parquet column chunk (large row groups) exactly so this pruning
works.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the decoded-image feature frame produced by decode_images().
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic binary payload column from text (stand-in for
    a real media column; same bytes every run → oracle-safe row counts)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("png").alias("format"),
    )


def available_codecs() -> dict[str, bool]:
    """Runtime probe of media libraries (import-try only — no hard deps).

    Recorded for this container in BASELINE.md §7: all False (no Pillow,
    no cv2, no soundfile, no ffmpeg) — which is why the decode kernels
    default to the deterministic fake path."""
    import importlib.util
    import shutil

    return {
        "pillow": importlib.util.find_spec("PIL") is not None,
        "cv2": importlib.util.find_spec("cv2") is not None,
        "soundfile": importlib.util.find_spec("soundfile") is not None,
        "ffmpeg": shutil.which("ffmpeg") is not None,
    }


def decode_image(payload: bytes, fmt: str, fake: bool = False) -> dict:
    """Decode one image payload → metadata dict.

    With ``fake=False`` this uses Pillow when importable (real decode:
    dimensions + mean luma from the grayscale histogram); in an environment
    with no image library (this container — BASELINE.md §7 probe) it raises
    rather than pretending. ``fake=True`` derives deterministic
    pseudo-metadata from the bytes so the pipeline around the kernel is
    fully exercisable either way.
    """
    if not fake:
        try:
            import io

            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                "image codecs unavailable in this environment "
                f"(available_codecs()={available_codecs()}); pass fake=True "
                "for deterministic pseudo-decode (see module docstring)"
            ) from None
        img = Image.open(io.BytesIO(payload))
        gray = img.convert("L")
        hist = gray.histogram()
        n_px = sum(hist) or 1
        mean_luma = round(sum(i * c for i, c in enumerate(hist)) / n_px / 255.0, 4)
        return {
            "n_bytes": len(payload),
            "format": (img.format or fmt or "").lower(),
            "width": img.width,
            "height": img.height,
            "mean_luma": mean_luma,
        }
    digest = hashlib.md5(payload).digest()
    width = 64 + digest[0] % 192  # 64..255, deterministic from content
    height = 64 + digest[1] % 192
    mean_luma = round(digest[2] / 255.0, 4)
    return {
        "n_bytes": len(payload),
        "format": fmt,
        "width": width,
        "height": height,
        "mean_luma": mean_luma,
    }


def decode_images(df: DataFrame, id_col: str = "doc_id", fake: bool = True) -> DataFrame:
    """mapInPandas decode: binary payload batches → typed feature rows.

    The iterator-of-batches shape is the real contract: one Arrow batch in,
    one out, constant memory per executor thread regardless of table size.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p, f, fake=fake) for p, f in zip(pdf["payload"], pdf["format"])]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out[[f.name for f in IMAGE_FEATURES_SCHEMA.fields]]

    return df.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """mapInPandas resize: payload batches → resized payload batches.

    STUB kernel (no codecs in this container): ``fake=True`` derives the
    resized bytes deterministically (md5-keyed stream sized ∝ w·h) so the
    batch shape, binary round-trip, and schema are all real. A production
    kernel swaps one function: bytes→bytes, per element, inside the batch
    loop — nothing else changes."""

    def resize_one(payload: bytes) -> bytes:
        if not fake:
            raise NotImplementedError("image codecs unavailable; pass fake=True")
        seed = hashlib.md5(payload).digest()
        n = max(1, (width * height) // 64)
        return (seed * (n // len(seed) + 1))[:n]

    def batches_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": [resize_one(p) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(batches_fn, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, every_n: int = 10, max_frames: int = 8, id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """mapInPandas frame sampling: one input row (video payload) → several
    output rows (sampled frames) — the row-expanding shape of a UDTF, kept
    in mapInPandas so frames stay Arrow-batched.

    STUB kernel: frame count is derived from payload length (1 frame per
    ``every_n`` payload bytes, capped), frame bytes md5-derived — the
    expansion topology and batch memory profile are the real contract."""

    def frames_of(payload: bytes) -> list[bytes]:
        if not fake:
            raise NotImplementedError("video codecs unavailable; pass fake=True")
        n = min(max_frames, max(1, len(payload) // every_n))
        return [hashlib.md5(payload + bytes([i])).digest() for i in range(n)]

    def batches_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for i, fr in enumerate(frames_of(payload)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return df.mapInPandas(batches_fn, FRAME_SCHEMA)
