"""Multimodal (image/audio/video) column plumbing.

Design (SURVEY.md §2 Part C / task north star): media travels as opaque
``binary`` payload columns with typed metadata columns beside them; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas
functions over ``mapInPandas`` so each executor processes whole record
batches without driver involvement.

The container has no image/audio LIBRARIES (PIL/cv2/soundfile/ffmpeg), but
since round 9 the UNCOMPRESSED formats decode for real in pure Python —
BMP 24bpp and PPM P6 images (`_decode_bmp`/`_decode_ppm`), PCM16 WAV audio
(`decode_audio`) — with matching deterministic encoders
(`encode_bmp`/`encode_wav`) so the whole pipeline runs on genuine payload
bytes end-to-end. Only compressed formats (png/jpeg/mp3/...) remain
stubbed: ``decode_image`` raises NotImplementedError for them unless
``fake=True``, which derives deterministic pseudo-metadata from the
payload bytes (md5-seeded), keeping every Spark-side contract — schema,
batch iteration, partitioning — real and testable either way.

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
        # uncompressed formats decode for REAL without any library (r9):
        # BMP 24bpp / PPM P6 are plain byte layouts — sniff by magic
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        try:
            import io

            from PIL import Image
        except ImportError:
            raise NotImplementedError(
                "compressed-image codecs unavailable in this environment "
                f"(available_codecs()={available_codecs()}); BMP/PPM/WAV "
                "decode library-free, or pass fake=True for deterministic "
                "pseudo-decode (see module docstring)"
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


# --------------------------------------------------------------------------
# Pure-Python codecs for UNCOMPRESSED formats (round 9). PIL/cv2/soundfile/
# ffmpeg are absent in this container (BASELINE.md §7), but BMP (24bpp
# BI_RGB), PPM (P6), and WAV (PCM16) are trivial public byte layouts — so
# decode is REAL for them, jar- and library-free; the NotImplementedError
# seam now covers only compressed formats (png/jpeg/mp3/...).


def encode_bmp(width: int, height: int, seed: bytes) -> bytes:
    """Deterministic 24bpp BI_RGB bottom-up BMP with md5-seeded pixels —
    a REAL image payload for the decode pipeline without any library."""
    import numpy as np
    import struct

    rng = np.random.RandomState(
        int.from_bytes(hashlib.md5(seed).digest()[:4], "little")
    )
    px = rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)  # BGR
    row_size = (3 * width + 3) & ~3
    pad = row_size - 3 * width
    body = b"".join(
        px[r].tobytes() + b"\x00" * pad for r in range(height - 1, -1, -1)
    )
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    header = b"BM" + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    return header + dib + body


def _decode_bmp(payload: bytes) -> dict:
    import numpy as np
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24bpp BI_RGB supported (got bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (3 * w + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=pixel_off
    ).reshape(h, row_size)[:, : 3 * w].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    bgr = rows.astype(np.float64)
    luma = 0.114 * bgr[..., 0] + 0.587 * bgr[..., 1] + 0.299 * bgr[..., 2]
    return {
        "n_bytes": len(payload),
        "format": "bmp",
        "width": int(w),
        "height": int(h),
        "mean_luma": round(float(luma.mean()) / 255.0, 4),
    }


def _decode_ppm(payload: bytes) -> dict:
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header tokens: P6 <w> <h> <maxval>, whitespace/comment separated
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    rgb = px.reshape(h, w, 3).astype(np.float64)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    return {
        "n_bytes": len(payload),
        "format": "ppm",
        "width": int(w),
        "height": int(h),
        "mean_luma": round(float(luma.mean()) / maxval, 4),
    }


#: Schema of the decoded-audio feature frame produced by decode_audios().
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def encode_wav(n_samples: int, sample_rate: int, seed: bytes, channels: int = 1) -> bytes:
    """Deterministic PCM16 WAV (md5-seeded samples) — a REAL audio
    payload for the decode pipeline without any library."""
    import numpy as np
    import struct

    rng = np.random.RandomState(
        int.from_bytes(hashlib.md5(seed).digest()[4:8], "little")
    )
    samples = rng.randint(-32768, 32768, size=n_samples * channels, dtype=np.int16)
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_audio(payload: bytes) -> dict:
    """REAL pure-Python WAV (PCM16) decode: rate, channels, sample count,
    duration, normalized RMS. Compressed audio needs the env-blocked
    libraries and raises."""
    import numpy as np
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only PCM WAV decodes without audio libraries "
            f"(available_codecs()={available_codecs()})"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only PCM16 WAV supported without libraries")
    samples = np.frombuffer(data, dtype="<i2")
    n_frames = len(samples) // channels
    rms = float(np.sqrt(np.mean((samples.astype(np.float64) / 32768.0) ** 2))) if len(samples) else 0.0
    return {
        "n_bytes": len(payload),
        "sample_rate": int(rate),
        "channels": int(channels),
        "n_samples": int(n_frames),
        "duration_s": round(n_frames / rate, 4),
        "rms": round(rms, 4),
    }


def decode_audios(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas audio decode: WAV payload batches → typed feature rows
    (same iterator-of-batches contract as decode_images; REAL decode,
    no stub — PCM WAV needs no library)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out[[f.name for f in AUDIO_FEATURES_SCHEMA.fields]]

    return df.mapInPandas(decode_batches, AUDIO_FEATURES_SCHEMA)


def attach_real_payload(
    df: DataFrame, id_col: str, text_col: str, kind: str = "bmp"
) -> DataFrame:
    """Attach a GENUINE media payload column derived deterministically
    from each row's text — real BMP bytes (``kind="bmp"``) or real PCM16
    WAV bytes (``kind="wav"``) via the pure-Python encoders, so the
    decode pipeline downstream exercises true byte-layout parsing, not a
    pseudo-decode. Dimensions/sample counts are md5-derived and small
    (8–39 px / ≤2k samples) to keep synthesis cheap; Arrow-batched."""

    def make_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for txt in pdf[text_col]:
                seed = (txt or "").encode("utf-8")
                d = hashlib.md5(seed).digest()
                if kind == "bmp":
                    payloads.append(encode_bmp(8 + d[0] % 32, 8 + d[1] % 32, seed))
                else:
                    payloads.append(encode_wav(256 + d[0] * 8, 16000, seed))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "payload": payloads,
                    "format": kind,
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("format", T.StringType()),
        ]
    )
    return df.select(id_col, text_col).mapInPandas(make_batches, schema)
