"""Worked example: the multimodal column pipeline on REAL payload bytes.

Media travels as opaque binary columns with typed metadata beside them;
every kernel below is an Arrow-batched mapInPandas pass (no per-row
Python boundary, no driver collect). Since round 10 the whole image path
runs on genuine bytes with zero external libraries:

  1. synthesize   — attach_real_payload(kind="image_mix"): every doc's
                    text becomes a real 24bpp BMP, a zlib-compressed PNG
                    (cycling row filters), a baseline JPEG
                    (stream-Huffman + DCT), or an LZW GIF, mixed by
                    content hash;
  2. decode       — decode_images(fake=False): magic-sniffed pure-Python
                    decoders emit (n_bytes, format, width, height,
                    mean_luma);
  3. resize       — resize_images(fake=False): pixel decode →
                    deterministic nearest-neighbor resample → PNG
                    re-encode;
  4. audio        — attach_real_payload(kind="wav") + audio_features:
                    PCM16 WAV synthesis, then RMS / zero-crossing rate /
                    FFT spectral centroid per clip.

Only mp3/video still require the env-blocked libraries; those kernels
raise loudly rather than pretending (see operators/multimodal.py).

    python examples/multimodal_pipeline.py [sf_dir]   # default sf0.01
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from n2kupdate_spark.operators.multimodal import (  # noqa: E402
    attach_real_payload,
    audio_features,
    decode_images,
    resize_images,
)
from n2kupdate_spark.session import get_spark  # noqa: E402
from n2kupdate_spark.sources import load  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents", columns=["doc_id", "text"])
    images = attach_real_payload(docs, "doc_id", "text", kind="image_mix")

    feats = decode_images(images, fake=False)
    print("-- decoded image metadata by format (all real byte parsing):")
    feats.groupBy("format").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("width"), 1).alias("avg_w"),
        F.round(F.avg("mean_luma"), 4).alias("avg_luma"),
    ).orderBy("format").show()

    resized = resize_images(images, 16, 12, fake=False)
    check = decode_images(resized.select("doc_id", "payload", F.lit("png").alias("format")), fake=False)
    n_ok = check.filter("format = 'png' AND width = 16 AND height = 12").count()
    print(f"-- resized payloads that re-decode as 16x12 PNG: {n_ok}/{docs.count()}")

    # frame sampling on REAL animated GIFs (every 2nd frame, max 3)
    from pyspark.sql import types as T

    from n2kupdate_spark.operators.multimodal import (
        encode_gif_animated,
        sample_frames,
    )

    def gif_batches(batches):
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [
                        encode_gif_animated(12, 8, 6, (t or "").encode("utf-8"))
                        for t in pdf["text"]
                    ],
                }
            )

    anims = docs.limit(100).mapInPandas(
        gif_batches,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("payload", T.BinaryType()),
            ]
        ),
    )
    frames = sample_frames(anims, every_n=2, max_frames=3, fake=False)
    n_frames = frames.count()
    print(f"-- sampled {n_frames} real PNG frames from 100 six-frame GIFs "
          "(every 2nd frame, capped at 3)")

    wavs = attach_real_payload(docs, "doc_id", "text", kind="wav")
    dsp = audio_features(wavs)
    print("-- audio DSP features (RMS / ZCR / spectral centroid):")
    dsp.agg(
        F.round(F.avg("rms"), 4).alias("avg_rms"),
        F.round(F.avg("zcr"), 4).alias("avg_zcr"),
        F.round(F.avg("spectral_centroid_hz"), 1).alias("avg_centroid_hz"),
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
