"""Multimodal real-codec session: the image / audio / video triple
decoded end-to-end with the engine's dependency-free parsers.

Synthesizes one real payload per modality family — BMP, PPM, PNG,
baseline JPEG (operators/jpeg.py), PCM WAV (operators/wav.py), and an
ISO-BMFF/MP4 box tree (operators/mp4.py) — attaches them as a binary
column, and runs the production ``decode_features(use_real_codecs=True)``
mapInPandas path: modality from payload magic, dimensions / sample
rate / frame counts from the actual container bytes.  Then the
driver-gate queries for each tier (mm_jpeg_decode, mm_wav_meta,
mm_mp4_meta) run against the documents table.

Run: python examples/multimodal_codecs.py [sf_dir]
"""

from __future__ import annotations

import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redis_streams_spark.operators.jpeg import make_jpeg
from redis_streams_spark.operators.mp4 import make_mp4
from redis_streams_spark.operators.multimodal import (
    decode_features,
    make_bmp,
    make_png,
    make_ppm,
)
from redis_streams_spark.operators.wav import make_wav
from redis_streams_spark.queries import all_queries
from redis_streams_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("multimodal-codecs")

    px = bytes(range(48)) * 4  # 192 bytes = 8x8 RGB
    pcm = struct.pack("<160h", *((i * 37) % 8000 - 4000 for i in range(160)))
    payloads = [
        (0, make_bmp(8, 8, px)),
        (1, make_ppm(8, 8, px)),
        (2, make_png(8, 8, px)),
        (3, make_jpeg(8, 8, px)),
        (4, make_wav(pcm, sample_rate=8000)),
        (5, make_mp4(640, 360, 48, duration_ms=1920, mdat=b"demo-gop")),
    ]
    docs = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in payloads],
        "doc_id bigint, payload binary",
    )
    print("-- real-codec decode of one payload per format:")
    decode_features(docs, use_real_codecs=True).orderBy("doc_id").show(
        truncate=False
    )
    print("   (audio rows: width=sample_rate, height=channels,")
    print("    n_frames=PCM frames, mean_byte=mean |amplitude|/256)")

    q = all_queries()
    print("-- driver-gate tiers over the documents table:")
    for name in ("mm_jpeg_decode", "mm_wav_meta", "mm_mp4_meta"):
        print(f"   {name}:")
        q[name].fn(spark, sf_dir).show(3, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
