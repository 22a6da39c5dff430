"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real image/audio/video codecs are not present in this container, so the
decode step is STUBBED: ``decode_features(..., use_real_codecs=True)``
raises NotImplementedError, while the default deterministic fake derives
"decoded" features from the payload's md5 — which makes the whole
mapInPandas pipeline (schema, Arrow batching, partition parallelism)
real and testable, and even SQL-oracle-verifiable.

Schema/shape design for 100 TB:
- payload is a single ``binary`` column (parquet keeps it out of row-group
  stats; column pruning skips it unless projected);
- metadata is scalar columns, not a nested blob, so filters on modality /
  byte_len push down to the scan;
- decode runs in ``mapInPandas`` over Arrow batches — per-partition
  streaming, bounded memory, no driver involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redis_streams_spark.functions.rounding import rnd

from redis_streams_spark.functions.hashing import h32

MODALITIES = ["image", "audio", "video"]

DECODED_SCHEMA = (
    "doc_id bigint, modality string, byte_len bigint, checksum string, "
    "width bigint, height bigint, n_frames bigint, mean_byte double"
)


def modality_col(id_col: Column) -> Column:
    return (
        F.when(id_col % 3 == 0, MODALITIES[0])
        .when(id_col % 3 == 1, MODALITIES[1])
        .otherwise(MODALITIES[2])
    )


def attach_blob(docs: DataFrame) -> DataFrame:
    """Turn documents into multimodal rows: binary payload + typed
    metadata (deterministic stand-in for real media files)."""
    return docs.select(
        "doc_id",
        modality_col(F.col("doc_id")).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.length(F.encode("text", "UTF-8")).cast("long").alias("byte_len"),
        F.md5("text").alias("checksum"),
    )


def fake_dims(text_col: Column) -> tuple[Column, Column, Column]:
    """Deterministic fake decode dimensions from content hashes (same
    arithmetic as the Python fake decoder and the SQL oracle)."""
    width = (64 + h32(F.concat(text_col, F.lit(":w"))) % 960).cast("long")
    height = (64 + h32(F.concat(text_col, F.lit(":h"))) % 960).cast("long")
    n_frames = (1 + h32(F.concat(text_col, F.lit(":f"))) % 120).cast("long")
    return width, height, n_frames


def mean_md5_byte(text_col: Column) -> Column:
    """Mean of the 16 md5 digest bytes — the fake 'mean pixel value'."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.lit(15)),
        lambda i: F.conv(F.substring(F.md5(text_col), i * 2 + 1, 2), 16, 10).cast(
            "long"
        ),
    )
    return rnd(
        F.aggregate(pairs, F.lit(0).cast("long"), lambda a, x: a + x) / 16.0, 4
    )


def _fake_decode_row(text: str) -> tuple[int, int, int, float]:
    def _h32(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)

    digest = hashlib.md5(text.encode("utf-8")).digest()
    width = 64 + _h32(text + ":w") % 960
    height = 64 + _h32(text + ":h") % 960
    n_frames = 1 + _h32(text + ":f") % 120
    mean_byte = round(sum(digest) / 16.0, 4)
    return width, height, n_frames, mean_byte


def decode_features(docs: DataFrame, use_real_codecs: bool = False) -> DataFrame:
    """Decode / feature-extract over Arrow batches via mapInPandas.

    With ``use_real_codecs=True`` this is where PIL/ffmpeg/soundfile would
    decode ``payload`` — unavailable in this environment, so it raises
    (clearly-marked stub).  The default fake is deterministic md5
    arithmetic, so downstream operators and the SQL oracle can verify the
    full pipeline shape.
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg) are not available in this "
            "environment; the Spark-side plumbing below is the real "
            "production shape — swap _fake_decode_row for a codec call"
        )

    src = docs.select("doc_id", "text")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf["text"]
            feats = [_fake_decode_row(t) for t in texts]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [
                        MODALITIES[i % 3] for i in pdf["doc_id"].astype(int)
                    ],
                    "byte_len": [len(t.encode("utf-8")) for t in texts],
                    "checksum": [
                        hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts
                    ],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_frames": [f[2] for f in feats],
                    "mean_byte": [f[3] for f in feats],
                }
            )
            yield out

    return src.mapInPandas(_decode, schema=DECODED_SCHEMA)


def resize_plan(width, height, max_side: int = 256):
    """Deterministic resize arithmetic (aspect-preserving fit into a
    max_side box, floor semantics) — the Spark-side planning step of an
    image-resize stage; the pixel transform itself would live in the
    decode_features mapInPandas batch (codec-stubbed here)."""
    from pyspark.sql import functions as F

    scale_num = F.lit(max_side)
    longest = F.greatest(width, height)
    out_w = F.when(longest <= max_side, width).otherwise(
        (width * scale_num / longest).cast("long")
    )
    out_h = F.when(longest <= max_side, height).otherwise(
        (height * scale_num / longest).cast("long")
    )
    return out_w, out_h


def frame_sample_indices(n_frames, k: int = 4):
    """Deterministic frame sampling: k evenly-spaced frame indexes
    (floor(i * n / k)), clamped to valid range — the video analog of
    resize planning."""
    from pyspark.sql import functions as F

    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.least((i * n_frames / k).cast("long"), n_frames - 1),
    )
