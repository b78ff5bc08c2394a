"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` columns with typed metadata — the Spark-native
way to carry media through a 100 TB training-data pipeline (partition by
asset id / shard, never collect). Decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` operators so codec work
is vectorized per batch and scales with partitions.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode kernels are stubbed two ways:
- ``decode_image_meta`` parses our deterministic fake header (magic
  ``FIMG`` + big-endian u32 width/height) — real Spark plumbing (schema,
  batching, null handling) with a fake codec;
- ``decode_image_pixels`` raises ``NotImplementedError`` exactly where a
  real decoder plugs in.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FIMG"

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_META_SCHEMA = (
    "asset_id long, kind string, width int, height int, n_bytes int, valid boolean"
)


def fake_image_bytes(width: int, height: int, fill: int = 0) -> bytes:
    """Deterministic fake image payload: FIMG + u32 w + u32 h + pixel bytes."""
    return MAGIC + struct.pack(">II", width, height) + bytes([fill % 256]) * (width * height)


def decode_image_meta(assets: DataFrame) -> DataFrame:
    """mapInPandas decode of the fake header → typed metadata columns.

    Real plumbing: Arrow batch in/out, per-row binary parsing, malformed
    payloads surface as valid=false rows instead of task failures.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for aid, kind, data in zip(pdf["asset_id"], pdf["kind"], pdf["data"]):
                ok = data is not None and bytes(data[:4]) == MAGIC and len(data) >= 12
                w, h = struct.unpack(">II", bytes(data[4:12])) if ok else (0, 0)
                rows.append((aid, kind, w, h, len(data) if data is not None else 0, bool(ok)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "width", "height", "n_bytes", "valid"]
            )

    return assets.mapInPandas(batches, schema=IMAGE_META_SCHEMA)


def decode_image_pixels(assets: DataFrame) -> DataFrame:
    """Full pixel decode — requires a real codec (PIL/libjpeg), absent here."""
    raise NotImplementedError(
        "pixel decode needs an image codec (PIL) not present in this "
        "container; decode_image_meta exercises the Spark-side plumbing"
    )


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — requires ffmpeg bindings, absent here."""
    raise NotImplementedError("frame sampling needs ffmpeg; stub per SURVEY north star")


def filter_valid_images(assets: DataFrame, min_width: int = 1) -> DataFrame:
    """Composable pipeline step: decode meta → keep structurally valid assets."""
    meta = decode_image_meta(assets)
    return meta.filter(F.col("valid") & (F.col("width") >= min_width))
