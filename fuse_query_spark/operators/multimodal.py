"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this
container): `decode_image_meta` produces deterministic fake metadata
derived from the bytes, and `decode_image_pixels` raises
NotImplementedError with the exact integration point documented. The
Spark-side contract — schema, batch iterator signature, partitioning —
is real and tested (tests/test_multimodal.py).

Scale notes: mapInPandas streams Arrow batches; binary payloads never
materialize on the driver. Partition sizing for blob columns should be
row-count based (spark.sql.files.maxPartitionBytes already accounts
for byte size at the parquet scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = "doc_id LONG, n_bytes INT, checksum STRING, width INT, height INT, format STRING"


def synthesize_blobs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake binary column (UTF-8 bytes of the text) —
    stands in for real image/audio payloads in tests."""
    return df.select(id_col, F.encode(F.col(text_col), "UTF-8").alias("content"))


def decode_image_meta(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Extract per-blob metadata via mapInPandas (Arrow batches).

    STUB: width/height are deterministic functions of the byte length;
    a real deployment replaces `_fake_meta` with PIL/libvips decode of
    `row.content` — the batch shape and output schema stay identical.
    """

    def _fake_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["content"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n.astype("int32"),
                    "checksum": pdf["content"].map(lambda b: hashlib.md5(b).hexdigest()),
                    # deterministic fake dimensions (real impl: decoded size)
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "format": "fake/binary",
                }
            )

    return blobs.mapInPandas(_fake_meta, BLOB_META_SCHEMA)


def decode_image_pixels(blobs: DataFrame) -> DataFrame:
    """Real pixel decode — requires an image library absent from this
    environment. Integration point: a mapInPandas with schema
    `doc_id LONG, pixels BINARY, width INT, height INT`."""
    raise NotImplementedError(
        "pixel decode requires PIL/libvips; wire it into a mapInPandas "
        "with the same batch contract as decode_image_meta"
    )


def frame_sample(blobs: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB for the same reason; the real
    operator emits one row per sampled frame (doc_id, frame_idx,
    content) via a flat-mapping mapInPandas."""
    raise NotImplementedError(
        "frame sampling requires a video decoder; the operator shape is "
        "mapInPandas producing (doc_id LONG, frame_idx INT, content BINARY)"
    )
