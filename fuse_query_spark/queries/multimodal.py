"""Multimodal plumbing as an oracle-checked query: the Arrow-batched
mapInPandas metadata path runs end-to-end against a DuckDB oracle
computing the same deterministic facts SQL-side (byte length, md5 of
the utf-8 payload, the stub's dimension arithmetic). The pixel/frame
decode steps remain documented NotImplementedError stubs
(operators/multimodal.py) — what this verifies is everything Spark
owns: schema, Arrow batch iteration, partition-parallel execution,
value fidelity of the bytes round-trip."""

from __future__ import annotations

from fuse_query_spark.operators.multimodal import decode_image_meta, synthesize_blobs
from fuse_query_spark.queries import register
from fuse_query_spark.sources.tables import table


@register(
    "multimodal_blob_meta",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS INT) AS n_bytes,
           md5(text) AS checksum,
           CAST(strlen(text) % 640 + 1 AS INT) AS width,
           CAST(strlen(text) % 480 + 1 AS INT) AS height,
           'fake/binary' AS format
    FROM documents
    """,
    tags=("pipeline", "multimodal", "mapinpandas"),
)
def multimodal_blob_meta(spark, sf_dir):
    """Binary-column metadata extraction over mapInPandas: documents →
    synthetic blobs (utf-8 bytes) → Arrow-batched per-blob metadata.
    DuckDB strlen/md5 over VARCHAR operate on the same utf-8 bytes, so
    the whole Python-batch path is hash-verified, not just shape-
    tested."""
    blobs = synthesize_blobs(table(spark, sf_dir, "documents"))
    return decode_image_meta(blobs)
