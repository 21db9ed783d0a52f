"""Structured Streaming form of the container-demux ingest — the
crawl-side shape: video blobs land continuously, each micro-batch is
demuxed to per-sample rows, and a media-time keyframe-density rollup
feeds the curation decision (e.g. drop slideshows / near-static
screencasts whose keyframe rate is degenerate).

The demuxers (operators/mp4.mp4_demux, operators/mkv.mkv_demux) are
STATELESS Arrow-batched mapInPandas flat-maps, so the exact same
operator objects run unmodified on a readStream DataFrame — no
state, no watermark, append mode. That is the point the tests pin:
write the demux once, run it in either mode (the same claim
streaming/documents.py makes for the text-curation stages).

The rollup converts the track's media timestamps (ticks) to seconds
and windows on MEDIA time, which is data-deterministic — stream and
batch produce identical rollups regardless of arrival order, unlike
an ingest-time rollup. Aggregations run in complete mode in the test
harness; production appends with a watermark on the ingest-time
column the landing zone stamps.

The reference has no streaming and no containers (SURVEY §2.10);
capability extension for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOB_SCHEMA = "doc_id LONG, content BINARY"


def read_blob_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of (doc_id, content) blob rows (one file per
    trigger keeps tests deterministic; production points this at the
    crawl drop)."""
    return (
        spark.readStream.schema(BLOB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def demux_mp4_stream(blobs: DataFrame) -> DataFrame:
    """mp4_demux applied verbatim to a (possibly streaming) blob
    DataFrame — stateless flat-map, append-mode safe."""
    from fuse_query_spark.operators.mp4 import mp4_demux

    return mp4_demux(blobs)


def keyframe_density(samples: DataFrame, timescale: int = 12800) -> DataFrame:
    """Per-(doc, 1s-of-media-time) keyframe/sample counts over the
    video track — the curation signal. Media-time windows make the
    rollup arrival-order-independent (stream == batch, exactly).
    Pure Column expressions + a windowed agg; in streaming this is a
    stateful aggregation (complete mode in tests; watermarked append
    on an ingest-time column in production)."""
    v = samples.where(F.col("handler") == "vide")
    return (
        v.withColumn("media_ts", F.timestamp_seconds(F.col("dts") / timescale))
        .groupBy("doc_id", F.window("media_ts", "1 second").alias("w"))
        .agg(
            F.sum("is_sync").alias("keyframes"),
            F.count(F.lit(1)).alias("samples"),
            F.sum("kf_pick").alias("sampled_frames"),
        )
        .select(
            "doc_id",
            F.col("w.start").cast("long").alias("win_start_s"),
            "keyframes",
            "samples",
            "sampled_frames",
        )
    )
