"""Structured Streaming operators over the events schema.

The reference has no event-time streaming at all (SURVEY §2.10: its
"streams" are pull-based batch iterators — common/streams/src/
stream.rs:9); this module is the capability extension: readStream →
watermarked windowed aggregation → sink, with the same transformations
as the batch queries in queries/events.py so results can be
cross-checked batch-vs-stream (tests/test_streaming.py).

Scale posture: watermarks bound state; session_window/window state is
keyed by (window, key) and expires past the watermark — the standard
100 TB streaming topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of events rows (one-file-per-trigger keeps
    tests deterministic; in production this is a Kafka/file drop)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def read_events_snapshot_stream(spark: SparkSession, path: str) -> DataFrame:
    """Like read_events_stream but WITHOUT one-file-per-trigger: under
    trigger(availableNow) the whole backlog lands in one micro-batch —
    the snapshot shape stream_overwrite_partitions requires."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the
    streaming form of queries/events.events_tumbling_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def hopping_counts(
    events: DataFrame,
    window: str = "1 hour",
    hop: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked hopping-window counts — the streaming form of
    queries/events.events_hopping_15m (each event in window/hop
    overlapping windows; state size scales with #open windows ×
    #types, bounded by the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, hop).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (session_window) — the streaming form of
    queries/events.events_sessionize."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def run_to_memory_sink(
    stream_df: DataFrame, name: str, timeout_sec: int = 120, output_mode: str = "complete"
) -> None:
    """Drain the stream with an availableNow trigger into an in-memory
    table — the test harness path. complete mode for aggregations
    (default); non-aggregating streams (dedup) must use append."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        # returning as if drained would hand the caller a partial sink
        # and leave a live query holding the checkpoint
        q.stop()
        raise TimeoutError(f"stream '{name}' did not drain within {timeout_sec}s")


def dedup_events_stream(
    events: DataFrame, watermark: str = "2 hours", keys: tuple[str, ...] = ("event_id",)
) -> DataFrame:
    """Streaming exact deduplication with bounded state:
    dropDuplicatesWithinWatermark keeps one row per key and EXPIRES
    the key's state once the watermark passes it — without the
    watermark bound, streaming dropDuplicates state grows with the
    key cardinality forever (the classic 100 TB streaming OOM). The
    batch twin is operators.dedup.dedup_exact keyed the same way;
    tests cross-check stream-vs-batch results on the same corpus."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def rate_limited_counts(
    events: DataFrame, window: str = "15 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Per-user windowed event counts — the streaming primitive behind
    rate limiting / abuse detection (count per user per window; a
    filter on the count downstream flags hot keys). State is
    (window × user) and expires past the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "user_id", "n")
    )


def funnel_join_stream(
    events: DataFrame, lookback: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's clicks in the preceding `lookback` — the funnel/attribution
    primitive. Both sides carry watermarks and the join condition
    bounds click_ts to a closed interval around purchase_ts, so Spark
    can expire join state: clicks older than watermark+lookback and
    purchases past the watermark are dropped from the state store —
    the unbounded-state stream-join trap, avoided by construction.
    Append-mode output; the batch twin is
    queries/events.events_funnel_attribution (same pair semantics,
    aggregated)."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        F.expr(
            f"p_user = c_user AND click_ts <= purchase_ts "
            f"AND click_ts > purchase_ts - interval {lookback}"
        ),
    )


def stream_to_partitioned_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = ("event_type",),
    timeout_sec: int = 120,
) -> None:
    """Stream into a hive-partitioned parquet sink with EXACTLY-ONCE
    file semantics: the checkpoint's write-ahead log + the sink's
    _spark_metadata transaction log mean a restart (same checkpoint)
    re-emits nothing, and readers only see committed files. This is
    the landing-zone topology of a 100 TB ingest: partition columns
    route (low cardinality), downstream batch reads partition-prune,
    and a crashed run resumes idempotently. availableNow drains the
    backlog and stops — the batch-refresh pattern; drop the trigger
    for continuous ingest."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_by)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"landing stream to {path} did not drain within {timeout_sec}s")


def stream_overwrite_partitions(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = ("event_type",),
    timeout_sec: int = 120,
) -> None:
    """Reprocess-safe landing via foreachBatch + DYNAMIC partition
    overwrite: each micro-batch REPLACES exactly the partitions it
    contains, so replaying the same input — even with a FRESH
    checkpoint (source redelivery, a deliberate backfill) — converges
    to the same table instead of duplicating appends.

    Complement to stream_to_partitioned_parquet: that one's
    exactly-once comes from the file sink's _spark_metadata log, which
    only Spark readers honor and only same-checkpoint restarts enjoy;
    this one's comes from idempotence-by-overwrite, so it survives
    checkpoint loss and writes a PLAIN hive directory any engine
    (DuckDB, Trino, pyarrow) can consume — the shape shared object
    stores actually need.

    Contract: a batch must carry the FULL recomputed content of every
    partition it touches (one batch = one snapshot slice; see
    read_events_snapshot_stream, or per-partition source files). A
    partition spanning two batches would mean batch 2 silently destroys
    batch 1's output — so the writer TRACKS partitions across this
    run's batches and fails the query loudly on a clash instead. The
    distinct-collect behind that guard is bounded by the partition-key
    cardinality (low by design — it routes directories).
    """
    seen: set[tuple] = set()

    def land(batch_df: DataFrame, _batch_id: int) -> None:
        parts = {
            tuple(str(r[c]) for c in partition_by)
            for r in batch_df.select(*partition_by).distinct().collect()
        }
        clash = parts & seen
        if clash:
            raise ValueError(
                f"partition(s) {sorted(clash)} span multiple micro-batches; "
                "overwrite landing needs each partition's full content in one "
                "batch — use stream_to_partitioned_parquet (append + sink log) "
                "for interleaved arrivals"
            )
        seen.update(parts)
        (
            batch_df.write.mode("overwrite")
            # writer-scoped: concurrent writes elsewhere keep static mode
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .parquet(path)
        )

    q = (
        stream_df.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(f"overwrite landing to {path} did not drain within {timeout_sec}s")
