"""Streaming end-to-end: file-source stream → watermarked windows →
memory sink, cross-checked against the batch formulation."""

import shutil

import pytest
from pyspark.sql import functions as F

from fuse_query_spark.sources.tables import table
from fuse_query_spark.streaming.events import (
    read_events_stream,
    run_to_memory_sink,
    sessionized_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-write events as a 3-file parquet directory so the file source
    has multiple triggers to chew through."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    shutil.rmtree(out, ignore_errors=True)
    table(spark, sf_dir, "events").repartition(3).write.mode("overwrite").parquet(out)
    return out


def test_tumbling_stream_matches_batch(spark, sf_dir, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    run_to_memory_sink(tumbling_counts(stream), "tumbling_test")
    got = {
        (r["hour_start"], r["event_type"]): r["n"]
        for r in spark.table("tumbling_test").collect()
    }
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["hour_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want


def test_session_stream_total_events_conserved(spark, sf_dir, events_dir):
    # files arrive in arbitrary ts order, so conservation only holds
    # with a watermark wider than the cross-file disorder (the 2h
    # default correctly DROPS late data — that's the contract)
    stream = read_events_stream(spark, events_dir)
    run_to_memory_sink(sessionized_counts(stream, watermark="40 days"), "session_test")
    total = spark.table("session_test").agg(F.sum("n_events")).collect()[0][0]
    assert total == table(spark, sf_dir, "events").count()


def test_session_stream_drops_late_data_past_watermark(spark, events_dir):
    # tight watermark + out-of-order files → some events are late and
    # dropped; assert the drop actually happens (watermark is working)
    stream = read_events_stream(spark, events_dir)
    run_to_memory_sink(sessionized_counts(stream, watermark="2 hours"), "session_tight")
    total = spark.table("session_tight").agg(F.sum("n_events")).collect()[0][0]
    assert total < 1000


def test_hopping_stream_matches_batch(spark, sf_dir, events_dir):
    from fuse_query_spark.streaming.events import hopping_counts

    stream = read_events_stream(spark, events_dir)
    run_to_memory_sink(hopping_counts(stream), "hopping_test")
    got = {
        (r["win_start"], r["event_type"]): r["n"]
        for r in spark.table("hopping_test").collect()
    }
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )
    want = {(r["win_start"], r["event_type"]): r["n"] for r in batch.collect()}
    assert got == want
